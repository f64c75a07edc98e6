package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (builder brief: salting for skew; AQE's
  * skew-join handles sort-merge cases at runtime, but broadcast-impossible
  * hot-key joins still need explicit salting at 100 TB).
  *
  * Pattern: fact side gets a DETERMINISTIC salt in [0, k) derived from a
  * uniquifier column (deterministic so retries/speculative tasks agree);
  * the dimension side is exploded k ways; the join key becomes
  * (keys..., salt) — each hot key now spreads over k reducers.
  */
object Skew {

  /** Deterministic salt from a uniquifier column (e.g. the fact's PK). */
  def salt(uniquifier: Column, k: Int): Column = pmod(hash(uniquifier), lit(k))

  /** Fact-preserving join types only: the dim side is replicated k times, so
    * a dim-preserving join (right/full outer) would emit k copies of every
    * unmatched dim row.
    */
  private val factPreserving = Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String], k: Int,
      factUniquifier: String, joinType: String = "inner"): DataFrame = {
    require(factPreserving.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin requires a fact-preserving join type, got '$joinType'")
    // k = 0 would salt every fact row with pmod-by-zero NULL and explode the
    // dim to salts [0,-1]: an inner join silently returns ZERO rows
    require(k >= 1, s"saltedJoin salt count must be >= 1, got $k")
    val salted = fact.withColumn("__salt", salt(col(factUniquifier), k))
    val exploded = dim.withColumn("__salt", explode(sequence(lit(0), lit(k - 1))))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }
}
