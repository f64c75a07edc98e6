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

  /** Join-key skew diagnosis: the report you run BEFORE deciding whether a
    * 100 TB join needs [[saltedJoin]], AQE skew splitting, or nothing.
    * One row: total rows, distinct keys, the hottest key's row count, the
    * rows concentrated in the top ~1% of keys (ceil(n_keys/100) heaviest),
    * and a recommended salt factor = ceil(max_key_rows / avg_key_rows) —
    * 1 means uniform, big means the hot key is that many reducers wide.
    *
    * Shape: the only full-data shuffle is the (keys -> count) roll-up the
    * join itself would do anyway. The top-1% walk runs over the COUNT
    * HISTOGRAM (count-value -> how many keys have it) — cardinality is the
    * number of DISTINCT per-key counts, orders of magnitude below the key
    * count (a 1M-key table rarely has >10k distinct counts). That window
    * is single-partition by design and carries the raise-don't-funnel
    * guard (`maxDistinctCounts`): pathological inputs fail loud instead
    * of silently serializing. All arithmetic is exact integers.
    */
  def diagnose(df: DataFrame, keys: Seq[String],
      maxDistinctCounts: Long = 1000000L): DataFrame = {
    require(keys.nonEmpty, "diagnose needs at least one key column")
    require(maxDistinctCounts >= 1, s"maxDistinctCounts: $maxDistinctCounts")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt"))
    val hist = counts.groupBy(col("__cnt")).agg(count(lit(1)).as("__k"))
    val w = Window.orderBy(col("__cnt").desc)
    val guard = when(row_number().over(w) > maxDistinctCounts,
      raise_error(lit(s"Skew.diagnose exceeded $maxDistinctCounts distinct " +
        "key-count values — the histogram window is single-partition by " +
        "contract")).cast("long")).otherwise(lit(0L))
    val tw = Window.orderBy(lit(1)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("__keys_before", coalesce(sum(col("__k"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + guard)
      .withColumn("__n_keys", sum(col("__k")).over(tw))
      .withColumn("__n_rows", sum(col("__cnt") * col("__k")).over(tw))
      .withColumn("__max_cnt", max(col("__cnt")).over(tw))
      // top-K keys by rows, K = ceil(1% of keys): full histogram buckets
      // while they fit, a partial slice of the boundary bucket
      .withColumn("__topn", expr("(__n_keys + 99) div 100"))
      .withColumn("__kept", greatest(lit(0L),
        least(col("__k"), col("__topn") - col("__keys_before"))))
      .groupBy()
      .agg(max(col("__n_rows")).as("n_rows"),
        max(col("__n_keys")).as("n_keys"),
        max(col("__max_cnt")).as("max_key_rows"),
        sum(col("__kept") * col("__cnt")).as("top1pct_rows"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        col("top1pct_rows"),
        expr("(max_key_rows * n_keys + n_rows - 1) div n_rows")
          .as("recommended_salt"))
  }

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

  /** Hot/cold split join — selective skew routing from CERTIFIED hot
    * keys (the stored Misra-Gries registers' no-false-negative law:
    * every key above the support threshold is in the summary, so the
    * certified-hot list is complete; [[graft.functions.Sketches.mgBound]]
    * reads the certificate). The hot keys' dim rows broadcast (tiny by
    * construction — at most the MG register count) so the skewed mass
    * NEVER shuffles on its key, while the cold remainder takes the
    * ordinary shuffle join it is shaped for — AQE's skew-join strategy
    * made declarative, applicable where AQE can't see it coming (a
    * broadcast-impossible dim whose HOT SLICE is broadcastable). Inner
    * joins only: each fact row lands in exactly one branch (its key is
    * hot or it isn't; NULL keys match nothing in either branch), so the
    * union is exactly the plain inner join, which is the oracle. The
    * spec pins row identity and the hot branch's BroadcastHashJoin.
    */
  def hotColdJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotVals: Seq[Any]): DataFrame = {
    require(hotVals.nonEmpty, "hotColdJoin needs at least one hot key")
    require(hotVals.forall(_ != null), "NULL never matches an equi-join")
    val hot = fact.filter(col(key).isin(hotVals: _*))
      .join(broadcast(dim.filter(col(key).isin(hotVals: _*))), Seq(key))
    val cold = fact.filter(!col(key).isin(hotVals: _*))
      .join(dim.filter(!col(key).isin(hotVals: _*)), Seq(key))
    hot.unionByName(cold)
  }
}
