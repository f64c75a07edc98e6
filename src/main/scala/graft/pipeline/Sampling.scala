package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data pipelines (builder brief):
  * reproducible across runs, engines and partitionings — the sample is a
  * pure function of (id, salt), never of Spark's RNG or row order, so a
  * 100 TB re-run selects byte-identical rows and an oracle can re-derive
  * the selection.
  */
object Sampling {

  /** Uniform hash bucket in [0, 1e6): first 8 md5 hex digits of
    * "id|salt" mod 1e6 — engine-portable exact integer arithmetic.
    * NULL-PROPAGATING (concat, not concat_ws): a NULL id yields a NULL
    * bucket, so every sample filter DROPS NULL-id rows on any engine —
    * concat_ws would silently hash just the salt and admit them under one
    * engine but not a SQL `||` oracle. Quota ordering (capPerGroup)
    * requires non-null ids for the same reason.
    */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit("|" + salt))), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Keep ~fraction of rows, chosen by id hash. Stateless, no shuffle, no
    * RNG — scales as a pure filter pushed into the scan stage.
    */
  def hashSample(df: DataFrame, idCol: Column, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction: $fraction")
    df.filter(hashBucket(idCol, salt) < math.round(fraction * 1000000L))
  }

  /** Mixture sampling ("40% web, 90% books, 5% logs"): per-group keep
    * fractions over one deterministic hash — the data-mixing knob of a
    * training pipeline, reproducible like [[hashSample]]. Groups absent
    * from `weights` default to `defaultFraction` (0 = drop). Still a pure
    * filter: no shuffle, pushes to the scan.
    */
  def mixtureSample(df: DataFrame, groupCol: String, weights: Map[String, Double],
      idCol: Column, defaultFraction: Double = 0.0, salt: String = ""): DataFrame = {
    (weights.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction: $f"))
    val cut = weights.foldLeft(lit(math.round(defaultFraction * 1000000L))) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(math.round(f * 1000000L))).otherwise(acc)
    }
    df.filter(hashBucket(idCol, salt) < cut)
  }

  /** Per-group quota ("cap each domain/source at n docs"): keep the n rows
    * with the smallest (hash, id) per group — a uniform within-group choice
    * that is stable under reruns and data reordering.
    *
    * Scale shape: the rank-filter compiles to WindowGroupLimit, so each map
    * task pre-prunes to its local top-n per group BEFORE the shuffle — the
    * exchange carries O(groups x n), not the full table.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], n: Int, idCol: Column,
      salt: String = ""): DataFrame = {
    require(n > 0, s"n: $n")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashBucket(idCol, salt).asc, idCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
