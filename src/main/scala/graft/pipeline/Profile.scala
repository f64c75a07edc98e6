package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling (builder brief): the "what is in this 100 TB
  * table" first pass of any ingestion pipeline — row/null/distinct counts
  * and value bounds per column, in long format so downstream DQ rules can
  * join on (column, metric).
  *
  * Scale shape: ONE aggregation pass computes every per-column metric as a
  * separate aggregate expression over the same scan (no per-column jobs, no
  * self-joins). `count(distinct c1), count(distinct c2), ...` in a single
  * agg triggers Spark's Expand — each row is replicated once per DISTINCT
  * aggregate before the shuffle. That is the standard engine plan for
  * multi-distinct and is linear in #cols profiled; for very wide tables
  * profile in column batches, or swap exact distinct counts for
  * [[graft.functions.Sketches.hllRegisters]] (mergeable, one pass, no
  * Expand) when +-2% suffices.
  *
  * min/max are emitted as strings (numerics cast losslessly; a mixed-type
  * long layout needs one common type), null-safe: an all-NULL column
  * profiles as NULL bounds, not an error.
  */
object Profile {

  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the input: ${missing.mkString(",")}")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to long via one explode — no extra scans
    wide.select(explode(array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"__n_$c").as("n_rows"),
      col(s"__nulls_$c").as("n_null"),
      col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select(col("p.*"))
  }
}
