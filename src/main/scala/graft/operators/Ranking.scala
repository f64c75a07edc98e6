package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-free global ranking (builder brief; the OLAP "rank every value"
  * primitive re-shaped for scale).
  *
  * A naive `rank() OVER (ORDER BY v)` has no PARTITION BY, so Spark plans a
  * SINGLE-partition window — every row of a 100 TB table funnels through one
  * task. This operator instead ranks the ROLLED-UP distinct values: one
  * partial-agg shuffle to (group, value) -> cnt (the same shape as
  * [[graft.pipeline.Stats.exactQuantiles]]), then a cumulative window over
  * distinct values only. rank(v) = (#rows with smaller v) + 1 falls out of
  * the cumsum with no per-row sort at all; rows re-acquire their rank by a
  * join on the (small) value table if needed.
  *
  * With `groupCols` the window partitions on the group (fully parallel).
  * With NO groupCols the cum-sum window is single-partition over DISTINCT
  * values — fine for bounded-cardinality metrics (the quantile caveat in
  * Stats applies verbatim: bin or sketch unbounded doubles first).
  */
object Ranking {

  /** Per-distinct-value ranking table: (group..., value, n_rows, rnk,
    * dense_rnk) where `rnk` is SQL rank() (1 + rows strictly smaller) and
    * `dense_rnk` is dense_rank(), both ascending. NULL values are ignored
    * (SQL window frames rank them, but a NULL rank is meaningless for the
    * rollup consumers and Spark/other engines disagree on NULL order).
    */
  def valueRanks(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame = {
    val gcols = groupCols.map(col)
    val counts = df.filter(valueCol.isNotNull)
      .groupBy(gcols :+ valueCol.as("v"): _*)
      .agg(count(lit(1)).as("n_rows"))
    val byVal = Window.partitionBy(gcols: _*).orderBy(col("v").asc)
    counts
      .withColumn("rnk", sum(col("n_rows")).over(byVal) - col("n_rows") + 1L)
      .withColumn("dense_rnk", row_number().over(byVal).cast("long"))
  }
}
