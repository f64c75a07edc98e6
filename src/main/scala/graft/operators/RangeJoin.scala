package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — the second operator family Spark only
  * plans as a broadcast-nested-loop or cross join (builder brief): each left
  * point row joins every right interval containing it within the key. The
  * healthcare shape: a claim joined to every enrollment/coverage span active
  * on the service date.
  *
  * Composition: intervals replicate to each fixed-width date bucket they
  * cover (explode over a sequence — O(interval span / width) copies), points
  * map to their single bucket, and the join becomes an EQUI-join on
  * (keys, bucket) + an exact containment filter. A (point, interval) pair
  * can only meet in the point's bucket, so no dedup pass is needed. Pick
  * `bucketWidthDays` near the typical interval length: the shuffle is keyed
  * on (key, bucket) — uniform, broadcast-free, no N x M cross-join — and
  * replication stays O(1) per interval.
  */
object RangeJoin {

  private def bucketOf(d: Column, widthDays: Int): Column =
    floor(datediff(d, lit("1970-01-01").cast("date")) / widthDays).cast("long")

  /** Inclusive containment: startCol <= pointCol <= endCol. Output: all left
    * columns + the right side's non-key columns; a point inside k
    * overlapping intervals yields k rows (inner-join semantics).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      bucketWidthDays: Int = 365): DataFrame = {
    require(bucketWidthDays > 0, s"bucketWidthDays: $bucketWidthDays")
    val payloadCols = intervals.columns.filterNot(keys.contains)
    val overlap = points.columns.toSet.intersect(payloadCols.toSet)
    require(overlap.isEmpty, s"ambiguous columns on both sides: ${overlap.mkString(",")}")
    val b = "__range_bucket"
    val iv = intervals
      // NULL bounds can't contain anything; drop them before the explode
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn(b, explode(sequence(
        bucketOf(col(startCol), bucketWidthDays),
        bucketOf(col(endCol), bucketWidthDays))))
    val pts = points.filter(col(pointCol).isNotNull)
      .withColumn(b, bucketOf(col(pointCol), bucketWidthDays))
    pts.join(iv, keys :+ b)
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop(b)
  }
}
