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

  /** Interval-overlap join (interval x interval, inclusive bounds): left
    * rows pair with right rows of the same keys whose [start, end] spans
    * intersect. Both sides replicate to their covered buckets and meet in
    * an EQUI-join on (keys, bucket); since an overlapping pair shares every
    * bucket its overlap region covers, it is emitted exactly ONCE at the
    * FIRST shared bucket — `greatest` of the two interval-start buckets,
    * the same first-agreement dedup the LSH band join uses — so no distinct
    * pass ever runs over the pair stream. Shuffle keys stay near-uniform
    * (keys x time bucket); replication is O(span / bucketWidthDays) copies
    * per row, so pick the width near the typical span length.
    *
    * Self-joins: pass two renamed projections and filter the reflexive /
    * symmetric half by id afterward (the op emits plain inner-join pairs).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String, rightStart: String, rightEnd: String,
      bucketWidthDays: Int = 365): DataFrame = {
    require(bucketWidthDays > 0, s"bucketWidthDays: $bucketWidthDays")
    val overlapCols = left.columns.toSet
      .intersect(right.columns.toSet).diff(keys.toSet)
    require(overlapCols.isEmpty,
      s"ambiguous non-key columns on both sides: ${overlapCols.mkString(",")}")
    val (b, bl0, br0) = ("__ol_b", "__ol_bl0", "__ol_br0")
    def valid(s: String, e: String) =
      col(s).isNotNull && col(e).isNotNull && col(s) <= col(e)
    val l = left.filter(valid(leftStart, leftEnd))
      .withColumn(bl0, bucketOf(col(leftStart), bucketWidthDays))
      .withColumn(b, explode(sequence(col(bl0), bucketOf(col(leftEnd), bucketWidthDays))))
    val r = right.filter(valid(rightStart, rightEnd))
      .withColumn(br0, bucketOf(col(rightStart), bucketWidthDays))
      .withColumn(b, explode(sequence(col(br0), bucketOf(col(rightEnd), bucketWidthDays))))
    l.join(r, keys :+ b)
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd) &&
        col(b) === greatest(col(bl0), col(br0)))
      .drop(b, bl0, br0)
  }
}
