package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — an operator Spark lacks natively (builder
  * brief): for each left row, attach the single LATEST right row with
  * right.ts <= left.ts within the key. The healthcare shape: a claim joined
  * to the enrollment/plan record in force on the service date.
  *
  * Composition (preference order (a) — existing ops express it exactly):
  * both sides union into one stream tagged by side, and one window pass
  * carries the last-seen right payload forward onto every left row. ONE
  * shuffle on the key, sort by (ts, side) within — no per-pair range
  * cross-join, no interval explosion; the window is a linear scan per key.
  * At skewed-key scale the same salting/bucketing levers as any keyed
  * window apply.
  *
  * Ties: a right row AT the left row's timestamp matches (<= semantics,
  * right sorts before left at equal ts). Multiple right rows on the same
  * (key, ts) resolve by `rightTieBreak` (last one wins) — pass a unique
  * column for determinism.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightTieBreak: Option[String] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c))
    require(payloadCols.nonEmpty, "right side carries no payload columns")
    // every payload column lands in the output, INCLUDING rightTs — any
    // left column sharing a name would emit duplicated-name columns
    val overlap = left.columns.toSet.intersect(payloadCols.toSet)
    require(overlap.isEmpty, s"ambiguous columns on both sides: ${overlap.mkString(",")}")

    val ts = "__asof_ts"
    val side = "__asof_side"
    val payload = "__asof_payload"
    val tie = "__asof_tie"

    // the tie-break must actually order: a silent cast-to-NULL (e.g. a
    // string id) would make the duplicate winner partition-order-dependent
    rightTieBreak.foreach { c =>
      require(right.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"rightTieBreak '$c' must be numeric (got ${right.schema(c).dataType.simpleString})")
    }
    // SQL-equality key semantics: a NULL key (any component) matches nothing
    // — window partitioning would group NULL keys together and match them;
    // a NULL right timestamp satisfies no `rts <= lts` predicate — it must
    // not sort first (nulls-first asc) and get carried onto every left row
    // the tie-break keeps its NATIVE numeric type: a cast to long would
    // truncate fractional values (1.2 and 1.9 both -> 1L) and silently
    // reintroduce the partition-order-dependent winner the require above
    // guards against. Left rows carry a typed NULL — tie only orders right
    // rows among themselves (side sorts left after right first).
    val tieType = rightTieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val r = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(
      (keys.map(col) :+ col(rightTs).as(ts) :+ lit(0).as(side) :+
        rightTieBreak.fold(lit(0L).cast(tieType))(c => col(c)).as(tie) :+
        struct(payloadCols.map(col).toSeq: _*).as(payload)): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as(ts) :+ lit(1).as(side) :+
        lit(null).cast(tieType).as(tie) :+
        lit(null).cast(r.schema(payload).dataType).as(payload) :+
        struct(left.columns.map(col).toSeq: _*).as("__asof_left")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.withColumn("__asof_left",
        lit(null).cast(l.schema("__asof_left").dataType))
      .unionByName(l)
      .withColumn("__asof_match", last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    val leftCols = left.columns.map(c => col(s"__asof_left.$c").as(c))
    val rightOut = payloadCols.map(c => col(s"__asof_match.$c").as(c))
    carried.select((leftCols ++ rightOut).toSeq: _*)
  }
}
