package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gaps-and-islands: collapse overlapping/touching intervals per key into
  * maximal merged spans. The warehouse classic behind "continuous enrollment
  * spells" (the reference's member_months/enrollment domain builds exactly
  * this shape from month-grain rows) and, pipeline-side, behind merging
  * near-duplicate time ranges (session spans, crawl-visit windows) before
  * range joins.
  *
  * Shape: one shuffle on the key, then two window passes over the same
  * sorted run (running max-end to flag island starts, running sum to number
  * islands) and a final narrow per-(key, island) aggregate — Catalyst plans
  * the two windows plus the groupBy into a single sort/exchange because all
  * three share the (key, start) ordering. Per-key data never needs to fit
  * in memory beyond the window buffer; no driver state anywhere.
  *
  * Semantics: intervals TOUCHING at a boundary (next.start == prev.end)
  * merge — [1,3) + [3,5) is continuous coverage, the enrollment-spell
  * convention. Pass strict = true to keep touching intervals separate.
  * Ordering ties on `start` are totalized by `tieBreak` so island numbering
  * is engine-deterministic even with duplicate starts.
  */
object Intervals {

  /** The complement of [[mergeIntervals]]: the GAPS between a key's merged
    * coverage islands — "periods with no enrollment", the other half of
    * every continuous-coverage analysis. One lead() window over the
    * (already tiny) island relation; a key with a single island emits
    * nothing. Output: keys, gap_start (= island end), gap_end (= next
    * island start), gap after island `island_id`.
    */
  def coverageGaps(df: DataFrame, keys: Seq[String],
      start: Column, end: Column, tieBreak: Column): DataFrame = {
    val islands = mergeIntervals(df, keys, start, end, tieBreak)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("island_id").asc)
    islands
      .withColumn("__next_start", lead(col("island_start"), 1).over(w))
      .filter(col("__next_start").isNotNull)
      .select(keys.map(col) :+ col("island_id") :+
        col("island_end").as("gap_start") :+
        col("__next_start").as("gap_end"): _*)
  }

  def mergeIntervals(df: DataFrame, keys: Seq[String],
      start: Column, end: Column, tieBreak: Column,
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "mergeIntervals needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(start.asc, end.asc, tieBreak.asc)
    val prevMaxEnd = max(end)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val gapped = if (strict) start >= prevMaxEnd else start > prevMaxEnd
    df.withColumn("__new", when(prevMaxEnd.isNull || gapped, 1L).otherwise(0L))
      .withColumn("island_id", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys.map(col) :+ col("island_id"): _*)
      .agg(min(start).as("island_start"), max(end).as("island_end"),
        count(lit(1)).as("n_rows"))
  }

  /** Peak concurrency per key: the maximum number of CLOSED-interval
    * [start, end] rows simultaneously open, and the earliest boundary at
    * which the peak is reached — the capacity/staffing question
    * ("max open orders / beds / sessions at once") that
    * [[mergeIntervals]]' islands deliberately erase. The standard
    * boundary-sweep: each interval emits (+1 at start, -1 at end+1), the
    * deltas roll up per (key, boundary) — so the window below runs over
    * DISTINCT boundaries, calendar-bounded, not raw intervals — and a
    * per-key cumulative sum is the live count; its max and argmin-day
    * come from one more window pass. NULL or inverted (end < start)
    * intervals are excluded.
    */
  def maxConcurrency(df: DataFrame, keys: Seq[String], start: Column,
      end: Column): DataFrame = {
    val kcols = keys.map(col)
    val deltas = df
      .filter(start.isNotNull && end.isNotNull &&
        end.cast("long") >= start.cast("long"))
      .select(kcols :+ explode(array(
        struct(start.cast("long").as("b"), lit(1L).as("d")),
        struct((end.cast("long") + 1L).as("b"), lit(-1L).as("d"))))
        .as("e"): _*)
      .groupBy(kcols :+ col("e.b").as("b"): _*)
      .agg(sum(col("e.d")).as("d"))
    val byB = Window.partitionBy(kcols: _*).orderBy(col("b").asc)
    val scored = deltas.withColumn("live",
      sum(col("d")).over(byB.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    scored
      .withColumn("__mx", max(col("live")).over(Window.partitionBy(kcols: _*)))
      .filter(col("live") === col("__mx"))
      .groupBy(kcols: _*)
      .agg(min(col("b")).as("peak_at"), max(col("live")).as("peak"))
      .select(kcols ++ Seq(col("peak"), col("peak_at")): _*)
  }

  /** Full concurrency time SERIES per key — the step function
    * [[maxConcurrency]] only reports the peak of: one row per day the
    * live count CHANGES, with the new level. The open-order backlog /
    * WIP-inventory / concurrent-session chart, exact under closed-
    * interval semantics (same +1/-1 boundary-sweep deltas: an interval
    * occupies [start, end], the -1 lands on end+1).
    *
    * Step emission (the [[graft.operators.EventAnalytics.cohortLtv]]
    * convention): a day with no boundary has no row — its level is the
    * previous row's. Shape: boundary deltas roll up per DISTINCT
    * boundary day, then one key-partitioned cumulative window over the
    * boundary-day domain — calendar-bounded, never raw rows.
    */
  def concurrencySeries(df: DataFrame, keys: Seq[String], start: Column,
      end: Column): DataFrame = {
    require(keys.nonEmpty, "concurrencySeries needs keys — a global series" +
      " would funnel the cumulative window through one partition")
    val kcols = keys.map(col)
    val deltas = df
      .filter(start.isNotNull && end.isNotNull &&
        end.cast("long") >= start.cast("long"))
      .select(kcols :+ explode(array(
        struct(start.cast("long").as("b"), lit(1L).as("d")),
        struct((end.cast("long") + 1L).as("b"), lit(-1L).as("d"))))
        .as("e"): _*)
      .groupBy(kcols :+ col("e.b").as("day"): _*)
      .agg(sum(col("e.d")).as("__d"))
    val byB = Window.partitionBy(kcols: _*).orderBy(col("day").asc)
    deltas.withColumn("live",
        sum(col("__d")).over(byB.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("__d") =!= 0L) // a net-zero day is not a step
      .select(kcols ++ Seq(col("day"), col("live")): _*)
  }

  /** Little's-law audit over HALF-OPEN `[start, end)` intervals in
    * micro-time: the occupancy integral `integral N(t) dt` computed two
    * independent ways — summing durations directly, and sweeping
    * `live * segment_length` over the boundary step function — MUST agree
    * exactly (`identity_gap = 0`); a nonzero gap means the sweep (the
    * machinery behind every concurrency chart) dropped or double-counted
    * a boundary. On top of the audit, the three Little's-law quantities:
    * `L = integral/span` (avg concurrency, micro), `W = total/n` (avg
    * time in system, us), and the arrival rate per hour (milli) — with
    * `L = lambda*W` holding by construction once the integral agrees.
    *
    * Half-open (not the closed day-granularity convention of
    * [[maxConcurrency]]): micro-timestamps are effectively continuous,
    * and zero-length intervals must occupy nothing. The sweep window is
    * single-partition over DISTINCT boundaries by design (a global
    * occupancy integral is a global prefix structure) — guarded by
    * `maxBoundaries` raise, the module contract.
    */
  def littlesLawAudit(df: DataFrame, start: Column, end: Column,
      maxBoundaries: Long = 5000000L): DataFrame = {
    require(maxBoundaries >= 2, s"maxBoundaries: $maxBoundaries")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val iv = df
      .filter(start.isNotNull && end.isNotNull &&
        end.cast("long") >= start.cast("long"))
      .select(start.cast("long").as("s"), end.cast("long").as("e"))
    val totals = iv.agg(count(lit(1)).as("n"),
      sum(col("e") - col("s")).as("total_dur_us"),
      min(col("s")).as("__t0"), max(col("e")).as("__t1"))
    val deltas = iv
      .select(explode(array(
        struct(col("s").as("b"), lit(1L).as("d")),
        struct(col("e").as("b"), lit(-1L).as("d")))).as("x"))
      .groupBy(col("x.b").as("b")).agg(sum(col("x.d")).as("d"))
    val w = Window.orderBy(col("b").asc)
    val guard = when(row_number().over(w) > maxBoundaries,
      raise_error(lit(s"littlesLawAudit exceeded $maxBoundaries distinct " +
        "boundaries — the occupancy sweep is single-partition; bucket " +
        "timestamps or audit per partition first")).cast("long"))
      .otherwise(lit(0L))
    val swept = deltas
      .withColumn("live", sum(col("d")).over(w) + guard)
      .withColumn("__next", lead(col("b"), 1).over(w))
      .filter(col("__next").isNotNull)
      .agg(coalesce(sum(dec(col("live")) * (col("__next") - col("b"))),
        dec(lit(0L))).cast("long").as("swept_dur_us"))
    val span = col("__t1") - col("__t0")
    totals.crossJoin(swept)
      .select(col("n"), col("total_dur_us"), col("swept_dur_us"),
        (col("swept_dur_us") - col("total_dur_us")).as("identity_gap"),
        span.as("span_us"),
        when(span > 0L, call_function("div",
          dec(col("swept_dur_us")) * 1000000L, dec(span)).cast("long"))
          .as("l_micro"),
        when(col("n") > 0L, call_function("div", col("total_dur_us"),
          col("n"))).as("w_avg_us"),
        when(span > 0L, call_function("div",
          dec(col("n")) * dec(lit(3600000000000L)), dec(span)).cast("long"))
          .as("lambda_per_hour_milli"))
  }
}
