package graft.operators

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Functions._

/** One closure scenario of a care-gap measure
  * (int_gap_col_status.sql:19-22,112-139): a code set, a lookback window, and
  * a durability rank (lower = more durable = wins ties over recency).
  * `lookbackYears = None` means "within the measurement year"
  * (the FIT/FOBT case, int_gap_col_status.sql:134-136).
  */
final case class Scenario(
    reason: String,
    codes: Seq[String],
    lookbackYears: Option[Int],
    durabilityRank: Int)

/** Declarative measure spec generalizing the reference's hardcoded COL
  * constants (int_gap_col_status.sql:11-27): eligibility age band + scenarios
  * + named exclusion sets.
  */
final case class MeasureSpec(
    measureId: String,
    minAge: Int,
    maxAge: Int,
    scenarios: Seq[Scenario],
    ruleVersion: String)

/** The gap-closure engine — the reference's one real query
  * (models/intermediate/gaps/col/int_gap_col_status.sql:1-222) as a composable
  * Spark pipeline.
  *
  * Scale notes (100 TB design):
  *  - The scenario/code table is tiny and explicitly `broadcast` — the
  *    events-side join never shuffles (reference J1/J3 are 1-row/1-code CTEs).
  *  - Event filtering (code match + date window) happens BEFORE the
  *    member-level window, so the ranked window sees only qualified evidence.
  *  - The only shuffles are the row_number partition on member_id and the
  *    final left joins, all on the same key — Catalyst/AQE reuses the
  *    exchange where possible.
  *  - Exclusion sets join as left_semi-derived flags on member_id; pass
  *    pre-aggregated (distinct member_id) frames.
  */
object GapEngine {

  /** Continuous-enrollment eligibility (the reference's declared
    * int_member_enrollment domain, models/intermediate/members/): a member
    * is continuously enrolled iff ONE merged coverage island spans the
    * whole requirement window — coverage intervals that touch or overlap
    * count as unbroken (the enrollment-spell convention of
    * [[Intervals.mergeIntervals]], which does the heavy lifting: one
    * shuffle on member_id, two shared-sort windows, no driver state).
    *
    * `spans`: (member_id, cov_start, cov_end). Returns the DISTINCT
    * member_ids whose coverage contains [reqStart, reqEnd]; feed the
    * complement to [[status]] as an exclusion set, so non-enrolled
    * members surface tri-state NULL like any other denominator exit.
    */
  def continuouslyEnrolled(spans: DataFrame, reqStart: Column,
      reqEnd: Column): DataFrame =
    Intervals.mergeIntervals(spans, Seq("member_id"),
        col("cov_start"), col("cov_end"), col("cov_start"))
      .filter(col("island_start") <= reqStart && col("island_end") >= reqEnd)
      .select(col("member_id")).distinct()

  /** [[continuouslyEnrolled]] with the ALLOWABLE-GAP refinement real HEDIS
    * specs use ("continuously enrolled during the measurement year with no
    * more than one gap of up to 45 days"): coverage is clipped to the
    * requirement window, merged into islands, and a member qualifies iff
    * the clipped coverage is anchored at BOTH window ends and the interior
    * gaps number at most `maxGaps`, each spanning at most `maxGapDays`
    * days.
    *
    * Same single member-keyed shuffle as the strict form: the clip is a
    * narrow map, the island windows and the island-gap lead() share the
    * member_id partitioning, and the verdict aggregate is per-member.
    */
  def continuouslyEnrolledTolerant(spans: DataFrame, reqStart: Column,
      reqEnd: Column, maxGapDays: Int, maxGaps: Int): DataFrame = {
    require(maxGapDays >= 0, s"maxGapDays: $maxGapDays")
    require(maxGaps >= 0, s"maxGaps: $maxGaps")
    val clipped = spans.select(col("member_id"),
        greatest(col("cov_start"), reqStart).as("cov_start"),
        least(col("cov_end"), reqEnd).as("cov_end"))
      .filter(col("cov_start") <= col("cov_end"))
    val islands = Intervals.mergeIntervals(clipped, Seq("member_id"),
      col("cov_start"), col("cov_end"), col("cov_start"))
    val w = Window.partitionBy(col("member_id")).orderBy(col("island_id").asc)
    islands
      .withColumn("__next_start", lead(col("island_start"), 1).over(w))
      .groupBy(col("member_id"))
      .agg(min(col("island_start")).as("__fs"),
        max(col("island_end")).as("__le"),
        sum(when(col("__next_start").isNotNull, 1L).otherwise(0L)).as("__n_gaps"),
        max(when(col("__next_start").isNotNull,
          datediff(col("__next_start"), col("island_end")))).as("__max_gap"))
      .filter(col("__fs") <= reqStart && col("__le") >= reqEnd &&
        col("__n_gaps") <= maxGaps &&
        coalesce(col("__max_gap"), lit(0)) <= maxGapDays)
      .select(col("member_id"))
  }

  /** members: (member_id, birth_date); events: (evidence_id, member_id,
    * event_date, code); exclusions: name -> DataFrame[member_id].
    * Output schema mirrors int_gap_col_status.sql:185-221 with the measure's
    * exclusion flags as 0/1 ints.
    */
  def status(
      spark: SparkSession,
      members: DataFrame,
      events: DataFrame,
      spec: MeasureSpec,
      exclusions: Seq[(String, DataFrame)],
      asOf: LocalDate): DataFrame = {

    val periodEnd   = to_date(lit(LocalDate.of(asOf.getYear, 12, 31).toString))
    val periodStart = to_date(lit(LocalDate.of(asOf.getYear, 1, 1).toString))

    // -- eligibility spine (int_gap_col_status.sql:33-54) ------------------
    val elig = members.select(
      col("member_id"),
      col("birth_date"),
      when(ageAt(col("birth_date"), periodEnd).between(spec.minAge, spec.maxAge), lit(1))
        .otherwise(lit(0)).as("is_age_eligible"))

    // -- exclusion flags (int_gap_col_status.sql:56-67; hardcoded 0 there) --
    val withExcl = exclusions.foldLeft(elig) { case (acc, (name, ex)) =>
      val flagged = ex.select(col("member_id"), lit(1).as(name)).distinct()
      acc.join(flagged, Seq("member_id"), "left")
        .withColumn(name, coalesce(col(name), lit(0)))
    }
    val exclNames = exclusions.map(_._1)
    val isExcluded = exclNames
      .map(n => col(n) === 1)
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    // -- scenario table, broadcast (J1/J3) ---------------------------------
    import spark.implicits._
    val scen = spec.scenarios
      .flatMap(s => s.codes.map(c =>
        (c, s.reason, s.durabilityRank, s.lookbackYears.map(y => -12 * y).getOrElse(0), s.lookbackYears.isEmpty)))
      .toDF("code", "closure_reason", "reason_rank", "neg_months", "measurement_year_window")

    // -- qualified evidence (int_gap_col_status.sql:70-145) ----------------
    val qualified = events
      .join(broadcast(scen), Seq("code"))
      .withColumn("window_start",
        when(col("measurement_year_window"), periodStart)
          .otherwise(add_months(periodEnd, col("neg_months"))))
      .filter(col("event_date") >= col("window_start") && col("event_date") <= periodEnd)

    // -- best evidence per member (W1, int_gap_col_status.sql:147-183) -----
    // Durability beats recency; deterministic final tie-break on evidence_id
    // (documented divergence: the reference leaves rank/date ties arbitrary).
    val w = Window.partitionBy("member_id")
      .orderBy(col("reason_rank").asc, col("event_date").desc, col("evidence_id").asc)
    val best = qualified
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("member_id"),
        col("event_date").as("closure_date"),
        col("closure_reason"),
        col("evidence_id"))

    // -- tri-state assembly (J2 + P4, int_gap_col_status.sql:185-221) ------
    val qualifiedMember = col("is_age_eligible") === 1 && !isExcluded
    withExcl
      .join(best, Seq("member_id"), "left")
      .select(
        Seq(
          col("member_id"),
          lit(spec.measureId).as("measure_id"),
          year(periodEnd).as("measurement_year"),
          col("is_age_eligible")) ++
        exclNames.map(col) ++
        Seq(
          triStateFlag(qualifiedMember, col("evidence_id").isNotNull).as("gap_flag"),
          when(qualifiedMember, col("closure_date")).as("closure_date"),
          when(qualifiedMember, col("closure_reason")).as("closure_reason"),
          when(qualifiedMember, col("evidence_id")).as("evidence_id"),
          periodStart.as("period_start"),
          periodEnd.as("period_end"),
          lit(spec.ruleVersion).as("rule_version")): _*)
  }
}
