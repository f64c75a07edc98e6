package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{GapEngine, MeasureSpec, Scenario}

/** Golden-path smoke on the reference's own demo seeds (FIXTURES.md §1-2):
  * the COL pipeline must reproduce int_gap_col_status on the 9 demo rows.
  */
class GapEngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // exact copies of /root/reference/seeds (data, not code)
  private def members = Seq(
    (1L, "1970-01-01"), (2L, "1950-06-15"), (3L, "2000-05-20"),
    (4L, "1940-03-03"), (5L, "1965-11-11"))
    .toDF("member_id", "bd")
    .select($"member_id", to_date($"bd").as("birth_date"))

  private def events = Seq(
    (1001L, 1L, "2025-07-01", "82274"),
    (1002L, 2L, "2025-02-10", "12345"),
    (1003L, 5L, "2025-03-15", "82274"))
    .toDF("evidence_id", "member_id", "sd", "code")
    .select($"evidence_id", $"member_id", to_date($"sd").as("event_date"), upper($"code").as("code"))

  private val spec = MeasureSpec("COL", 45, 75,
    Seq(Scenario("FIT_FOBT", Seq("82274"), None, 5)), "COL_V1")

  test("demo-seed golden rows (FIXTURES.md §2)") {
    val out = GapEngine.status(spark, members, events, spec, Nil, LocalDate.of(2025, 12, 31))
      .orderBy("member_id").collect()
    assert(out.length === 5)
    def flag(i: Int): Option[Int] =
      if (out(i).isNullAt(out(i).fieldIndex("gap_flag"))) None
      else Some(out(i).getInt(out(i).fieldIndex("gap_flag")))

    // member 1: age 55, FIT in measurement year -> closed
    assert(flag(0) === Some(1))
    assert(out(0).getAs[String]("closure_reason") === "FIT_FOBT")
    assert(out(0).getAs[java.sql.Date]("closure_date").toString === "2025-07-01")
    assert(out(0).getAs[Long]("evidence_id") === 1001L)
    assert(out(0).getAs[String]("rule_version") === "COL_V1")
    assert(out(0).getAs[java.sql.Date]("period_start").toString === "2025-01-01")
    assert(out(0).getAs[java.sql.Date]("period_end").toString === "2025-12-31")
    // member 2: age 75 (eligible), code 12345 not in set -> open
    assert(flag(1) === Some(0))
    assert(out(1).isNullAt(out(1).fieldIndex("closure_reason")))
    // member 3: age 25 -> not qualified, closure cols forbidden-null
    assert(flag(2) === None)
    assert(out(2).isNullAt(out(2).fieldIndex("evidence_id")))
    // member 4: age 85 -> not qualified
    assert(flag(3) === None)
    // member 5: age 60, FIT in year -> closed
    assert(flag(4) === Some(1))
    assert(out(4).getAs[Long]("evidence_id") === 1003L)
  }

  test("durability beats recency (int_gap_col_status.sql:159-171)") {
    val twoScen = MeasureSpec("COL", 45, 75, Seq(
      Scenario("COLONOSCOPY", Seq("45378"), Some(10), 1),
      Scenario("FIT_FOBT", Seq("82274"), None, 5)), "COL_V1")
    val ev = Seq(
      (2001L, 1L, "2025-11-01", "82274"),  // recent FIT
      (2002L, 1L, "2018-01-01", "45378"))  // old colonoscopy, more durable
      .toDF("evidence_id", "member_id", "sd", "code")
      .select($"evidence_id", $"member_id", to_date($"sd").as("event_date"), $"code".as("code"))
    val out = GapEngine.status(spark, members.filter($"member_id" === 1), ev, twoScen,
      Nil, LocalDate.of(2025, 12, 31)).collect()(0)
    assert(out.getAs[String]("closure_reason") === "COLONOSCOPY")
    assert(out.getAs[Long]("evidence_id") === 2002L)
  }

  test("lookback boundary is inclusive (FIXTURES.md §4)") {
    val scen = MeasureSpec("COL", 45, 75,
      Seq(Scenario("COLONOSCOPY", Seq("45378"), Some(10), 1)), "COL_V1")
    // exactly 10 years before period end (2015-12-31) qualifies; a day earlier doesn't
    def run(day: String): Option[Int] = {
      val ev = Seq((3001L, 1L, day, "45378")).toDF("evidence_id", "member_id", "sd", "code")
        .select($"evidence_id", $"member_id", to_date($"sd").as("event_date"), $"code".as("code"))
      val r = GapEngine.status(spark, members.filter($"member_id" === 1), ev, scen,
        Nil, LocalDate.of(2025, 12, 31)).collect()(0)
      if (r.isNullAt(r.fieldIndex("gap_flag"))) None else Some(r.getInt(r.fieldIndex("gap_flag")))
    }
    assert(run("2015-12-31") === Some(1))
    assert(run("2015-12-30") === Some(0))
  }

  test("exclusion set nulls the flag and closure columns") {
    val hospice = Seq(Tuple1(1L)).toDF("member_id")
    val out = GapEngine.status(spark, members, events, spec,
      Seq("in_hospice" -> hospice), LocalDate.of(2025, 12, 31))
      .filter($"member_id" === 1).collect()(0)
    assert(out.isNullAt(out.fieldIndex("gap_flag")))
    assert(out.isNullAt(out.fieldIndex("closure_reason")))
    assert(out.getAs[Int]("in_hospice") === 1)
  }

  test("continuouslyEnrolled: touching spans merge, gaps and short islands exit") {
    def d(s: String) = java.sql.Date.valueOf(s)
    // requirement window: all of 2024
    val spans = Seq(
      // A: two TOUCHING spans covering the window -> enrolled
      (1L, "2023-12-01", "2024-06-01"), (1L, "2024-06-01", "2025-01-15"),
      // B: one-day hole at 2024-06-01 -> two islands, neither covers -> out
      (2L, "2023-12-01", "2024-06-01"), (2L, "2024-06-02", "2025-01-15"),
      // C: single span covering EXACTLY [reqStart, reqEnd] -> enrolled
      (3L, "2024-01-01", "2024-12-31"),
      // D: overlapping spans, but coverage starts after Jan 1 -> out
      (4L, "2024-01-02", "2024-08-01"), (4L, "2024-07-01", "2025-02-01"),
      // E: covers the window inside a longer overlapping chain -> enrolled
      (5L, "2023-01-01", "2024-05-01"), (5L, "2024-04-15", "2026-01-01"))
      .toDF("member_id", "cs", "ce")
      .select($"member_id", to_date($"cs").as("cov_start"), to_date($"ce").as("cov_end"))
    val got = GapEngine.continuouslyEnrolled(spans,
        lit(d("2024-01-01")), lit(d("2024-12-31")))
      .as[Long].collect().toSet
    assert(got === Set(1L, 3L, 5L))
  }

  test("continuouslyEnrolledTolerant: gap count/length bounds, anchoring, clipping") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val spans = Seq(
      // A: continuous, zero gaps -> in
      (1L, "2023-12-01", "2025-01-15"),
      // B: ONE interior 31-day gap (Jun 1 -> Jul 2) -> in under (45, 1)
      (2L, "2023-12-15", "2024-06-01"), (2L, "2024-07-02", "2025-01-10"),
      // C: one 60-day gap -> out (too long)
      (3L, "2023-12-15", "2024-05-01"), (3L, "2024-06-30", "2025-01-10"),
      // D: two 20-day gaps -> out (too many)
      (4L, "2024-01-01", "2024-04-01"), (4L, "2024-04-21", "2024-08-01"),
      (4L, "2024-08-21", "2024-12-31"),
      // E: not anchored at Jan 1 (starts Jan 10) -> out even with no gaps
      (5L, "2024-01-10", "2025-02-01"),
      // F: anchored only via clipping (covers 2023-2026) -> in
      (6L, "2023-01-01", "2026-01-01"))
      .toDF("member_id", "cs", "ce")
      .select($"member_id", to_date($"cs").as("cov_start"), to_date($"ce").as("cov_end"))
    val got = GapEngine.continuouslyEnrolledTolerant(spans,
        lit(d("2024-01-01")), lit(d("2024-12-31")), maxGapDays = 45, maxGaps = 1)
      .as[Long].collect().toSet
    assert(got === Set(1L, 2L, 6L))
    // zero tolerance degenerates to the strict rule
    val strict = GapEngine.continuouslyEnrolledTolerant(spans,
        lit(d("2024-01-01")), lit(d("2024-12-31")), maxGapDays = 0, maxGaps = 0)
      .as[Long].collect().toSet
    assert(strict === GapEngine.continuouslyEnrolled(spans,
        lit(d("2024-01-01")), lit(d("2024-12-31")))
      .as[Long].collect().toSet)
  }
}
