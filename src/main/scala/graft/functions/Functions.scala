package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level utility surface of the reference engine, re-expressed as pure
  * Spark `Column` combinators (codegen-friendly, no UDFs).
  *
  * Reference provenance (all paths under /root/reference/):
  *  - ageAt: models/intermediate/gaps/col/int_gap_col_status.sql:39-43
  *    (Snowflake `datediff('year')` counts calendar-year boundaries; the model
  *    subtracts 1 when the anniversary hasn't passed — we reproduce the
  *    composed semantics, i.e. true age in completed years).
  *  - surrogateKey: models/marts/gaps/fct_gap_exceptions.sql:9-16 and
  *    dbt_internal_packages/dbt-adapters/.../snapshots/strategies.sql:45-50:
  *    `md5(coalesce(cast(x as varchar),'') || '|' || ...)`.
  *  - dateSpine / generateSeries: dbt_internal_packages/dbt-adapters/macros/
  *    utils/date_spine.sql:26-74, generate_series.sql:18-52 — re-done with
  *    `sequence()` (no powers-of-two cross-join needed on Spark).
  *  - listAgg: dbt-adapters/macros/utils/listagg.sql:5-29.
  *  - safeCast: dbt-snowflake/macros/utils/safe_cast.sql:2-14 (try_cast).
  *  - boolOr / anyValue: dbt-adapters/macros/utils/bool_or.sql, any_value.sql.
  */
object Functions {

  /** Age in completed years at `asOf` with Snowflake year-boundary + anniversary
    * adjustment semantics (int_gap_col_status.sql:39-43). Do NOT replace with
    * months_between/12 — month-length drift diverges from the oracle.
    */
  def ageAt(birth: Column, asOf: Column): Column = {
    val diff = year(asOf) - year(birth)
    when(add_months(birth, diff * lit(12)) > asOf, diff - lit(1)).otherwise(diff)
  }

  /** Snowflake `dateadd('year', -n, d)`: calendar-year shift with month-end
    * clamping — `add_months` has identical clamping semantics.
    */
  def yearsBack(d: Column, n: Int): Column = add_months(d, -12 * n)

  /** Byte-compatible md5 surrogate key (fct_gap_exceptions.sql:9-16):
    * `md5(coalesce(cast(c1 as string),'') || '|' || ...)`. Keep inputs to
    * string/integral/date types — float formatting is engine-specific.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  /** Tri-state flag builder (int_gap_col_status.sql:196-203): NULL when not
    * qualified, 1 when closed-evidence present, else 0. NULL is a meaningful
    * third state — callers must not coalesce it away.
    */
  def triStateFlag(qualified: Column, closed: Column): Column =
    when(!qualified, lit(null).cast("int"))
      .when(closed, lit(1))
      .otherwise(lit(0))

  /** dbt_utils.star (dbt-utils/macros/sql/star.sql; the reference pins
    * dbt_utils in packages.yml:1-4 without calling it — completing the
    * surface): all columns except the named ones, with an optional relation
    * alias prefix applied dbt-style. Pure projection — column pruning
    * reaches the scan exactly as if the list were written out.
    */
  def starExcept(df: DataFrame, except: Seq[String]): DataFrame = {
    val drop = except.map(_.toLowerCase).toSet
    val keep = df.columns.filterNot(c => drop.contains(c.toLowerCase))
    require(keep.nonEmpty, s"starExcept removed every column of ${df.columns.mkString(",")}")
    df.select(keep.map(col): _*)
  }

  /** dbt_utils.get_column_values (dbt-utils/macros/sql/get_column_values
    * .sql): the distinct values of a column as a driver-side list — dbt
    * runs this at COMPILE time to splice values into generated SQL, so a
    * bounded collect is the faithful semantics, not an anti-pattern; the
    * `maxValues` guard raises rather than letting a high-cardinality
    * column flood the driver (dbt's default likewise caps at 500).
    */
  def getColumnValues(df: DataFrame, c: String, maxValues: Int = 500): Seq[String] = {
    val vals = df.select(col(c).cast("string")).na.drop()
      .distinct().limit(maxValues + 1)
      .collect().map(_.getString(0)).sorted.toSeq
    require(vals.size <= maxValues,
      s"get_column_values('$c') exceeded $maxValues distinct values — " +
        "splice-into-SQL semantics need a bounded list")
    vals
  }

  /** dbt_utils.safe_add (dbt-utils/macros/sql/safe_add.sql): sum of
    * nullable columns with NULL treated as 0 — `coalesce(a,0) +
    * coalesce(b,0) + ...`, the spreadsheet-style addition dbt models use
    * for sparse metric columns.
    */
  def safeAdd(cols: Column*): Column = {
    require(cols.nonEmpty, "safeAdd needs at least one column")
    cols.map(c => coalesce(c, lit(0))).reduce(_ + _)
  }

  /** Ordered string-agg with optional head limit (listagg.sql:5-29), sorted
    * by the aggregated value itself.
    */
  def listAgg(c: Column, delim: String, limit: Option[Int] = None): Column = {
    val sorted = array_sort(collect_list(c))
    val sliced = limit.fold(sorted)(n => slice(sorted, 1, n))
    array_join(sliced, delim)
  }

  /** listagg with an ARBITRARY order-by clause (listagg.sql:5-29
    * order_by_clause) + optional head limit: values ride a (key, value)
    * struct through collect_list, the struct sort orders by key with the
    * value as deterministic tie-break, `desc` reverses both. One aggregate,
    * no window — collect_list is a map-side partial aggregate, so the
    * shuffle carries per-group partial arrays, never raw rows.
    */
  def listAggBy(c: Column, orderBy: Column, delim: String,
      limit: Option[Int] = None, desc: Boolean = false): Column = {
    val sorted0 = array_sort(collect_list(struct(orderBy.as("k"), c.as("v"))))
    val sorted = if (desc) reverse(sorted0) else sorted0
    val sliced = limit.fold(sorted)(n => slice(sorted, 1, n))
    array_join(transform(sliced, p => p("v").cast("string")), delim)
  }

  /** bool_or aggregate (utils/bool_or.sql). */
  def boolOr(c: Column): Column = max(c.cast("boolean"))

  /** Contiguous date spine at day or month grain (date_spine.sql:26-74).
    * Implemented as a single `sequence` + `explode` — fully parallel, no
    * powers-of-two cross join, no window over constant order.
    */
  def dateSpine(spark: SparkSession, start: String, end: String, grain: String): DataFrame = {
    val step = grain match {
      case "day"   => expr("interval 1 day")
      case "month" => expr("interval 1 month")
      case "year"  => expr("interval 1 year")
      case other   => throw new IllegalArgumentException(s"grain: $other")
    }
    spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(end)), step)).as("date_" + grain))
  }

  /** 1..n series (generate_series.sql:18-52) — `spark.range`, distributed. */
  def generateSeries(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).select(col("id").as("generated_number"))

  /** get_intervals_between (C4, date_spine.sql:1-21): the reference runs an
    * EAGER scalar `datediff` query to size the spine's codegen; pure Scala
    * date math replaces the round-trip. Snowflake datediff counts BOUNDARY
    * CROSSINGS (month: month-slot delta; year: year delta), not elapsed
    * periods.
    */
  def intervalsBetween(start: String, end: String, grain: String): Long = {
    val s = java.time.LocalDate.parse(start)
    val e = java.time.LocalDate.parse(end)
    grain match {
      case "day"   => java.time.temporal.ChronoUnit.DAYS.between(s, e)
      case "month" => (e.getYear - s.getYear) * 12L + (e.getMonthValue - s.getMonthValue)
      case "year"  => (e.getYear - s.getYear).toLong
      case other   => throw new IllegalArgumentException(s"grain: $other")
    }
  }

  /** try_cast (safe_cast.sql): NULL on conversion failure. */
  def safeCast(c: Column, to: String): Column = c.try_cast(to)

  /** try_cast for STRING -> integral targets with a pre-validation fast path:
    * under ANSI mode try_cast's failure path raises and swallows a per-row
    * exception, which dominates the scan when most rows are malformed (8x on
    * q20). A cheap compiled regex rejects malformed rows exception-free;
    * try_cast still guards range overflow on the survivors, so the result is
    * identical to a plain try_cast for string inputs.
    */
  def safeCastIntegral(s: Column, to: String): Column =
    when(s.rlike("^\\s*[+-]?[0-9]+\\s*$"), s.try_cast(to))

  /** Audit columns (macros/audit_columns.sql is an empty stub in the
    * reference; semantics per dbt convention). Deterministic: timestamps are
    * injected, never wall-clock.
    */
  def withAuditColumns(df: DataFrame, runTs: java.sql.Timestamp, runId: String): DataFrame =
    df.withColumn("audit_loaded_at", lit(runTs))
      .withColumn("audit_run_id", lit(runId))

  /** Typed-NULL trick from snapshots/helpers.sql:272-276:
    * `coalesce(nullif(x,x), fallback)` — a NULL with x's type.
    */
  def typedNull(like: Column): Column = nullif(like, like)
}
