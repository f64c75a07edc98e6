package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions.surrogateKey

/** Parameterized tri-state DQ rule generator — the reference's signature QA
  * pattern (macros/gap_tri_state_violations.sql:1-89): four rule families over
  * any tri-state model, violations emitted as data (not test failures).
  *
  *  A: flag not in (0,1,NULL)                 (:15-25)
  *  B: flag=0    but a required col is null   (:27-44)
  *  C: flag=1    but a required col is null   (:46-63)
  *  D: flag NULL but a forbidden col non-null (:65-82)
  *
  * Pure `DataFrame => DataFrame` composition — the reference's Jinja-macro
  * extension mechanism maps to compile-time Scala, zero UDF cost (SURVEY §2.9).
  */
final case class TriStateRules(
    flagCol: String,
    pkCols: Seq[String],
    qualifiedRequires: Seq[String] = Nil,
    closedRequires: Seq[String] = Nil,
    notQualifiedForbids: Seq[String] = Nil) {

  private def anyNull(cols: Seq[String]): Column =
    cols.map(col(_).isNull).reduce(_ || _)
  private def anyNotNull(cols: Seq[String]): Column =
    cols.map(col(_).isNotNull).reduce(_ || _)

  /** The reference macro emits UNION ALL of one filtered scan per rule family
    * — executed literally that re-runs the (possibly expensive) upstream model
    * once per family. Spark-first form: evaluate every family predicate in ONE
    * pass and `explode` the fired reasons. Same output multiset (a NULL
    * predicate fires nothing, like a filter), but a single scan of `base` no
    * matter how many families are configured — this is what makes DQ-as-data
    * affordable on a 100 TB model.
    */
  def violations(base: DataFrame): DataFrame = {
    val f = col(flagCol)
    val checks: Seq[(String, Column)] =
      Seq("A_FLAG_NOT_0_1_NULL" -> (f.isNotNull && !f.isin(0, 1))) ++
      (if (qualifiedRequires.nonEmpty)
        Seq("B_QUALIFIED_MISSING_REQUIRED" -> (f === 0 && anyNull(qualifiedRequires))) else Nil) ++
      (if (closedRequires.nonEmpty)
        Seq("C_CLOSED_MISSING_REQUIRED" -> (f === 1 && anyNull(closedRequires))) else Nil) ++
      (if (notQualifiedForbids.nonEmpty)
        Seq("D_NOT_QUALIFIED_HAS_FORBIDDEN" -> (f.isNull && anyNotNull(notQualifiedForbids))) else Nil)
    val fired = filter(
      array(checks.map { case (reason, cond) => when(cond, lit(reason)) }: _*),
      _.isNotNull)
    base.select(
      explode(fired).as("violation_reason") +:
      pkCols.map(col) :+
      col(flagCol): _*)
  }
}

/** The violations -> exceptions mart chain
  * (int_gap_col_violations.sql:16-28 + fct_gap_exceptions.sql:8-28).
  */
object GapExceptions {

  /** Wrap raw violations with audit metadata (int_gap_col_violations.sql:16-28).
    * `exceptionTs` is injected, never wall-clock (determinism, SURVEY §7.4.3).
    */
  def violationsModel(v: DataFrame, exceptionTs: Timestamp, ruleVersion: String,
      ruleId: String, measureId: String): DataFrame =
    v.select(
      lit(exceptionTs).as("exception_ts"),
      lit(ruleVersion).as("rule_version"),
      lit(ruleId).as("rule_id"),
      lit(measureId).as("measure_id"),
      col("violation_reason"),
      col("member_id"),
      col("measure_id").as("source_measure_id"),
      col("measurement_year"),
      col("gap_flag"))

  /** fct_gap_exceptions.sql:8-28: md5 surrogate key over the violation
    * identity; exact byte-parity recipe (SURVEY §2.4/A7).
    */
  def withExceptionKey(v: DataFrame): DataFrame =
    v.select(
      surrogateKey(col("member_id"), col("source_measure_id"),
        col("measurement_year"), col("gap_flag"), col("rule_id"),
        col("violation_reason")).as("exception_key") +: v.columns.map(col).toSeq: _*)

  /** Incremental dedup (fct_gap_exceptions.sql:32-33): `NOT IN (subquery)`
    * over a never-null md5 key == left_anti (NULL caveat documented in
    * SURVEY §1). At scale this is a shuffle-free broadcast-anti when the
    * existing-key side is small; otherwise a key-only shuffle.
    */
  def newExceptions(withKey: DataFrame, existing: DataFrame): DataFrame =
    withKey.join(existing.select("exception_key"), Seq("exception_key"), "left_anti")
}
