package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY §2 is exposed as a named query over
  * the TESTDATA star schema, each with a DuckDB oracle (the t2 gate).
  */
object SparkEntry {

  private val sets: Seq[QuerySet] =
    Seq(CoreQueries, PipelineQueries, CoverageQueries, LifecycleQueries,
      AnalyticsQueries, ExtensionQueries, FeatureQueries, StatQueries,
      InferenceQueries, DecisionQueries, Round11Queries, Round12Queries,
      Round13Queries, Round14Queries)

  // a duplicated query name would silently shadow one implementation in the
  // toMap below — fail at class-init instead
  locally {
    val names = sets.flatMap(_.all.map(_.name))
    val dups = names.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full COL gap-closure pipeline (int_gap_col_status analog).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.gapStatus(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    sets.flatMap(_.oracles).toMap
}
