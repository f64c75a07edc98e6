package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions.surrogateKey

/** SCD Type-2 snapshot operator family (SURVEY §2.6), reproducing
  * dbt-adapters/macros/materializations/snapshots/{strategies,helpers,
  * snapshot_merge}.sql over plain DataFrames.
  *
  * Metadata columns (helpers.sql:43-46): dbt_scd_id, dbt_updated_at,
  * dbt_valid_from, dbt_valid_to (+ dbt_is_deleted under hard_deletes =
  * new_record). Timestamps are injected (`snapshotTime`), never wall-clock.
  */
object Snapshot {

  /** Change-detection strategy. */
  sealed trait Strategy {
    /** row_changed predicate given open-version (snap) and incoming (src)
      * column accessors.
      */
    def rowChanged(snap: String => Column, src: String => Column): Column
    /** updated_at value for incoming rows. */
    def updatedAt(src: String => Column): Column
  }

  /** strategies.sql:56-88 — changed iff snapshot became valid before the
    * source's updated_at.
    */
  final case class TimestampStrategy(updatedAtCol: String) extends Strategy {
    def rowChanged(snap: String => Column, src: String => Column): Column =
      snap("dbt_valid_from") < src(updatedAtCol)
    def updatedAt(src: String => Column): Column = src(updatedAtCol)
  }

  /** strategies.sql:102-187 — changed iff any check column differs, with
    * explicit NULL-vs-value handling: `(a != b) or (a is null xor b is null)`.
    * `snapshotTime` stands in for snapshot_get_time().
    */
  final case class CheckStrategy(checkCols: Seq[String], snapshotTime: Timestamp) extends Strategy {
    def rowChanged(snap: String => Column, src: String => Column): Column =
      checkCols.map { c =>
        (snap(c) =!= src(c)) ||
          (snap(c).isNull && src(c).isNotNull) ||
          (snap(c).isNotNull && src(c).isNull)
      }.reduce(_ || _)
    def updatedAt(src: String => Column): Column = lit(snapshotTime)
  }

  sealed trait HardDeletes
  case object IgnoreDeletes extends HardDeletes     // vanished keys keep their open row
  case object Invalidate    extends HardDeletes     // vanished keys get valid_to closed
  case object NewRecord     extends HardDeletes     // + an is_deleted tombstone row

  /** First run (helpers.sql:216-231 build_snapshot_table): source + metadata,
    * everything open.
    */
  def firstRun(source: DataFrame, keys: Seq[String], strategy: Strategy,
      hardDeletes: HardDeletes = IgnoreDeletes): DataFrame = {
    val src: String => Column = source.apply
    val base = source
      .withColumn("dbt_scd_id", scdId(keys.map(source.apply), strategy.updatedAt(src)))
      .withColumn("dbt_updated_at", strategy.updatedAt(src))
      .withColumn("dbt_valid_from", strategy.updatedAt(src))
      .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
    if (hardDeletes == NewRecord) base.withColumn("dbt_is_deleted", lit("False")) else base
  }

  /** scd_id recipe (strategies.sql:40-50): md5 over key parts + updated_at —
    * same byte recipe as the surrogate key (A7).
    */
  def scdId(keyCols: Seq[Column], updatedAt: Column): Column =
    surrogateKey(keyCols :+ updatedAt: _*)

  /** Subsequent run: changeset build (helpers.sql:49-208) + merge apply
    * (snapshot_merge.sql:7-34), returning the new full history table.
    * `snapshotTime` is the injected snapshot_get_time() used for delete
    * closing / tombstones.
    */
  def apply(history: DataFrame, source: DataFrame, keys: Seq[String],
      strategy: Strategy, hardDeletes: HardDeletes, snapshotTime: Timestamp): DataFrame = {

    // SN8 schema drift (snapshot.sql:47-63): columns added to the source are
    // added (null-backfilled) to the history before merging; columns REMOVED
    // from the source are null-backfilled on the source side (the reference
    // keeps the column and inserts NULL — a narrowing source must not abort
    // every subsequent snapshot run)
    val drifted = source.schema.fields.filterNot(f => history.columns.contains(f.name))
      .foldLeft(history)((df, f) => df.withColumn(f.name, lit(null).cast(f.dataType)))
    val meta = Set("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to", "dbt_is_deleted")
    val source1 = history.schema.fields
      .filterNot(f => meta.contains(f.name) || source.columns.contains(f.name))
      .foldLeft(source)((df, f) => df.withColumn(f.name, lit(null).cast(f.dataType)))
    val hasTombstones = hardDeletes == NewRecord && drifted.columns.contains("dbt_is_deleted")
    val histAll = if (hardDeletes == NewRecord && !hasTombstones)
      drifted.withColumn("dbt_is_deleted", lit("False")) else drifted

    val open   = histAll.filter(col("dbt_valid_to").isNull)       // snapshotted_data
    val closed = histAll.filter(col("dbt_valid_to").isNotNull)

    val srcPref  = "s_"
    val src = source1.select(source1.columns.map(c => col(c).as(srcPref + c)).toSeq: _*)
      .withColumn("__src_present", lit(true))
    val joinCond = keys.map(k => col(k) === col(srcPref + k)).reduce(_ && _)
    val snapC: String => Column = c => col(c)
    val srcC:  String => Column = c => col(srcPref + c)
    val changed = strategy.rowChanged(snapC, srcC)
    val updAt   = strategy.updatedAt(srcC)

    // row presence is marked with literal flags, NOT key-NULL sentinels: an
    // open history row whose key column is genuinely NULL never joins (SQL
    // `=`), and a key-NULL sentinel would misread it as "no snapshot row"
    // and replace it with an all-NULL insert — the row's data would vanish.
    // (dbt's NULL-key semantics are preserved: a NULL-key source row
    // re-inserts each run, a NULL-key history row takes the vanished path.)
    val j = open.withColumn("__snap_present", lit(true)).join(src, joinCond, "full_outer")
    val srcAbsent  = coalesce(col("__src_present"), lit(false)) === false
    val snapAbsent = coalesce(col("__snap_present"), lit(false)) === false

    // SINGLE-PASS changeset (helpers.sql:107-205): each joined row maps to
    // its output rows via one explode — the branch-per-filter form would
    // re-execute the full_outer join once per changeset branch (4x the join
    // at scale; same rewrite as the tri-state violations single pass).
    // Every field casts to the HISTORY's type: struct branches must agree
    // exactly, and the stored table's types win (dbt target-schema rule).
    val outCols = histAll.columns
    val histType = histAll.schema.fields.map(f => f.name -> f.dataType).toMap
    def mk(fields: Map[String, Column]): Column =
      struct(outCols.map(c => fields(c).cast(histType(c)).as(c)).toSeq: _*)
    val openRow: Map[String, Column] = outCols.map(c => c -> col(c)).toMap

    // brand-new key or changed row -> new open version from the source side
    val insertRow = mk(outCols.map { c => c -> (c match {
      case "dbt_scd_id"                       => scdId(keys.map(srcC), updAt)
      case "dbt_updated_at" | "dbt_valid_from" => updAt
      case "dbt_valid_to"                     => lit(null).cast("timestamp")
      case "dbt_is_deleted"                   => lit("False")
      case _                                  => srcC(c)
    })}.toMap)
    val untouchedRow = mk(openRow)
    // close the old open version at updated_at (updates) / snapshot time (deletes)
    val closedAtUpdAt = mk(openRow + ("dbt_valid_to" -> updAt))
    val closedAtSnap  = mk(openRow + ("dbt_valid_to" -> lit(snapshotTime)))
    // tombstone insert rows (helpers.sql:170-205 deletion_records)
    val tombstoneRow = mk(openRow ++ Map(
      "dbt_valid_from" -> lit(snapshotTime),
      "dbt_updated_at" -> lit(snapshotTime),
      "dbt_valid_to"   -> lit(null).cast("timestamp"),
      "dbt_scd_id"     -> surrogateKey(col("dbt_scd_id"), lit(snapshotTime)),
      "dbt_is_deleted" -> lit("True")))

    val matched = !snapAbsent && !srcAbsent
    val changedTrue = coalesce(changed, lit(false))
    val vanishedOuts = hardDeletes match {
      case IgnoreDeletes => array(untouchedRow)
      case Invalidate    => array(closedAtSnap)
      case NewRecord     => array(closedAtSnap, tombstoneRow)
    }
    val outs = when(snapAbsent, array(insertRow))
      .when(matched && changedTrue, array(closedAtUpdAt, insertRow))
      .when(matched && !changedTrue, array(untouchedRow))
      .otherwise(vanishedOuts)

    closed.unionByName(j.select(explode(outs).as("__r")).select(col("__r.*")))
  }

  /** The five canonical SCD2 metadata columns. */
  val MetaColumns: Seq[String] =
    Seq("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to",
      "dbt_is_deleted")

  /** dbt 1.9 `snapshot_meta_column_names`: the STORED history carries the
    * configured names; the computation pipeline stays canonical. Mappings
    * must target canonical meta columns, be collision-free among
    * themselves, and not shadow a data column (dbt raises the same way —
    * a silent shadow would corrupt change detection).
    */
  def validateMetaNames(names: Map[String, String], dataCols: Seq[String]): Unit = {
    val bad = names.keySet -- MetaColumns.toSet
    require(bad.isEmpty, s"snapshot_meta_column_names: unknown meta column(s) ${bad.mkString(", ")}")
    require(names.values.toSeq.distinct.size == names.size,
      s"snapshot_meta_column_names: duplicate target names in $names")
    val shadow = names.values.toSet.intersect(dataCols.toSet)
    require(shadow.isEmpty,
      s"snapshot_meta_column_names: target name(s) ${shadow.mkString(", ")} shadow data columns")
  }

  /** Canonical -> configured rename on the way to storage. */
  def renameMeta(df: DataFrame, names: Map[String, String]): DataFrame =
    names.foldLeft(df) { case (acc, (from, to)) =>
      if (acc.columns.contains(from)) acc.withColumnRenamed(from, to) else acc
    }

  /** Configured -> canonical rename when reading stored history back into
    * the pipeline (the exact inverse of [[renameMeta]]).
    */
  def restoreMeta(df: DataFrame, names: Map[String, String]): DataFrame =
    names.foldLeft(df) { case (acc, (from, to)) =>
      if (acc.columns.contains(to)) acc.withColumnRenamed(to, from) else acc
    }
}
