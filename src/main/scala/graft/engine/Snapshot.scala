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
    val src = source1.select(source1.columns.map(c => col(c).as(srcPref + c)): _*)
    val joinCond = keys.map(k => col(k) === col(srcPref + k)).reduce(_ && _)
    val snapC: String => Column = c => col(c)
    val srcC:  String => Column = c => col(srcPref + c)
    val changed = strategy.rowChanged(snapC, srcC)
    val updAt   = strategy.updatedAt(srcC)

    val j = open.join(src, joinCond, "full_outer")
    val srcKeyNull  = col(srcPref + keys.head).isNull
    val snapKeyNull = col(keys.head).isNull

    // insertions (helpers.sql:107-124): brand-new key, or changed row -> new open version
    val insertions0 = j.filter(snapKeyNull || (!srcKeyNull && changed))
      .select(source1.columns.map(c => col(srcPref + c).as(c)): _*)
    val insertions = {
      val s: String => Column = insertions0.apply
      val base = insertions0
        .withColumn("dbt_scd_id", scdId(keys.map(insertions0.apply), strategy.updatedAt(s)))
        .withColumn("dbt_updated_at", strategy.updatedAt(s))
        .withColumn("dbt_valid_from", strategy.updatedAt(s))
        .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
      if (hardDeletes == NewRecord) base.withColumn("dbt_is_deleted", lit("False")) else base
    }

    // updates (helpers.sql:126-142): close the old open version at updated_at
    val updates = j.filter(!snapKeyNull && !srcKeyNull && changed)
      .select(open.columns.map { c =>
        if (c == "dbt_valid_to") updAt.as(c) else col(c)
      }: _*)

    // deletes (helpers.sql:146-205): key vanished from source
    val vanished = j.filter(!snapKeyNull && srcKeyNull)
    val deletes = hardDeletes match {
      case IgnoreDeletes => None
      case Invalidate | NewRecord =>
        Some(vanished.select(open.columns.map { c =>
          if (c == "dbt_valid_to") lit(snapshotTime).cast("timestamp").as(c) else col(c)
        }: _*))
    }
    // tombstone insert rows (helpers.sql:170-205 deletion_records)
    val tombstones = if (hardDeletes == NewRecord)
      Some(vanished.select(open.columns.map {
        case "dbt_valid_from"  => lit(snapshotTime).cast("timestamp").as("dbt_valid_from")
        case "dbt_updated_at"  => lit(snapshotTime).cast("timestamp").as("dbt_updated_at")
        case "dbt_valid_to"    => lit(null).cast("timestamp").as("dbt_valid_to")
        case "dbt_scd_id"      => surrogateKey(col("dbt_scd_id"), lit(snapshotTime)).as("dbt_scd_id")
        case "dbt_is_deleted"  => lit("True").as("dbt_is_deleted")
        case c                 => col(c)
      }: _*))
    else None

    // untouched open rows: matched-but-unchanged or vanished under IgnoreDeletes
    val untouchedCond = hardDeletes match {
      case IgnoreDeletes => !snapKeyNull && (srcKeyNull || !coalesce(changed, lit(false)))
      case _             => !snapKeyNull && !srcKeyNull && !coalesce(changed, lit(false))
    }
    val untouched = j.filter(untouchedCond).select(open.columns.map(col): _*)

    (Seq(closed, untouched, updates, insertions) ++ deletes ++ tombstones)
      .reduce(_ unionByName _)
  }
}
