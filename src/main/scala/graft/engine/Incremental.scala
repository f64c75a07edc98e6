package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The five incremental strategies of the reference
  * (dbt-adapters/.../incremental/strategies.sql:1-103,
  * dbt-snowflake/.../incremental/merge.sql:2-101) as pure DataFrame
  * combinators: each returns the NEW full state of the target, which callers
  * persist via `Warehouse.writeSwap` (or `append` for the append strategy).
  *
  * Scale notes: merge/deleteInsert shuffle both sides on the key — at 100 TB
  * the target should be bucketed/clustered on the key (Warehouse.writeSwap
  * clusterBy) so AQE gets co-located partitions; when the batch is small
  * relative to the target, the key-set anti-join side is broadcast by
  * Catalyst automatically.
  */
object Incremental {

  /** Strategy names, dispatch per dbt-snowflake incremental.sql:189-191
    * (default = merge).
    */
  sealed trait Strategy
  case object Append          extends Strategy // strategies.sql:93-103
  case object Merge           extends Strategy // merge.sql:9-54
  case object DeleteInsert    extends Strategy // merge.sql:57-92
  case object InsertOverwrite extends Strategy // dbt-snowflake insert_overwrite.sql:1-52
  /** merge.sql:73-101 — replace the [start, end) event-time slice; bounds are
    * ISO dates or timestamps ("2024-01-02" / "2024-01-02T13:00:00"). These are
    * DEFAULT bounds — a long-lived Registry advances the window per run via
    * `Registry.run(microbatchWindows = ...)` (the dbt runner derives bounds
    * per batch). Bounds are validated at materialization (fail fast; an
    * unparseable bound must never silently become NULL and wipe the target).
    *
    * `grain` is dbt's batch_size (hour/day/month/year): the Registry stores
    * the target PARTITIONED by the event-time period at this grain, so a
    * run replaces only its window's partition dirs — per-batch I/O is
    * O(batch), never O(target). Windows must be grain-aligned (dbt batches
    * are whole periods); the Registry rejects misaligned bounds.
    */
  final case class Microbatch(eventTimeCol: String, start: String, end: String,
      grain: String = "day") extends Strategy

  /** dbt `incremental_predicates` on the merge strategy (merge.sql:17-33
    * injects them into the MERGE's ON clause): the predicates bound the
    * TARGET-side match scan — at warehouse scale they turn a full-target
    * match into a partition-pruned one ("only look at the last 7 days for
    * matches"). Target rows OUTSIDE the predicate pass through untouched
    * and are invisible to matching, so a batch key whose only target row
    * sits out of scope INSERTS a second copy — dbt documents exactly this
    * trade (the user asserts predicates respect the unique key's
    * recency). NULL predicate rows are out of scope (SQL ON semantics).
    */
  final case class MergePredicated(
      predicates: Seq[org.apache.spark.sql.Column]) extends Strategy {
    require(predicates.nonEmpty,
      "MergePredicated without predicates is plain Merge — use that")
  }

  /** The schema contract [[mergeAggregates]] enforces, exposed so creation
    * paths (a stream's FIRST batch, a CTAS) can fail before committing
    * malformed durable state that only the second batch would reject.
    *
    * For `sum` columns the type must be a SUM-STABLE fixed point (long,
    * double, or decimal(38,s)): Spark widens sum result types (int -> long,
    * float -> double, decimal(p,s) -> decimal(min(38,p+10),s)), so any
    * other type would pass the first merge and then fail the NEXT run's
    * type check against its own widened output — on a stream that batch
    * replays forever. Failing the creation run with a cast instruction is
    * the loud version of that wedge.
    */
  def validateAggSchema(df: DataFrame, keys: Seq[String],
      combiners: Seq[(String, String)], side: String = "input"): Unit = {
    require(keys.nonEmpty, "mergeAggregates needs group keys")
    require(combiners.nonEmpty, "no aggregate columns to combine")
    val bad = combiners.collect { case (c, how) if !Seq("sum", "min", "max").contains(how) => s"$c -> $how" }
    require(bad.isEmpty, s"unsupported combiners (sum/min/max): ${bad.mkString(", ")}")
    val expected = (keys ++ combiners.map(_._1)).toSet
    require(df.columns.toSet == expected,
      s"$side columns ${df.columns.mkString(",")} != keys + aggregate columns ${expected.mkString(",")}")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val unstable = combiners.collect {
      case (c, "sum") if !(types(c) match {
        case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.DoubleType => true
        case d: org.apache.spark.sql.types.DecimalType => d.precision == 38
        case _ => false
      }) => s"$c: ${types(c)}"
    }
    require(unstable.isEmpty,
      s"$side sum columns must be sum-stable types (long, double, or decimal(38,s)) " +
        s"or each run's sum() would widen the state schema: ${unstable.mkString("; ")} — " +
        "cast the partials (e.g. .cast(\"long\"))")
  }

  /** Incremental AGGREGATE maintenance: combine a stored per-key aggregate
    * state table with the NEW batch's partials — the materialization that
    * keeps a rollup current without ever re-reading history (a row-level
    * merge can only REPLACE a key's row; an aggregate needs its
    * combine function). `combiners` maps each state column to how two
    * partials merge: `sum` (counts/sums), `min`, `max`. Columns under
    * `sum`/`count` semantics must be stored pre-aggregated (the caller
    * rolls the raw batch up by the same keys first).
    *
    * Scale shape: union + one partial-agg shuffle keyed on the GROUP —
    * per-run cost is O(batch partials + state), never O(raw history).
    * Associativity is what makes this correct at any batch granularity:
    * avg-style non-mergeable metrics must be carried as (sum, count)
    * pairs and finalized at read time.
    */
  def mergeAggregates(target: DataFrame, batchPartials: DataFrame,
      keys: Seq[String], combiners: Seq[(String, String)]): DataFrame = {
    validateAggSchema(target, keys, combiners, "target")
    validateAggSchema(batchPartials, keys, combiners, "batch")
    // types must match exactly, not just names: unionByName would silently
    // COERCE drift (DATE vs STRING widens to STRING and max() goes
    // lexicographic; int vs long widens the persisted state schema between
    // writes, breaking typed readers) — the reconcileSchema hazard
    val tTypes = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val bTypes = batchPartials.schema.fields.map(f => f.name -> f.dataType).toMap
    val drift = (keys ++ combiners.map(_._1))
      .filter(c => tTypes(c) != bTypes(c))
      .map(c => s"$c: target ${tTypes(c)} vs batch ${bTypes(c)}")
    require(drift.isEmpty, s"state/batch type drift: ${drift.mkString("; ")}")
    val aggs = combiners.map { case (c, how) =>
      (how match {
        case "sum" => sum(col(c))
        case "min" => min(col(c))
        case "max" => max(col(c))
      }).as(c)
    }
    target.unionByName(batchPartials)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** MERGE (I2): match on `keys` -> source row wins (all columns, minus
    * `excludeCols`, or only `updateCols` when given — merge.sql:12-14);
    * unmatched target rows kept; unmatched source rows inserted.
    * No keys -> insert-only append semantics (merge.sql:17-33 FALSE predicate).
    *
    * Implemented as target-anti-join + union rather than full-outer so the
    * untouched-column path is a straight passthrough (narrower shuffle,
    * whole-stage codegen keeps the plan tight).
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      updateCols: Option[Seq[String]] = None,
      excludeCols: Seq[String] = Nil,
      nullSafeKeys: Boolean = false): DataFrame = {
    // dbt treats merge_update_columns and merge_exclude_columns as mutually
    // exclusive (merge.sql:12-14 picks one) — accepting both would silently
    // apply whichever this implementation happened to consult first
    require(updateCols.isEmpty || excludeCols.isEmpty,
      "updateCols and excludeCols are mutually exclusive (dbt merge contract)")
    if (keys.isEmpty) return target.unionByName(source)
    if (nullSafeKeys) {
      // J9 (dbt-adapters/macros/utils/equals.sql:9-17): `(a = b) or (a is
      // null and b is null)` == Spark's <=>. NULL keys then match each other
      // instead of always inserting.
      val src = source.select(source.columns.map(c => col(c).as(s"__src_$c")).toSeq: _*)
      val cond = keys.map(k => col(k) <=> col(s"__src_$k")).reduce(_ && _)
      val updated = target.join(src, cond, "inner")
        .select(target.columns.map { c =>
          if (keys.contains(c) || excludeCols.contains(c) ||
              updateCols.exists(u => !u.contains(c))) target(c)
          else col(s"__src_$c").as(c)
        }.toSeq: _*)
      val untouched = target.join(source.select(keys.map(col): _*).distinct(),
        keys.map(k => target(k) <=> source(k)).reduce(_ && _), "left_anti")
      val inserted = source.select(target.columns.map(col).toSeq: _*)
        .join(target.select(keys.map(col): _*).distinct(),
          keys.map(k => source(k) <=> target(k)).reduce(_ && _), "left_anti")
      return untouched.unionByName(assertDeterministicMatch(updated, keys))
        .unionByName(inserted)
    }
    val updated = (updateCols, excludeCols) match {
      case (Some(cols), _) =>
        // only listed columns take the source value; others keep target's
        val src = source.select((keys ++ cols).distinct.map(c => col(c).as(s"__src_$c")): _*)
        val joined = target.join(src,
          keys.map(k => col(k) === col(s"__src_$k")).reduce(_ && _), "inner")
        joined.select(target.columns.map { c =>
          if (cols.contains(c)) col(s"__src_$c").as(c) else target(c)
        }.toSeq: _*)
      case (None, excl) =>
        // all source columns win (minus exclusions, which keep target values)
        if (excl.isEmpty)
          source.select(target.columns.map(col).toSeq: _*)
            .join(target.select(keys.map(col): _*), keys, "left_semi")
        else {
          val src = source.select(source.columns.map(c => col(c).as(s"__src_$c")).toSeq: _*)
          target.join(src, keys.map(k => col(k) === col(s"__src_$k")).reduce(_ && _), "inner")
            .select(target.columns.map { c =>
              if (excl.contains(c) || keys.contains(c)) target(c) else col(s"__src_$c").as(c)
            }.toSeq: _*)
        }
    }
    val untouched = target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val inserted  = source.select(target.columns.map(col).toSeq: _*)
      .join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
    untouched.unionByName(assertDeterministicMatch(updated, keys)).unionByName(inserted)
  }

  /** [[MergePredicated]]'s logical form: split the target on the predicate
    * conjunction, merge the batch against the IN-SCOPE slice only, pass
    * the out-of-scope slice through untouched. With the target partitioned
    * on the predicate column the out-of-scope branch is a partition-pruned
    * passthrough — the point of dbt's incremental_predicates at 100 TB:
    * match I/O bounded by the scope, not the target's history.
    */
  def mergePredicated(target: DataFrame, source: DataFrame, keys: Seq[String],
      predicates: Seq[org.apache.spark.sql.Column]): DataFrame = {
    if (predicates.isEmpty) return merge(target, source, keys)
    val pred = coalesce(predicates.reduce(_ && _), lit(false))
    target.filter(!pred).unionByName(merge(target.filter(pred), source, keys))
  }

  /** Snowflake raises ERROR_ON_NONDETERMINISTIC_MERGE when one target row
    * matches multiple source rows; silently emitting both would duplicate
    * the unique key and compound on every later run. Checked INSIDE the
    * plan (an eager probe would re-scan the target): a per-key count over
    * the matched subset only — batch-sized, rides the join's key
    * partitioning — with `assert_true` raising at execution. Unmatched
    * duplicate source rows still insert as separate rows, as in the
    * reference's MERGE INSERT clause. Callers with legitimately duplicated
    * batches must dedupe first (e.g. latestPerKey).
    */
  private def assertDeterministicMatch(updated: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    updated.withColumn("__graft_nmatch", count(lit(1)).over(w))
      // assert_true is NULL when the predicate holds — the filter keeps
      // every row and cannot be pruned away (a projected-then-dropped
      // assert column would be column-pruned before it ever ran)
      .filter(assert_true(col("__graft_nmatch") <= 1,
        lit(s"nondeterministic merge: a target row matches multiple source " +
          s"rows on (${keys.mkString(", ")}); dedupe the batch first")).isNull)
      .drop("__graft_nmatch")
  }

  /** append (I1, strategies.sql:93-103): insert the full source batch with no
    * key matching — the physical path is `Warehouse.append` (new part-files
    * only, zero target rewrite); this combinator is the logical equivalent.
    */
  def append(target: DataFrame, source: DataFrame): DataFrame =
    target.unionByName(source.select(target.columns.map(col).toSeq: _*))

  /** delete+insert (I3): drop ALL target rows whose key appears in source
    * (plus optional extra predicates), then insert the full source batch.
    */
  def deleteInsert(target: DataFrame, source: DataFrame, keys: Seq[String],
      incrementalPredicates: Seq[Column] = Nil): DataFrame = {
    val doomedKeys = source.select(keys.map(col): _*).distinct()
    // null-safe split: DELETE WHERE pred only removes rows where pred is
    // TRUE — a NULL predicate (e.g. NULL event date) must keep the row, not
    // drop it from both branches
    val deletePred = coalesce(
      incrementalPredicates.reduceOption(_ && _).getOrElse(lit(true)), lit(false))
    val keptByPred = target.filter(!deletePred) // rows outside the predicate scope survive
    val inScope    = target.filter(deletePred)
    keptByPred
      .unionByName(inScope.join(doomedKeys, keys, "left_anti"))
      .unionByName(source.select(target.columns.map(col).toSeq: _*))
  }

  /** insert_overwrite (I4): Snowflake semantics — full truncate + insert,
    * explicitly NOT partition-targeted (insert_overwrite.sql docstring).
    */
  def insertOverwrite(source: DataFrame, overwriteColumns: Option[Seq[String]] = None): DataFrame =
    overwriteColumns.fold(source)(cols => source.select(cols.map(col): _*))

  /** microbatch (I5): replace the [start, end) event-time slice. At scale the
    * target is partitioned by event time so only the slice rewrites.
    *
    * NULL event times: the reference's `DELETE WHERE et >= start AND et < end`
    * does NOT match NULL rows — they survive in the target. The keep-filter
    * is therefore null-safe (`coalesce(in-window, false)`), not the naive
    * `c < start || c >= end` (which evaluates NULL and silently drops them).
    */
  def microbatch(target: DataFrame, batch: DataFrame, eventTimeCol: String,
      start: Column, end: Column): DataFrame = {
    val c = col(eventTimeCol)
    val inWindow = coalesce(c >= start && c < end, lit(false))
    target.filter(!inWindow)
      .unionByName(batch.filter(inWindow).select(target.columns.map(col).toSeq: _*))
  }

  /** on_schema_change (I7, on_schema_change.sql:2-143). Returns the
    * (possibly reshaped) target aligned to handle `source`'s schema.
    *
    * Change detection matches check_for_schema_changes (on_schema_change.sql:
    * 20-62): added columns, removed columns, AND data-type drift on shared
    * names all count as a change. Mode semantics match sync_column_schemas
    * (:65-103): `append_new_columns` only ADDS columns (type drift is left in
    * place, as in the reference); `sync_all_columns` adds + removes + ALTERs
    * drifted columns to the source type; `fail` raises, naming all three
    * diffs (a widened int->long source must never silently keep the old
    * target type — the next merge would corrupt or throw).
    */
  sealed trait OnSchemaChange
  case object IgnoreChange     extends OnSchemaChange
  case object FailChange       extends OnSchemaChange
  case object AppendNewColumns extends OnSchemaChange
  case object SyncAllColumns   extends OnSchemaChange

  def reconcileSchema(target: DataFrame, source: DataFrame, mode: OnSchemaChange): DataFrame = {
    val tTypes = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val sTypes = source.schema.fields.map(f => f.name -> f.dataType).toMap
    val added   = source.schema.fields.filter(f => !tTypes.contains(f.name))
    val removed = target.schema.fields.filter(f => !sTypes.contains(f.name))
    val retyped = source.schema.fields.filter(f =>
      tTypes.get(f.name).exists(_ != f.dataType))
    if (added.isEmpty && removed.isEmpty && retyped.isEmpty) return target
    mode match {
      case IgnoreChange => target
      case FailChange =>
        throw new IllegalStateException(
          "schema changed: " +
            s"source columns not in target [${added.map(_.name).mkString(",")}]; " +
            s"target columns not in source [${removed.map(_.name).mkString(",")}]; " +
            s"new column types [${retyped.map(f =>
              s"${f.name}: ${tTypes(f.name).simpleString} -> ${f.dataType.simpleString}").mkString(",")}]")
      case AppendNewColumns =>
        added.foldLeft(target)((df, f) => df.withColumn(f.name, lit(null).cast(f.dataType)))
      case SyncAllColumns =>
        val widened = added.foldLeft(target)((df, f) =>
          df.withColumn(f.name, lit(null).cast(f.dataType)))
        val retypedDf = retyped.foldLeft(widened)((df, f) =>
          df.withColumn(f.name, col(f.name).cast(f.dataType)))
        retypedDf.select(source.columns.map(col).toSeq: _*)
    }
  }
}
