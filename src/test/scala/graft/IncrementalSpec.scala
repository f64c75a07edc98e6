package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Incremental
import graft.engine.Incremental._

/** Strategy semantics per dbt-adapters incremental/strategies.sql +
  * dbt-snowflake incremental/merge.sql (SURVEY §2.5).
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tgt = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v")
  private def src = Seq((2L, "B", 200), (4L, "D", 400)).toDF("k", "s", "v")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Int)] =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

  test("merge: matched rows take source values, unmatched kept, new inserted") {
    val out = asMap(merge(tgt, src, Seq("k")))
    assert(out === Map(1L -> ("a", 10), 2L -> ("B", 200), 3L -> ("c", 30), 4L -> ("D", 400)))
  }

  test("merge without keys degrades to insert-only (merge.sql:17-33)") {
    assert(merge(tgt, src, Nil).count() === 5)
  }

  test("merge honors update-column list (merge_update_columns, merge.sql:12-14)") {
    val out = asMap(merge(tgt, src, Seq("k"), updateCols = Some(Seq("v"))))
    // s keeps target value on match; v updates
    assert(out(2L) === ("b", 200))
    assert(out(4L) === ("D", 400))
  }

  test("merge honors exclude-column list (merge_exclude_columns)") {
    val out = asMap(merge(tgt, src, Seq("k"), excludeCols = Seq("v")))
    assert(out(2L) === ("B", 20)) // v excluded -> target's value survives
  }

  test("deleteInsert with scope predicate keeps out-of-scope rows") {
    val out = asMap(deleteInsert(tgt, src, Seq("k"),
      incrementalPredicates = Seq(col("v") >= 20)))
    // k=1 out of scope (v=10) survives untouched even though not in src
    assert(out(1L) === ("a", 10))
    assert(out(2L) === ("B", 200))
    assert(out(3L) === ("c", 30))
    assert(out(4L) === ("D", 400))
  }

  test("mergePredicated: out-of-scope target invisible to matching (incremental_predicates)") {
    // scope: v >= 15. k=1 (v=10) is OUT of scope.
    val batch = Seq((1L, "A2", 100), (2L, "B2", 200)).toDF("k", "s", "v")
    val out = mergePredicated(tgt, batch, Seq("k"), Seq(col("v") >= 15))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out === Set(
      (1L, "a", 10),    // out of scope: passes through untouched...
      (1L, "A2", 100),  // ...so the batch key INSERTS a second copy (dbt trade)
      (2L, "B2", 200),  // in scope: updated
      (3L, "c", 30)))   // in scope, not in batch: kept
    // NULL predicate rows are out of scope (SQL ON semantics)
    val tgtN = Seq((Some(1L), Option.empty[Integer]), (Some(2L), Some(Integer.valueOf(20))))
      .toDF("k", "v")
    val bN = Seq((1L, 111), (2L, 222)).toDF("k", "v")
    val outN = mergePredicated(tgtN, bN, Seq("k"), Seq(col("v") > 0))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(outN === Set((1L, None), (1L, Some(111)), (2L, Some(222))))
    // empty predicate list degrades to plain merge
    assert(asMap(mergePredicated(tgt, src, Seq("k"), Nil)) ===
      asMap(merge(tgt, src, Seq("k"))))
  }

  test("merge is idempotent on identical source (property)") {
    val once = merge(tgt, src, Seq("k"))
    val twice = merge(once, src, Seq("k"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("microbatch replaces only the event-time slice") {
    val t = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("k", "d").select($"k", to_date($"d").as("d"))
    val b = Seq((9L, "2024-01-02")).toDF("k", "d").select($"k", to_date($"d").as("d"))
    val out = microbatch(t, b, "d",
      to_date(lit("2024-01-02")), to_date(lit("2024-01-03")))
      .select("k").as[Long].collect().toSet
    assert(out === Set(1L, 9L, 3L))
  }

  test("on_schema_change modes (on_schema_change.sql:2-143)") {
    val target = Seq((1L, "a")).toDF("k", "s")
    val source = Seq((2L, "b", 5)).toDF("k", "s", "extra")
    assert(reconcileSchema(target, source, IgnoreChange).columns.toSeq === Seq("k", "s"))
    assertThrows[IllegalStateException](reconcileSchema(target, source, FailChange))
    val appended = reconcileSchema(target, source, AppendNewColumns)
    assert(appended.columns.toSeq === Seq("k", "s", "extra"))
    assert(appended.collect()(0).isNullAt(2))
    val synced = reconcileSchema(Seq((1L, "a", true)).toDF("k", "s", "gone"), source, SyncAllColumns)
    assert(synced.columns.toSeq === Seq("k", "s", "extra"))
  }

  test("on_schema_change detects DATA TYPE drift, not just names (on_schema_change.sql:20-62)") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val target = Seq((1, "a")).toDF("k", "s")            // k: int
    val source = Seq((2L, "b")).toDF("k", "s")           // k: long (widened)
    // fail names the drift
    val ex = intercept[IllegalStateException](reconcileSchema(target, source, FailChange))
    assert(ex.getMessage.contains("k: int -> bigint"), ex.getMessage)
    // sync casts the target column to the source type
    val synced = reconcileSchema(target, source, SyncAllColumns)
    assert(synced.schema("k").dataType === LongType)
    assert(synced.select("k").as[Long].collect().toSeq === Seq(1L))
    // append_new_columns leaves type drift in place (sync_column_schemas only
    // adds columns in that mode)
    assert(reconcileSchema(target, source, AppendNewColumns).schema("k").dataType === IntegerType)
    // ignore leaves everything
    assert(reconcileSchema(target, source, IgnoreChange).schema("k").dataType === IntegerType)
  }

  test("on_schema_change: type drift combined with added+removed columns under sync") {
    import org.apache.spark.sql.types.DoubleType
    val target = Seq((1, 10.toShort, "gone")).toDF("k", "v", "dead")
    val source = Seq((2, 1.5d, true)).toDF("k", "v", "flag")
    val synced = reconcileSchema(target, source, SyncAllColumns)
    assert(synced.columns.toSeq === Seq("k", "v", "flag"))
    assert(synced.schema("v").dataType === DoubleType)
    val row = synced.collect()(0)
    assert(row.getDouble(1) === 10.0 && row.isNullAt(2))
  }

  test("merge raises on a nondeterministic match; unmatched duplicates still insert") {
    val target = Seq((1L, "t1"), (2L, "t2")).toDF("k", "v")
    // duplicate key 1 MATCHES the target -> Snowflake's
    // ERROR_ON_NONDETERMINISTIC_MERGE analogue must raise at execution
    val dupMatched = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    val ex = intercept[Exception] {
      Incremental.merge(target, dupMatched, Seq("k")).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("nondeterministic merge"))
    // duplicate key 9 matches NOTHING -> both rows insert (MERGE INSERT
    // clause semantics), no error
    val dupNew = Seq((9L, "a"), (9L, "b")).toDF("k", "v")
    val out = Incremental.merge(target, dupNew, Seq("k")).collect()
    assert(out.length === 4)
    // updateCols + excludeCols together is a contract error (dbt treats
    // them as mutually exclusive)
    assertThrows[IllegalArgumentException](
      Incremental.merge(target, dupNew, Seq("k"),
        updateCols = Some(Seq("v")), excludeCols = Seq("v")))
  }

  test("mergeAggregates: batch-split invariance (associativity) and column validation") {
    val rows = (1 to 300).map(i => (s"m${i % 7}", 1L, (i * 3).toLong, i.toLong))
    def partials(rs: Seq[(String, Long, Long, Long)]) =
      rs.toDF("k", "n", "s", "mx").groupBy($"k")
        .agg(sum($"n").as("n"), sum($"s").as("s"), max($"mx").as("mx"))
    val combiners = Seq("n" -> "sum", "s" -> "sum", "mx" -> "max")
    val full = partials(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // ANY split point yields the same state as one-shot aggregation
    Seq(1, 100, 299).foreach { cut =>
      val (a, b) = rows.splitAt(cut)
      val merged = Incremental.mergeAggregates(partials(a), partials(b),
        Seq("k"), combiners).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(merged === full, s"cut $cut")
    }
    // schema drift between state and batch fails loud
    assertThrows[IllegalArgumentException](
      Incremental.mergeAggregates(partials(rows).withColumnRenamed("s", "zz"),
        partials(rows), Seq("k"), combiners))
    // unsupported combiner fails loud (avg is not mergeable - carry sum+count)
    assertThrows[IllegalArgumentException](
      Incremental.mergeAggregates(partials(rows), partials(rows),
        Seq("k"), Seq("n" -> "avg")))
  }

  test("mergeAggregates rejects sum columns whose type Spark's sum() would widen") {
    // an INT sum column passes run 1 and 2 but run 2's output is LONG -
    // run 3 would hit the type-drift check forever (a stream replays the
    // same batch against the same widened state); the creation-time check
    // turns the wedge into a first-run error with a cast instruction
    val ints = Seq(("a", 1)).toDF("k", "n")
    val e = intercept[IllegalArgumentException](
      Incremental.mergeAggregates(ints, ints, Seq("k"), Seq("n" -> "sum")))
    assert(e.getMessage.contains("sum-stable"))
    // the stable fixed points pass: long, double, decimal(38,s)
    val longs = Seq(("a", 1L)).toDF("k", "n")
    val sumLong = Incremental.mergeAggregates(longs, longs, Seq("k"), Seq("n" -> "sum"))
    assert(sumLong.schema("n").dataType.typeName === "long")
    val dec = Seq(("a", BigDecimal(1))).toDF("k", "n")
      .select($"k", $"n".cast("decimal(38,2)").as("n"))
    val sumDec = Incremental.mergeAggregates(dec, dec, Seq("k"), Seq("n" -> "sum"))
    assert(sumDec.schema("n").dataType.sql === "DECIMAL(38,2)")
    // min/max do not widen - int state is fine there
    val viaMin = Incremental.mergeAggregates(ints, ints, Seq("k"), Seq("n" -> "min"))
    assert(viaMin.schema("n").dataType.typeName === "integer")
  }
}
