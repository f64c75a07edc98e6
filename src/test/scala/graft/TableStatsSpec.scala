package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.TableStats
import graft.functions.QuantileSketch

/** Sketch-backed optimizer statistics (engine/TableStats): profile
  * builds, the exact-under-k NDV path, the System-R join estimate and
  * broadcast advice, the advised physical plan, and the quantile-summary
  * range-selectivity envelope.
  */
class TableStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("columnCounts / columnRegisters: exact counts, exact NDV under k, partition invariance") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None),
      (2L, Some("b"))).toDF("id", "s")
    val counts = TableStats.columnCounts(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts === Map("id" -> ((4L, 4L)), "s" -> ((4L, 3L))))
    // k above the distinct count: the registers ARE the distinct set and
    // NDV reads exact
    val regs = TableStats.columnRegisters(df, Seq("id", "s"), 8)
    val ndv = TableStats.ndvEstimate(regs, 8).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap // (ts_col, n_regs, ndv)
    assert(ndv("id") === 3L && ndv("s") === 2L)
    // register content is partition-invariant (the KMV determinism law)
    val regsRepart =
      TableStats.columnRegisters(df.repartition(7), Seq("id", "s"), 8)
    assert(regs.collect().map(_.toString).sorted.toSeq
      === regsRepart.collect().map(_.toString).sorted.toSeq)
    // an empty table profiles as zeros, not NULLs
    val empty = TableStats.columnCounts(df.filter(lit(false)), Seq("id"))
      .collect()
    assert(empty.length === 1 && empty.head.getLong(1) === 0L
      && empty.head.getLong(2) === 0L)
  }

  test("adviseEquiJoin: decision matrix, estimate formula, zero-NDV guard") {
    def prof(n: Long, ndv: Long, suffix: String) =
      Seq((n, ndv)).toDF(s"n_$suffix", s"ndv_$suffix")
    def one(a: (Long, Long), b: (Long, Long), thr: Long) = {
      val r = TableStats.adviseEquiJoin(
        prof(a._1, a._2, "a"), prof(b._1, b._2, "b"), thr).collect().head
      (r.getAs[Long]("est_join_rows"), r.getAs[String]("join_plan"))
    }
    // small dim on the right -> broadcast_right; estimate is the
    // System-R containment formula n_a * n_b div max(ndv)
    assert(one((1000L, 100L), (50L, 50L), 100L) === ((500L, "broadcast_right")))
    // smaller left -> broadcast_left; ties broadcast the left too
    assert(one((50L, 50L), (1000L, 100L), 100L)._2 === "broadcast_left")
    assert(one((80L, 10L), (80L, 20L), 100L)._2 === "broadcast_left")
    // both sides above the budget -> shuffle
    assert(one((1000L, 10L), (1000L, 10L), 100L)
      === ((100000L, "shuffle")))
    // empty sides (ndv 0) never divide by zero; estimate reads 0
    assert(one((0L, 0L), (0L, 0L), 100L)._1 === 0L)
  }

  test("applyAdvice: the advised side is the broadcast side of the executed plan") {
    val left = spark.range(0, 2000)
      .select(col("id").as("k"), (col("id") * 2L).as("x"))
    val right = spark.range(0, 40)
      .select(col("id").as("k"), (col("id") + 1L).as("y"))
    val br = TableStats.applyAdvice(left, right, Seq("k"), "broadcast_right")
    assert(br.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "advised broadcast not in the plan")
    assert(br.count() === 40L)
    val bl = TableStats.applyAdvice(right, left, Seq("k"), "broadcast_left")
    assert(bl.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(bl.count() === 40L)
    // "shuffle" plants no hint and stays row-identical (AQE keeps its own
    // judgement — advice only ever ADDS a broadcast, so no absence pin)
    assert(TableStats.applyAdvice(left, right, Seq("k"), "shuffle")
      .count() === 40L)
    intercept[IllegalArgumentException] {
      TableStats.applyAdvice(left, right, Seq("k"), "sort_merge")
    }
  }

  test("mcvProfile: exact top-k counts, deterministic count-desc value-asc tie-break, window over the rollup only") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("b") ++ Seq.fill(3)("a")
      ++ Seq("t1", "t2")).toDF("v")
    val got = TableStats.mcvProfile(df, "v", 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // 'a' and 'b' tie at 3: value-asc keeps 'a' — both engines replay it
    assert(got === Seq(("x", 5L), ("a", 3L)))
    // partition invariance (the build is a deterministic rollup + cut)
    val re = TableStats.mcvProfile(df.repartition(7), "v", 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(re === got)
    // NULLs never profile as a most-common value
    val withNull = Seq(Some("x"), None, None, None, Some("y")).toDF("v")
    assert(TableStats.mcvProfile(withNull, "v", 1).collect()
      .map(_.getString(0)).toSeq === Seq("x"))
  }

  test("equiJoinEstimateMcv: the four eqjoinsel terms on a hand example") {
    // A: x*5, a*3, tail {t1, t2} (mass 2, ndv 2 of total 4)
    // B: x*4, b*6, tail {t1}    (mass 1, ndv 1 of total 3)
    def mcv(rows: (String, Long)*) = rows.toSeq.toDF("mcv_value", "mcv_count")
    def side(n: Long, ndv: Long, s: String) =
      Seq((n, ndv)).toDF(s"n_$s", s"ndv_$s")
    val r = TableStats.equiJoinEstimateMcv(
      mcv(("x", 5L), ("a", 3L)), side(10L, 4L, "a"),
      mcv(("x", 4L), ("b", 6L)), side(11L, 3L, "b")).collect().head
    assert(r.getAs[Long]("t_matched") === 20L) // x: 5*4
    assert(r.getAs[Long]("t_a_tail") === 3L) // a(3) * 1 div 1
    assert(r.getAs[Long]("t_b_tail") === 6L) // b(6) * 2 div 2
    assert(r.getAs[Long]("t_tails") === 1L) // 2*1 div max(2,1)
    assert(r.getAs[Long]("est_join_rows_mcv") === 30L)
    assert(r.getAs[Long]("tail_ndv_b") === 1L)
  }

  test("equiJoinEstimateOverlap: measured-overlap formula, zero-guard") {
    val a = Seq((100L, 10L)).toDF("n_a", "ndv_a")
    val b = Seq((60L, 20L)).toDF("n_b", "ndv_b")
    val ops = Seq(4L).toDF("est_both")
    val r = TableStats.equiJoinEstimateOverlap(a, b, ops).collect().head
    // 4 * 100 * 60 div (10 * 20) = 120
    assert(r.getAs[Long]("est_join_rows_overlap") === 120L)
    val z = TableStats.equiJoinEstimateOverlap(
      Seq((0L, 0L)).toDF("n_a", "ndv_a"), Seq((0L, 0L)).toDF("n_b", "ndv_b"),
      Seq(0L).toDF("est_both")).collect().head
    assert(z.getAs[Long]("est_join_rows_overlap") === 0L)
  }

  test("hotColdJoin: identity with the plain inner join, hot branch broadcasts, guards") {
    import graft.engine.Skew
    // planted hot key 7 owns half the fact; NULL keys must vanish like
    // an inner join
    val fact = ((0L until 500L).map(i => (Some(7L), i))
      ++ (0L until 500L).map(i => (Some(i % 50L), i + 1000L))
      ++ Seq((Option.empty[Long], 9999L))).toDF("k", "x")
    val dim = (0L until 50L).map(k => (k, s"d$k")).toDF("k", "name")
    val got = Skew.hotColdJoin(fact, dim, "k", Seq(7L))
    val plain = fact.join(dim, Seq("k"))
    assert(got.count() === plain.count())
    assert(got.collect().map(_.toString).sorted.toSeq
      === plain.collect().map(_.toString).sorted.toSeq)
    assert(got.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "hot branch not broadcast")
    intercept[IllegalArgumentException] {
      Skew.hotColdJoin(fact, dim, "k", Nil)
    }
    intercept[IllegalArgumentException] {
      Skew.hotColdJoin(fact, dim, "k", Seq(7L, null))
    }
  }

  test("analyzeHook: sidecars rewrite after CTAS and after the merge; run-level misuse raises") {
    import java.nio.file.Files
    import graft.engine.{HookContext, Incremental, IncrementalMat, Model,
      Registry, Warehouse}
    val wh = new Warehouse(Files.createTempDirectory("graft_wh").toString, spark)
    val reg = new Registry(spark, wh)
    val src = (1L to 10L).map(i => (i, i % 3L)).toDF("id", "g")
    reg.source("src", src)
    reg.register(Model("t", Seq("src"),
      IncrementalMat(Incremental.Merge, Seq("id")),
      ctx => if (ctx.isIncremental) ctx.ref("src").filter(col("id") > 4L)
        else ctx.ref("src").filter(col("id") <= 4L),
      postHooks = Seq(TableStats.analyzeHook(Seq("id", "g"), 16))))
    reg.run()
    def prof() = TableStats.readProfile(wh, "t", "id", "x", 16)
      .collect().head
    assert(prof().getAs[Long]("n_x") === 4L
      && prof().getAs[Long]("ndv_x") === 4L)
    reg.run() // merge admits ids 5..10; the hook must re-profile
    assert(prof().getAs[Long]("n_x") === 10L
      && prof().getAs[Long]("ndv_x") === 10L)
    // both declared columns profiled
    assert(wh.read("t__stats_counts").count() === 2L)
    // a run-level context (no model) must raise, not write a sidecar
    intercept[IllegalArgumentException] {
      TableStats.analyzeHook(Seq("id"))(HookContext(spark, wh, None, None))
    }
  }

  test("feedbackAdjust: mass-weighted ratio correction, empty-feedback passthrough") {
    val raw = Seq(100L).toDF("est_ind")
    val fb = Seq((10L, 55L), (30L, 145L)).toDF("fb_est", "fb_actual")
    val r = TableStats.feedbackAdjust(raw, fb, "est_ind").collect().head
    // ratio = (55+145) div (10+30) = 5 -> 100 * 200 div 40 = 500
    assert(r.getAs[Long]("est_ind_adjusted") === 500L)
    assert(r.getAs[Long]("fb_actual_sum") === 200L)
    // no observations: the raw estimate passes through unchanged
    val empty = fb.filter(lit(false))
    assert(TableStats.feedbackAdjust(raw, empty, "est_ind")
      .collect().head.getAs[Long]("est_ind_adjusted") === 100L)
  }

  test("clusterAdvisor: workload-weighted pricing, and the chosen layout actually prunes") {
    import java.nio.file.Files
    import graft.engine.Warehouse
    // a: uniform 0..999; b: uniform 0..99 — workload is a tight range
    // on a (sel 10%) with weight 4 and a half-domain range on b with
    // weight 1
    val df = spark.range(0, 1000)
      .select(col("id").as("a"), (col("id") % 100L).as("b"))
    val summaries = TableStats.columnSummaries(df, Seq("a", "b"), 100)
    val workload = Seq(("a", 0L, 99L, 4L), ("b", 0L, 49L, 1L))
      .toDF("wl_col", "wl_lo", "wl_hi", "wl_weight")
    val got = TableStats.clusterAdvisor(summaries, workload, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("est_scan_ppm"), r.getAs[Long]("chosen")))).toMap
    // a: (4*100000 + 1*1000000) / 5 = 280000; b: (4*1e6 + 1*500000)/5
    assert(got("a") === ((280000L, 1L)), s"got $got")
    assert(got("b") === ((900000L, 0L)), s"got $got")
    // the physical loop: the advised layout's manifest prunes the
    // dominant predicate; the rejected layout reads every file
    val wh = new Warehouse(Files.createTempDirectory("graft_wh").toString, spark)
    wh.writeSwap("by_a", df.repartitionByRange(8, col("a"))
      .sortWithinPartitions("a"), statsCols = Seq("a"))
    wh.writeSwap("by_b", df.repartitionByRange(8, col("b"))
      .sortWithinPartitions("b"), statsCols = Seq("a"))
    val Some((keptA, nA)) = wh.statsPrunedFiles("by_a", "a", 0L, 99L)
    val Some((keptB, nB)) = wh.statsPrunedFiles("by_b", "a", 0L, 99L)
    assert(keptA.size < nA, s"advised layout kept ${keptA.size} of $nA")
    assert(keptB.size === nB, s"rejected layout pruned ${keptB.size} of $nB")
    // integral-only contract
    intercept[IllegalArgumentException] {
      TableStats.columnSummaries(df.withColumn("s", lit("x")), Seq("s"), 10)
    }
  }

  test("rangeCountEstimate: exact on uncompressed registers, within the stride on compressed, grouped") {
    val vals = (1L to 1000L).toDF("v")
    val regs = QuantileSketch.qsRegisters(vals, Nil, col("v"))
    // uncompressed registers: every rank is exact, the estimate is exact
    val exact = TableStats.rangeCountEstimate(regs, Nil, 101L, 350L, 10)
      .collect().head
    assert(exact.getAs[Long]("est_in_range") === 250L)
    assert(exact.getAs[Long]("w_total") === 1000L)
    assert(exact.getAs[Long]("err_bound") === 100L) // ceil(1000/10)
    // k=10 compression: stride s = 100, the estimate must land within s
    val comp = QuantileSketch.qsCompress(regs, Nil, 10)
    for ((lo, hi, truth) <- Seq((101L, 350L, 250L), (1L, 77L, 77L),
        (900L, 2000L, 101L))) {
      val est = TableStats.rangeCountEstimate(comp, Nil, lo, hi, 10)
        .collect().head.getAs[Long]("est_in_range")
      assert(math.abs(est - truth) <= 100L,
        s"[$lo,$hi]: est $est vs exact $truth exceeds the stride bound")
    }
    // grouped form: per-group totals and estimates
    val two = QuantileSketch.qsRegisters(
      Seq.tabulate(100)(i => ("g1", i.toLong + 1L))
        .++(Seq.tabulate(50)(i => ("g2", i.toLong + 1L)))
        .toDF("g", "v"), Seq("g"), col("v"))
    val byG = TableStats.rangeCountEstimate(two, Seq("g"), 11L, 30L, 10)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("est_in_range"), r.getAs[Long]("w_total")))).toMap
    assert(byG === Map("g1" -> ((20L, 100L)), "g2" -> ((20L, 50L))))
    intercept[IllegalArgumentException] {
      TableStats.rangeCountEstimate(regs, Nil, 10L, 5L, 10)
    }
  }
}
