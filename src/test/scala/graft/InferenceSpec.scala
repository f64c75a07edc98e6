package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FuzzyLink
import graft.pipeline.{Inference, Multimodal}

/** Hand-computable vectors for the continuation-II battery (q262-q307):
  * the hypothesis-test layer (KS, CvM, Mann-Whitney, Spearman, Gini, HHI,
  * kappa, Kaplan-Meier/RMST, bootstrap, CUPED, DiD, MDE, conformal,
  * sequential looks, uplift), record linkage (Fellegi-Sunter), privacy
  * (l-diversity, t-closeness, pseudonymization), attribution (time-decay,
  * position, Markov removal), perceptual/audio/video fingerprint dedup,
  * TextRank/PRF retrieval, MMR, Holt/Holt-Winters/changepoint/CCF, and
  * the classifier-evaluation set (AUC, reliability, gains) — plus the
  * plan-shape pins that are these operators' 100 TB contracts.
  */
class InferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- ksTest ----

  test("ksTest: textbook two-sample D with the argmax location") {
    // A=[1,2,3], B=[2,3,4,4]: gaps*12 over v=1..4 are 4,5,6,0 -> D=6/12
    val df = (Seq(1L, 2L, 3L).map((_, false)) ++
      Seq(2L, 3L, 4L, 4L).map((_, true))).toDF("v", "b")
    val r = Inference.ksTest(df, col("v"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((3L, 4L, 6L, 500000L, 3L)))
  }

  test("ksTest: identical samples give D = 0; d_at is the smallest value") {
    val df = (Seq(5L, 6L, 7L).map((_, false)) ++
      Seq(5L, 6L, 7L).map((_, true))).toDF("v", "b")
    val r = Inference.ksTest(df, col("v"), col("b")).collect()(0)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L && r.getLong(4) === 5L)
  }

  test("ksTest: disjoint supports give D = 1 (ppm 1000000)") {
    val df = (Seq(1L, 2L).map((_, false)) ++ Seq(9L, 10L).map((_, true)))
      .toDF("v", "b")
    val r = Inference.ksTest(df, col("v"), col("b")).collect()(0)
    assert(r.getLong(3) === 1000000L && r.getLong(4) === 2L)
  }

  // ---- ksFromRegisters ----

  test("ksFromRegisters: equals ksTest on the same multisets; weighted registers; empty side drops") {
    // register form of the textbook vector: A=[1,2,3], B=[2,3,4,4]
    val ra = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("qs_value", "qs_weight")
    val rb = Seq((2L, 1L), (3L, 1L), (4L, 2L)).toDF("qs_value", "qs_weight")
    val r = Inference.ksFromRegisters(ra, rb).collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("d_num"), r.getAs[Long]("d_ppm"))
      === ((3L, 4L, 6L, 500000L)))
    // weights represent multiplicity: the same comparison with B's 4s as
    // one weight-2 register is the identical statistic (the stored-rollup
    // contract — a register table IS the multiset)
    val rb2 = Seq((2L, 1L), (3L, 1L), (4L, 1L), (4L, 1L))
      .toDF("qs_value", "qs_weight") // bag-union form pre-rolls internally
    val r2 = Inference.ksFromRegisters(ra, rb2).collect()(0)
    assert(r2.getAs[Long]("d_ppm") === 500000L)
    // either side empty -> empty frame (no defined distance)
    val empty = Seq.empty[(Long, Long)].toDF("qs_value", "qs_weight")
    assert(Inference.ksFromRegisters(ra, empty).collect().isEmpty)
    assert(Inference.ksFromRegisters(empty, rb).collect().isEmpty)
  }

  test("chi2FromRegisters: hand 2x2, identical zero, zero-mass drop, empty side drops") {
    // A = {v1:30, v2:10}, B = {v1:10, v2:30}: every expected cell is 20,
    // chi2 = 4 * (10^2/20) = 20 points = 20000 milli; per-cell law:
    // delta = 30*80 - 40*40 = 800, term = 800^2*1000/(80*40*40) = 5000
    val ra = Seq((1L, 30L), (2L, 10L)).toDF("qs_value", "qs_weight")
    val rb = Seq((1L, 10L), (2L, 30L)).toDF("qs_value", "qs_weight")
    val r = Inference.chi2FromRegisters(ra, rb).collect()(0)
    assert((r.getAs[Long]("n_cats"), r.getAs[Long]("dof"),
      r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("chi2_milli")) === ((2L, 1L, 40L, 40L, 20000L)))
    // identical distributions: every delta is exactly 0
    val same = Inference.chi2FromRegisters(ra, ra).collect()(0)
    assert(same.getAs[Long]("chi2_milli") === 0L)
    // explicit zero-weight bag rows on BOTH sides are not a category
    // (they would divide by colTot 0); n_cats must stay 2
    val raz = ra.unionByName(Seq((9L, 0L)).toDF("qs_value", "qs_weight"))
    val rbz = rb.unionByName(Seq((9L, 0L)).toDF("qs_value", "qs_weight"))
    val rz = Inference.chi2FromRegisters(raz, rbz).collect()(0)
    assert((rz.getAs[Long]("n_cats"), rz.getAs[Long]("chi2_milli"))
      === ((2L, 20000L)))
    // a category present on ONE side only carries its zero cell exactly:
    // A = {1:2}, B = {2:2} (disjoint): N=4, each side's two cells
    // contribute (2*4-2*2)^2*1000/(4*2*2) = 1000 each -> 4000 milli
    val da = Seq((1L, 2L)).toDF("qs_value", "qs_weight")
    val db = Seq((2L, 2L)).toDF("qs_value", "qs_weight")
    assert(Inference.chi2FromRegisters(da, db).collect()(0)
      .getAs[Long]("chi2_milli") === 4000L)
    // either side empty -> empty frame
    val empty = Seq.empty[(Long, Long)].toDF("qs_value", "qs_weight")
    assert(Inference.chi2FromRegisters(ra, empty).collect().isEmpty)
    assert(Inference.chi2FromRegisters(empty, rb).collect().isEmpty)
  }

  test("w1FromRegisters: hand integral, single-value zero, empty side drops") {
    // A = {0, 10}, B = {10, 20} as registers: true W1 = 10 units = 10e6
    val ra = Seq((0L, 1L), (10L, 1L)).toDF("qs_value", "qs_weight")
    val rb = Seq((10L, 1L), (20L, 1L)).toDF("qs_value", "qs_weight")
    val r = Inference.w1FromRegisters(ra, rb).collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("w1_micro")) === ((2L, 2L, 10000000L)))
    // single shared value: w1_micro = 0, not a dropped row
    val one = Seq((7L, 3L)).toDF("qs_value", "qs_weight")
    val oneB = Seq((7L, 2L)).toDF("qs_value", "qs_weight")
    val r1 = Inference.w1FromRegisters(one, oneB).collect()
    assert(r1.length === 1 && r1(0).getAs[Long]("w1_micro") === 0L)
    // empty side drops
    val empty = Seq.empty[(Long, Long)].toDF("qs_value", "qs_weight")
    assert(Inference.w1FromRegisters(ra, empty).collect().isEmpty)
  }

  test("tvdFromRegisters: identical zero, disjoint 1e6, hand mass, empty side NULL") {
    val ra = Seq((1L, 2L), (2L, 2L)).toDF("qs_value", "qs_weight")
    assert(Inference.tvdFromRegisters(ra, ra).collect()(0)
      .getAs[Long]("tv_ppm") === 0L)
    // disjoint supports: full mass differs
    val rb = Seq((8L, 4L), (9L, 1L)).toDF("qs_value", "qs_weight")
    val d = Inference.tvdFromRegisters(ra, rb).collect()(0)
    assert(d.getAs[Long]("n_cats") === 4L && d.getAs[Long]("tv_ppm") === 1000000L)
    // hand vector: A = {1:3, 2:1}, B = {1:1, 2:3} -> TV = 1/2(|3/4-1/4|*2) = 1/2
    val ha = Seq((1L, 3L), (2L, 1L)).toDF("qs_value", "qs_weight")
    val hb = Seq((1L, 1L), (2L, 3L)).toDF("qs_value", "qs_weight")
    assert(Inference.tvdFromRegisters(ha, hb).collect()(0)
      .getAs[Long]("tv_ppm") === 500000L)
    // one side empty -> NULL tv_ppm (totalVariationDrift's guard)
    val empty = Seq.empty[(Long, Long)].toDF("qs_value", "qs_weight")
    val e = Inference.tvdFromRegisters(ha, empty).collect()(0)
    assert(e.isNullAt(e.fieldIndex("tv_ppm")))
  }

  test("tdFromRegisters: hand 2x2, identical zero, disjoint 2e6, zero-mass drop, empty drops") {
    // A = {1:1, 2:3}, B = {1:3, 2:1}: p = (1/4, 3/4), q = (3/4, 1/4),
    // delta = (1/2)^2/1 + (1/2)^2/1 = 1/2 -> 500000 ppm; per-term law:
    // (1*4 - 3*4)^2 * 1e6 div (4*4*(1*4 + 3*4)) = 64e6/256 = 250000 each
    val ra = Seq((1L, 1L), (2L, 3L)).toDF("qs_value", "qs_weight")
    val rb = Seq((1L, 3L), (2L, 1L)).toDF("qs_value", "qs_weight")
    val r = Inference.tdFromRegisters(ra, rb).collect()(0)
    assert((r.getAs[Long]("n_cats"), r.getAs[Long]("n_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("td_ppm"))
      === ((2L, 4L, 4L, 500000L)))
    // identical distributions: every delta exactly 0
    assert(Inference.tdFromRegisters(ra, ra).collect()(0)
      .getAs[Long]("td_ppm") === 0L)
    // disjoint supports saturate the bound: each one-sided category
    // contributes its own relative mass, total EXACTLY 2e6
    val da = Seq((1L, 3L)).toDF("qs_value", "qs_weight")
    val db = Seq((2L, 5L)).toDF("qs_value", "qs_weight")
    assert(Inference.tdFromRegisters(da, db).collect()(0)
      .getAs[Long]("td_ppm") === 2000000L)
    // explicit zero-weight bag rows on both sides are not a category
    val raz = ra.unionByName(Seq((9L, 0L)).toDF("qs_value", "qs_weight"))
    val rbz = rb.unionByName(Seq((9L, 0L)).toDF("qs_value", "qs_weight"))
    val rz = Inference.tdFromRegisters(raz, rbz).collect()(0)
    assert((rz.getAs[Long]("n_cats"), rz.getAs[Long]("td_ppm"))
      === ((2L, 500000L)))
    // either side empty -> empty frame
    val empty = Seq.empty[(Long, Long)].toDF("qs_value", "qs_weight")
    assert(Inference.tdFromRegisters(ra, empty).collect().isEmpty)
    assert(Inference.tdFromRegisters(empty, rb).collect().isEmpty)
  }

  test("ksFromRegistersByGroup: per-group == ungrouped scorer; one-sided groups drop") {
    val baseline = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("qs_value", "qs_weight")
    val live = Seq(
      ("g1", 2L, 1L), ("g1", 3L, 1L), ("g1", 4L, 2L), // the ksFromRegisters hand vector
      ("g2", 1L, 1L), ("g2", 2L, 1L), ("g2", 3L, 1L), ("g2", 4L, 1L) // identical to baseline
    ).toDF("g", "qs_value", "qs_weight")
    val rows = Inference.ksFromRegistersByGroup(live, baseline, Seq("g"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("d_num"), r.getAs[Long]("d_ppm"))).toMap
    // g1 must equal the ungrouped scorer on the same pair
    val solo = Inference.ksFromRegisters(baseline,
      live.filter(col("g") === "g1").select(col("qs_value"), col("qs_weight")))
      .collect()(0)
    assert(rows("g1") === ((solo.getAs[Long]("n_a"), solo.getAs[Long]("n_b"),
      solo.getAs[Long]("d_num"), solo.getAs[Long]("d_ppm"))))
    // an identical group reads exactly 0
    assert(rows("g2") === ((4L, 4L, 0L, 0L)))
    // a group with no live mass simply doesn't exist; empty live -> empty
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "qs_value", "qs_weight")
    assert(Inference.ksFromRegistersByGroup(empty, baseline, Seq("g"))
      .collect().isEmpty)
  }

  test("driftPanelFromRegisters: every column equals its standalone scorer per group") {
    val baseline = Seq((0L, 1L), (10L, 1L), (20L, 2L), (40L, 1L))
      .toDF("qs_value", "qs_weight")
    val live = Seq(
      ("g1", 10L, 1L), ("g1", 20L, 1L), ("g1", 30L, 2L), // shifted + a new value
      ("g2", 0L, 1L), ("g2", 10L, 1L), ("g2", 20L, 2L), ("g2", 40L, 1L), // identical
      ("g3", 7L, 3L) // single value, disjoint from baseline
    ).toDF("g", "qs_value", "qs_weight")
    val panel = Inference.driftPanelFromRegisters(live, baseline, Seq("g"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(panel.keySet === Set("g1", "g2", "g3"))
    for (g <- Seq("g1", "g2", "g3")) {
      val liveG = live.filter(col("g") === g)
        .select(col("qs_value"), col("qs_weight"))
      val p = panel(g)
      val ks = Inference.ksFromRegisters(baseline, liveG).collect()(0)
      assert((p.getAs[Long]("n_a"), p.getAs[Long]("n_b"),
        p.getAs[Long]("d_num"), p.getAs[Long]("d_ppm")) ===
        ((ks.getAs[Long]("n_a"), ks.getAs[Long]("n_b"),
          ks.getAs[Long]("d_num"), ks.getAs[Long]("d_ppm"))), s"KS at $g")
      assert(p.getAs[Long]("w1_micro") ===
        Inference.w1FromRegisters(baseline, liveG).collect()(0)
          .getAs[Long]("w1_micro"), s"W1 at $g")
      val tvd = Inference.tvdFromRegisters(baseline, liveG).collect()(0)
      assert((p.getAs[Long]("n_cats"), p.getAs[Long]("tv_ppm")) ===
        ((tvd.getAs[Long]("n_cats"), tvd.getAs[Long]("tv_ppm"))), s"TVD at $g")
      val chi = Inference.chi2FromRegisters(baseline, liveG).collect()(0)
      assert((p.getAs[Long]("dof"), p.getAs[Long]("chi2_milli")) ===
        ((chi.getAs[Long]("dof"), chi.getAs[Long]("chi2_milli"))), s"chi2 at $g")
      assert(p.getAs[Long]("td_ppm") ===
        Inference.tdFromRegisters(baseline, liveG).collect()(0)
          .getAs[Long]("td_ppm"), s"TD at $g")
    }
    // the identical group is quiet on every law; the disjoint group
    // saturates the bounded laws
    val g2 = panel("g2"); val g3 = panel("g3")
    assert(g2.getAs[Long]("d_ppm") === 0L && g2.getAs[Long]("w1_micro") === 0L &&
      g2.getAs[Long]("tv_ppm") === 0L && g2.getAs[Long]("chi2_milli") === 0L &&
      g2.getAs[Long]("td_ppm") === 0L)
    // (KS does NOT saturate: the supports interleave — baseline mass at 0
    // sits below the live value 7, so D = |1*3 - 3*5|/15 = 12/15)
    assert(g3.getAs[Long]("d_ppm") === 800000L &&
      g3.getAs[Long]("tv_ppm") === 1000000L &&
      g3.getAs[Long]("td_ppm") === 2000000L)
    // empty live -> empty panel
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "qs_value", "qs_weight")
    assert(Inference.driftPanelFromRegisters(empty, baseline, Seq("g"))
      .collect().isEmpty)
  }

  // ---- cramerVonMises ----

  test("cramerVonMises: hand integral; everywhere-small beats somewhere-big for CvM") {
    // A=[1,3], B=[2,4]: integer gaps cum_a*n_b - cum_b*n_a at v=1..4 are
    // 2,0,2,0 -> sum cnt*gap^2 = 8; T = 8/(4*16) = 0.125 -> 125000 micro
    val df = (Seq(1L, 3L).map((_, false)) ++ Seq(2L, 4L).map((_, true)))
      .toDF("v", "b")
    val r = Inference.cramerVonMises(df, col("v"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 125000L)))
    // identical samples -> 0
    val same = (Seq(5L, 6L).map((_, false)) ++ Seq(5L, 6L).map((_, true)))
      .toDF("v", "b")
    assert(Inference.cramerVonMises(same, col("v"), col("b"))
      .collect()(0).getLong(2) === 0L)
    // interleaved-everywhere vs single-spike: same KS D, CvM separates them
    val spread = ((1L to 20L).map(v => (v * 2, false)) ++
      (1L to 20L).map(v => (v * 2 + 1, true))).toDF("v", "b")
    val spike = ((1L to 20L).map(v => (v, false)) ++
      ((1L to 19L).map(v => (v, true)) :+ 100L -> true)).toDF("v", "b")
    val tSpread = Inference.cramerVonMises(spread, col("v"), col("b"))
      .collect()(0).getLong(2)
    val tSpike = Inference.cramerVonMises(spike, col("v"), col("b"))
      .collect()(0).getLong(2)
    val dSpread = Inference.ksTest(spread, col("v"), col("b"))
      .collect()(0).getAs[Long]("d_ppm")
    val dSpike = Inference.ksTest(spike, col("v"), col("b"))
      .collect()(0).getAs[Long]("d_ppm")
    assert(dSpread === dSpike) // KS cannot tell them apart
    assert(tSpread > tSpike) // CvM can
  }

  // ---- ksTestByGroup ----

  test("ksTestByGroup: per-group D equals the global test run per slice; windows partitioned") {
    val g1 = (Seq(1L, 2L, 3L).map(("s1", _, false)) ++
      Seq(2L, 3L, 4L, 4L).map(("s1", _, true)))
    val g2 = (Seq(9L, 9L).map(("s2", _, false)) ++ Seq(1L, 1L).map(("s2", _, true)))
    val onesided = Seq(("s3", 5L, false)) // no B observations -> excluded
    val df = (g1 ++ g2 ++ onesided).toDF("seg", "v", "b")
    val out = Inference.ksTestByGroup(df, Seq("seg"), col("v"), col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("s1") === ((3L, 4L, 6L, 500000L))) // the q262 textbook vector
    assert(out("s2") === ((2L, 2L, 4L, 1000000L))) // disjoint supports
    assert(!out.contains("s3"))
    // plan: the ECDF window carries the group partition — parallel, no
    // single-partition funnel, no guard required
    val plan = Inference.ksTestByGroup(df, Seq("seg"), col("v"), col("b"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(seg"), s"window lost its partition:\n$plan")
  }

  // ---- mannWhitney ----

  test("mannWhitney: tied vector matches the hand rank sum") {
    // A=[1,2,2], B=[2,3]: rank2x = 2,6,6,6,10; R2_A=14, U2_A=2 (U_A=1);
    // tie block c=3 -> tie_term = 24
    val df = (Seq(1L, 2L, 2L).map((_, false)) ++ Seq(2L, 3L).map((_, true)))
      .toDF("v", "b")
    val r = Inference.mannWhitney(df, col("v"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((3L, 2L, 2L, 24L)))
    // z denominator: sqrt(6*((6*5*4)-24)/(3*5*4)) = sqrt(579.2/60)... exact:
    // na*nb*((n+1)n(n-1)-tie) = 6*96=576; 3n(n-1)=60 -> sqrt(9.6)
    val z = r.getDouble(4)
    assert(math.abs(z - (2.0 - 6.0) / math.sqrt(576.0 / 60.0)) < 1e-12)
  }

  test("mannWhitney: u2_a + u2_b identity (2*na*nb)") {
    val df = (Seq(3L, 1L, 4L, 1L, 5L).map((_, false)) ++
      Seq(9L, 2L, 6L, 5L).map((_, true))).toDF("v", "b")
    val a = Inference.mannWhitney(df, col("v"), col("b")).collect()(0)
    val b = Inference.mannWhitney(df, col("v"), !col("b")).collect()(0)
    assert(a.getLong(2) + b.getLong(2) === 2L * a.getLong(0) * a.getLong(1))
  }

  // ---- spearman ----

  test("spearman: perfect monotone is +1, anti-monotone is -1") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 400L)).toDF("x", "y")
    assert(math.abs(Inference.spearman(up, col("x"), col("y"))
      .collect()(0).getDouble(1) - 1.0) < 1e-12)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(math.abs(Inference.spearman(down, col("x"), col("y"))
      .collect()(0).getDouble(1) + 1.0) < 1e-12)
  }

  test("spearman: tie-averaged ranks match a direct Pearson over avg ranks") {
    val data = Seq((1L, 7L), (2L, 7L), (2L, 3L), (5L, 9L), (5L, 1L), (6L, 3L))
    val df = data.toDF("x", "y")
    val rho = Inference.spearman(df, col("x"), col("y")).collect()(0).getDouble(1)
    def avgRanks(vs: Seq[Long]): Seq[Double] = {
      val sorted = vs.sorted
      vs.map { v =>
        val l = sorted.count(_ < v); val c = sorted.count(_ == v)
        l + (c + 1) / 2.0
      }
    }
    val rx = avgRanks(data.map(_._1)); val ry = avgRanks(data.map(_._2))
    val n = rx.size.toDouble
    val sx = rx.sum; val sy = ry.sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(rho - want) < 1e-12)
  }

  // ---- gini ----

  test("gini: equality is 0, extreme concentration approaches (n-1)/n") {
    val eq = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 5L)).toDF("grp", "v")
    val g1 = Inference.gini(eq, Seq("grp"), col("v")).collect()(0)
    assert(g1.getAs[Long]("gini_ppm") === 0L)
    // [0,0,0,1]: G = (2*4 - 5*1)/(4*1) = 0.75
    val conc = Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 1L)).toDF("grp", "v")
    val g2 = Inference.gini(conc, Seq("grp"), col("v")).collect()(0)
    assert(g2.getAs[Long]("gini_ppm") === 750000L)
  }

  test("gini: tie-block formula equals the row-level definition; zero total -> NULL") {
    val vs = Seq(1L, 1L, 2L, 3L, 3L, 3L, 10L)
    val df = vs.map(("g", _)).toDF("grp", "v")
    val got = Inference.gini(df, Seq("grp"), col("v")).collect()(0)
      .getAs[Long]("gini_ppm")
    val sorted = vs.sorted; val n = vs.size.toLong; val t = vs.sum
    val twoS = sorted.zipWithIndex.map { case (v, i) => 2L * (i + 1) * v }.sum
    assert(got === (twoS - (n + 1) * t) * 1000000L / (n * t))
    val zero = Seq(("z", 0L), ("z", 0L)).toDF("grp", "v")
    assert(Inference.gini(zero, Seq("grp"), col("v")).collect()(0).isNullAt(
      Inference.gini(zero, Seq("grp"), col("v")).columns.indexOf("gini_ppm")))
  }

  // ---- hhi ----

  test("hhi: monopoly is 1e6 ppm, n-way equal split is 1e6/n; zero members drop") {
    val mono = Seq(("g", 1L, 100L), ("g", 1L, 50L), ("g", 2L, 0L))
      .toDF("grp", "m", "v")
    val r1 = Inference.hhi(mono, Seq("grp"), col("m"), col("v")).collect()(0)
    assert(r1.getAs[Long]("n_members") === 1L) // the zero-total member drops
    assert(r1.getAs[Long]("hhi_ppm") === 1000000L)
    val eq = (1L to 8L).map(i => ("g", i, 25L)).toDF("grp", "m", "v")
    val r2 = Inference.hhi(eq, Seq("grp"), col("m"), col("v")).collect()(0)
    assert(r2.getAs[Long]("hhi_ppm") === 125000L) // 1e6/8
    // 50/50 two-member: 500000 — equal (gini 0) yet highly concentrated
    val duo = Seq(("g", 1L, 7L), ("g", 2L, 7L)).toDF("grp", "m", "v")
    assert(Inference.hhi(duo, Seq("grp"), col("m"), col("v"))
      .collect()(0).getAs[Long]("hhi_ppm") === 500000L)
  }

  // ---- bootstrapMeanDiff ----

  test("bootstrapMeanDiff: exact observed diff, ordered CI, deterministic draws") {
    val rows = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) 100L + (i % 7) else 200L + (i % 11), i % 2 == 1))
    val df = rows.toDF("id", "v", "grp")
    val r = Inference.bootstrapMeanDiff(df, col("id"), col("v"), col("grp"),
      b = 48, seed = "t1").collect()(0)
    val meanA = rows.filter(!_._3).map(_._2).sum * 1000 / rows.count(!_._3)
    val meanB = rows.filter(_._3).map(_._2).sum * 1000 / rows.count(_._3)
    assert(r.getAs[Long]("obs_diff_milli") === meanA - meanB)
    val (lo, hi, beff) = (r.getAs[Long]("lo_milli"), r.getAs[Long]("hi_milli"),
      r.getAs[Long]("b_eff"))
    assert(lo <= hi && beff <= 48L && beff >= 43L)
    // a clear separation (A ~100s vs B ~200s) keeps the CI strictly negative
    // for the B-minus... A-minus-B direction: obs ~ -100k milli, CI around it
    assert(lo < r.getAs[Long]("obs_diff_milli") + 20000L &&
      hi > r.getAs[Long]("obs_diff_milli") - 20000L)
    // deterministic: identical seed reproduces bit-identically
    val again = Inference.bootstrapMeanDiff(df, col("id"), col("v"), col("grp"),
      b = 48, seed = "t1").collect()(0)
    assert(again.toSeq === r.toSeq)
    // different seed draws different resamples
    val other = Inference.bootstrapMeanDiff(df, col("id"), col("v"), col("grp"),
      b = 48, seed = "t2").collect()(0)
    assert((other.getAs[Long]("lo_milli"), other.getAs[Long]("hi_milli"))
      !== ((lo, hi)))
    // lane-split contract: b must be a multiple of 4 (one digest per 4 lanes)
    intercept[IllegalArgumentException] {
      Inference.bootstrapMeanDiff(df, col("id"), col("v"), col("grp"), b = 50)
    }
  }

  test("bootstrapMeanDiff: lanes within a block draw independently") {
    // b = 4 is exactly ONE digest block: if all four lanes read the same
    // 8-hex slice, the four replicates would be bit-identical and the CI
    // would collapse to lo == hi; independent slices make them differ
    val rows = (1L to 100L).map(i => (i, 50L + (i * 17) % 97, i % 3 == 0))
    val df = rows.toDF("id", "v", "grp")
    val r = Inference.bootstrapMeanDiff(df, col("id"), col("v"), col("grp"),
      b = 4, seed = "lane").collect()(0)
    assert(r.getAs[Long]("b_eff") === 4L)
    assert(r.getAs[Long]("lo_milli") < r.getAs[Long]("hi_milli"))
  }

  // ---- cohenKappa ----

  test("cohenKappa: classic 2x2 vector (po=0.7, pe=0.5, kappa=0.4)") {
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = Inference.cohenKappa(rows.toDF("r1", "r2"), col("r1"), col("r2"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((50L, 700000L, 500000L)))
    assert(math.abs(r.getDouble(3) - 0.4) < 1e-12)
  }

  test("cohenKappa: perfect agreement is 1; disjoint labels give kappa <= 0") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("r1", "r2")
    val p = Inference.cohenKappa(perfect, col("r1"), col("r2")).collect()(0)
    assert(p.getLong(1) === 1000000L && math.abs(p.getDouble(3) - 1.0) < 1e-12)
    // raters never use the same label: diag=0, S=0 -> kappa = 0/ n^2 = 0.0
    val disjoint = Seq(("x", "y"), ("x", "y")).toDF("r1", "r2")
    val q = Inference.cohenKappa(disjoint, col("r1"), col("r2")).collect()(0)
    assert(q.getLong(1) === 0L && q.getDouble(3) === 0.0)
  }

  // ---- kaplanMeier ----

  test("kaplanMeier: textbook curve with censoring, truncated micro-steps") {
    // durations 1,2,2,3c,4: deaths at 1 (r=5) -> 800000; at 2 (r=4,d=2)
    // -> 400000; at 4 (r=1) -> 0. Censored 3 never emits a row.
    val df = Seq((1L, false), (2L, false), (2L, false), (3L, true), (4L, false))
      .toDF("dur", "cens")
    val out = Inference.kaplanMeier(df, col("dur"), col("cens"))
      .orderBy("duration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 5L, 1L, 800000L), (2L, 4L, 2L, 400000L),
      (4L, 1L, 1L, 0L)))
  }

  test("kaplanMeier: all censored -> empty curve; censored-at-death stays at risk") {
    val allCens = Seq((1L, true), (2L, true)).toDF("dur", "cens")
    assert(Inference.kaplanMeier(allCens, col("dur"), col("cens")).count() === 0L)
    // death and censor at t=2: at_risk=2, one death -> 500000
    val mixed = Seq((2L, false), (2L, true)).toDF("dur", "cens")
    val r = Inference.kaplanMeier(mixed, col("dur"), col("cens")).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 1L, 500000L)))
  }

  // ---- passAtK ----

  test("passAtK: exact fraction vs hand binomials; n<k excluded; saturation at 1e6") {
    val df = Seq.fill(5)(("sat", true)).map { case (p, _) => (p, false) }
      .updated(0, ("sat", true)) ++ // n=5, c=1, k=5 -> numerator zero factor
      (1 to 6).map(i => ("frac", i == 1)) ++ // n=6, c=1
      (1 to 4).map(i => ("small", true)) // n=4 < k -> excluded
    val out = Inference.passAtK(df.toDF("p", "ok"), col("p"), col("ok"), k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(!out.contains("small"))
    assert(out("sat") === 1000000L) // n-c=4 < k: some factor is 0
    // frac: C(5,5)/C(6,5) = 1/6 fail -> 1e6 - 166666 = 833334
    assert(out("frac") === 833334L)
    val k2 = Inference.passAtK(df.toDF("p", "ok"), col("p"), col("ok"), k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // n=6,c=1: C(5,2)/C(6,2) = 10/15 -> 666666 fail -> 333334
    assert(k2("frac") === 333334L)
  }

  // ---- majorityAtK ----

  test("majorityAtK: exact hypergeometric tail vs hand binomials") {
    val mk = (p: String, n: Int, c: Int) =>
      (1 to n).map(i => (p, i <= c))
    val df = (mk("all", 5, 3) ++ mk("dropone", 6, 3) ++ mk("tiny", 3, 3))
      .toDF("p", "ok")
    val out = Inference.majorityAtK(df, col("p"), col("ok"), k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(!out.contains("tiny")) // n < k excluded
    assert(out("all") === 1000000L) // drawing all 5: 3-of-5 majority certain
    // n=6,c=3: majority iff the one left out fails -> 3 of C(6,5)=6
    assert(out("dropone") === 500000L)
    // even k: strict majority — a 1-1 tie is a miss
    val k2 = Inference.majorityAtK(mk("x", 4, 2).toDF("p", "ok"),
      col("p"), col("ok"), k = 2).collect()(0)
    assert(k2.getLong(3) === 166666L) // C(2,2)/C(4,2) = 1/6
  }

  // ---- fleissKappa ----

  test("fleissKappa: exact po/pe and signed IEEE kappa; unbalanced items excluded") {
    val df = Seq(
      (1L, "a"), (1L, "a"), // perfect agreement
      (2L, "a"), (2L, "b"), // split
      (3L, "a") // only one rating -> excluded from the panel
    ).toDF("item", "label")
    val r = Inference.fleissKappa(df, col("item"), col("label"), nRaters = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_items") === 2L)
    // po = (4+1+1 - 4)*1e6 div 4 = 500000; pe = (3^2+1^2)*1e6 div 16
    assert(r.getAs[Long]("po_ppm") === 500000L)
    assert(r.getAs[Long]("pe_ppm") === 625000L)
    assert(r.getAs[Double]("kappa") === -125000.0 / 375000.0)
  }

  // ---- stratifiedAte ----

  test("stratifiedAte: signed population weighting, off-support strata excluded") {
    val df = Seq(
      ("A", true, 10L), ("A", true, 20L), ("A", false, 10L), // diff +5e6
      ("B", true, 0L), ("B", false, 4L), ("B", false, 8L),   // diff -6e6
      ("C", true, 99L) // no controls -> off support, excluded entirely
    ).toDF("s", "t", "y")
    val out = Inference.stratifiedAte(df, Seq("s"), col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("A", "B"))
    val a = out("A")
    assert(a.getAs[Long]("mean_t_micro") === 15000000L)
    assert(a.getAs[Long]("mean_c_micro") === 10000000L)
    assert(a.getAs[Long]("diff_micro") === 5000000L)
    assert(a.getAs[Long]("weight_ppm") === 500000L)
    // wsum = 3*5e6 + 3*(-6e6) = -3e6 over N=6 -> -500000 (sign-magnitude)
    assert(a.getAs[Long]("ate_micro") === -500000L)
    assert(out("B").getAs[Long]("diff_micro") === -6000000L)
    assert(out("B").getAs[Long]("ate_micro") === -500000L)
  }

  // ---- nelsonAalen ----

  test("nelsonAalen: additive hazard on the KM textbook vector") {
    // same cohort as the KM test: deaths at 1 (r=5), 2 (r=4, d=2), 4 (r=1)
    val df = Seq((1L, false), (2L, false), (2L, false), (3L, true), (4L, false))
      .toDF("dur", "cens")
    val out = Inference.nelsonAalen(df, col("dur"), col("cens"))
      .orderBy("duration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 5L, 1L, 200000L, 200000L),
      (2L, 4L, 2L, 500000L, 700000L),
      (4L, 1L, 1L, 1000000L, 1700000L)))
    // all-censored cohort: no event times, empty estimate
    val allCens = Seq((1L, true)).toDF("dur", "cens")
    assert(Inference.nelsonAalen(allCens, col("dur"), col("cens")).count() === 0L)
  }

  // ---- rmst ----

  test("rmst: step-function area with horizon clipping and open tail") {
    val km = Seq((1L, 5L, 1L, 800000L), (2L, 4L, 2L, 400000L), (4L, 1L, 1L, 0L))
      .toDF("duration", "at_risk", "deaths", "surv_ppm")
    // full curve to h=10: 1e6*1 + 8e5*1 + 4e5*2 + 0*(10-4)
    assert(Inference.rmst(km, 10L).collect()(0).getAs[Long]("rmst_ppm_days")
      === 2600000L)
    // clipped at h=3: the last step contributes only (3-2) days
    assert(Inference.rmst(km, 3L).collect()(0).getAs[Long]("rmst_ppm_days")
      === 2200000L)
    // a curve ending ABOVE zero keeps paying until the horizon
    val open = Seq((2L, 4L, 2L, 500000L)).toDF("duration", "at_risk", "deaths", "surv_ppm")
    assert(Inference.rmst(open, 10L).collect()(0).getAs[Long]("rmst_ppm_days")
      === 1000000L * 2L + 500000L * 8L)
    // an EMPTY curve (nobody died) means full survival for the horizon —
    // one row, never a silently vanishing result
    val empty = Seq.empty[(Long, Long, Long, Long)]
      .toDF("duration", "at_risk", "deaths", "surv_ppm")
    val e = Inference.rmst(empty, 10L).collect()
    assert(e.length === 1 && e(0).getAs[Long]("rmst_ppm_days") === 10000000L)
  }

  // ---- positionBasedAttribution ----

  test("positionBasedAttribution: U-shaped credit with degenerate conventions") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: 4 touches -> 400, 100, 100, 400
      (1L, 1L, "view", ts("2024-01-04 01:00:00")),
      (2L, 1L, "click", ts("2024-01-04 02:00:00")),
      (3L, 1L, "click", ts("2024-01-04 03:00:00")),
      (4L, 1L, "signup", ts("2024-01-04 04:00:00")),
      (5L, 1L, "purchase", ts("2024-01-04 05:00:00")),
      // u2: single touch -> 1000
      (6L, 2L, "view", ts("2024-01-04 01:00:00")),
      (7L, 2L, "purchase", ts("2024-01-04 02:00:00")),
      // u3: two touches -> 600 to the first, 400 to the last
      (8L, 3L, "click", ts("2024-01-04 01:00:00")),
      (9L, 3L, "signup", ts("2024-01-04 02:00:00")),
      (10L, 3L, "purchase", ts("2024-01-04 03:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.operators.EventAnalytics.positionBasedAttribution(
      ev, "purchase", Seq("view", "click", "signup"), lookbackDays = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("view") === ((2L, 400L + 1000L)))
    assert(out("click") === ((3L, 100L + 100L + 600L)))
    assert(out("signup") === ((2L, 400L + 400L)))
    // every conversion hands out exactly (near) one unit: 1000+1000+1000
    assert(out.values.map(_._2).sum === 3000L)
  }

  // ---- fellegiSunter ----

  test("fellegiSunter: field weights sum; thresholds classify; below-lower dropped") {
    val probes = Seq((1, 10L, "ann", "s1"), (2, 11L, "zzz", "s2"))
      .toDF("blk", "pid", "pname", "pseg")
    val cands = Seq((1, 100L, "ann", "s1"), (1, 101L, "ann", "sX"),
      (1, 102L, "bob", "sX"), (2, 200L, "yyy", "s2"))
      .toDF("blk", "cid", "cname", "cseg")
    val out = FuzzyLink.fellegiSunter(probes, col("pid"), cands, col("cid"),
      "blk",
      Seq(FuzzyLink.FsField(col("pname") === col("cname"), 2000L, -500L),
        FuzzyLink.FsField(col("pseg") === col("cseg"), 800L, -600L)),
      lowerMilli = 0L, upperMilli = 2500L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out((10L, 100L)) === ((2800L, "match")))
    assert(out((10L, 101L)) === ((1400L, "possible")))
    assert(!out.contains((10L, 102L))) // -500-600 < lower
    assert(out((11L, 200L)) === ((300L, "possible"))) // -500+800
    assert(!out.contains((11L, 100L))) // cross-block never scored
  }

  // ---- dHash ----

  private def png(key: Int, corrupt: Boolean): Array[Byte] =
    Multimodal.encodePng(9, 8, (x, y) => {
      val base = (x * 17 + y * 29 + (x * y % 7) * 41 + key * 53) % 256
      val g = if (corrupt && x == 0 && y == 0) (base + 128) % 256 else base
      (g, g, g)
    })

  test("dhash: bands match a direct bit computation on the generator") {
    val row = Multimodal.dhash(7L, png(3, corrupt = false))
    def gray(x: Int, y: Int) = (x * 17 + y * 29 + (x * y % 7) * 41 + 3 * 53) % 256
    val want = new Array[Int](4)
    for (y <- 0 until 8; x <- 0 until 8 if gray(x + 1, y) > gray(x, y)) {
      val i = y * 8 + x; want(i / 16) |= 1 << (i % 16)
    }
    assert((row.b0, row.b1, row.b2, row.b3) ===
      ((want(0), want(1), want(2), want(3))))
  }

  test("dhashNearDupPairs: one-pixel corruption is found, distinct motifs are not") {
    implicit val s = spark
    val media = Seq(
      (1L, png(3, corrupt = false)), (2L, png(3, corrupt = true)),
      (3L, png(9, corrupt = false)))
      .toDF("doc_id", "media")
    val hashes = Multimodal.dhashImages(media).toDF()
    val pairs = Multimodal.dhashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length === 1)
    val (a, b, ham) = pairs(0)
    assert((a, b) === ((1L, 2L)) && ham <= 1)
  }

  // ---- upliftBySegment ----

  test("upliftBySegment: smoothed rates, raw-count z, degenerate pools give NULL z") {
    // segment 'lift': treated converts 8/10 vs control 2/10
    val lift = (1 to 10).map(i => ("lift", true, i <= 8)) ++
      (1 to 10).map(i => ("lift", false, i <= 2))
    // segment 'all': everyone converts -> zero pooled variance -> NULL z
    val all = (1 to 5).flatMap(_ => Seq(("all", true, true), ("all", false, true)))
    val out = Inference.upliftBySegment((lift ++ all).toDF("seg", "t", "c"),
      Seq("seg"), col("t"), col("c"), priorA = 10L, priorB = 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    val lf = out("lift")
    assert(lf.getAs[Long]("rate_t_ppm") === 18L * 1000000L / 30L)
    assert(lf.getAs[Long]("rate_c_ppm") === 12L * 1000000L / 30L)
    assert(lf.getAs[Long]("uplift_ppm") === 200000L)
    // z against the direct two-proportion computation
    val p = 10.0 / 20.0
    val wantZ = (0.8 - 0.2) / math.sqrt(p * (1 - p) * (1.0 / 10 + 1.0 / 10))
    assert(math.abs(lf.getAs[Double]("z") - wantZ) < 1e-12)
    assert(out("all").isNullAt(out("all").fieldIndex("z")))
  }

  // ---- sequentialZ ----

  test("sequentialZ: cumulative moments, boundary schedule, early stop detected") {
    // look 1: arms identical -> z ~ 0, no crossing even at 1.96 (let
    // alone 4.049). look 2 adds a large planted shift to arm B.
    val look1 = (1L to 40L).map(i => (1L, 100L + i % 5, i % 2 == 0))
    val look2 = (1L to 40L).map(i => (2L, if (i % 2 == 0) 500L + i % 5 else 100L + i % 5, i % 2 == 0))
    val df = (look1 ++ look2).toDF("look", "v", "g")
    val out = Inference.sequentialZ(df, col("look"), col("v"), col("g"),
      boundariesMicro = Seq(4049000L, 2863000L))
      .orderBy("look").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.length === 2)
    assert(out(0)._2 === 20L && out(0)._3 === 20L)
    assert(math.abs(out(0)._4) < 1.0 && !out(0)._6) // no early false positive
    assert(out(1)._2 === 40L && out(1)._3 === 40L)
    assert(out(1)._4 > 2.863 && out(1)._6) // the shift crosses look 2's bound
    // the z at look 2 matches a direct Welch computation over ALL rows
    val all = (look1 ++ look2)
    def mv(rows: Seq[Long]) = {
      val n = rows.size.toDouble; val m = rows.sum / n
      (n, m, rows.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma2, va) = mv(all.filter(!_._3).map(_._2))
    val (nb, mb2, vb) = mv(all.filter(_._3).map(_._2))
    val want = (mb2 - ma2) / math.sqrt(va / na + vb / nb)
    assert(math.abs(out(1)._4 - want) < 1e-9)
  }

  // ---- tCloseness ----

  test("tCloseness: matching distributions score 0; polarized groups score the hand EMD") {
    // both groups mirror the global (2/3 on 1, 1/3 on 2) -> t = 0
    val mirror = Seq(("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 1L), ("b", 2L))
    val m = graft.operators.GenericTests.tCloseness(
      mirror.toDF("g", "sv"), Seq("g"), col("sv"), tPpm = 100000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(m("a") === ((3L, 0L, false)) && m("b") === ((3L, 0L, false)))
    // polarized: global p = (1/2, 1/2); each group holds one value only
    // -> EMD = |1 - 1/2| / (2-1) = 1/2 -> 500000 ppm (the skew attack
    // l-diversity under-reports: 'u' even passes l=1 trivially)
    val polar = Seq(("u", 1L), ("u", 1L), ("v", 2L), ("v", 2L))
    val p2 = graft.operators.GenericTests.tCloseness(
      polar.toDF("g", "sv"), Seq("g"), col("sv"), tPpm = 100000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(p2("u") === ((2L, 500000L, true)))
    assert(p2("v") === ((2L, 500000L, true)))
  }

  test("tCloseness: a group missing a sensitive value still pays its global mass") {
    // group 'b' never shows sv=3 — the dense grid must carry 3's global
    // probability into the cumulative, not silently skip it
    val rows = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 1L))
    val out = graft.operators.GenericTests.tCloseness(
      rows.toDF("g", "sv"), Seq("g"), col("sv"), tPpm = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // global p = (3/4 on 1, 1/4 on 3), m=2. 'b' = (1, 0):
    // EMD = |1 - 3/4| = 1/4 -> 250000
    assert(out("b") === 250000L)
    // 'a' = (1/2, 1/2): EMD = |1/2 - 3/4| = 1/4 -> 250000
    assert(out("a") === 250000L)
  }

  // ---- classifier evaluation: AUC, reliability, gains ----

  test("aucPpm: perfect separation is 1e6, reversed is 0, random-ish is 500000") {
    val perfect = (Seq(1L, 2L, 3L).map((_, false)) ++ Seq(4L, 5L).map((_, true)))
      .toDF("s", "y")
    assert(Inference.aucPpm(perfect, col("s"), col("y"))
      .collect()(0).getAs[Long]("auc_ppm") === 1000000L)
    val reversed = (Seq(4L, 5L).map((_, false)) ++ Seq(1L, 2L).map((_, true)))
      .toDF("s", "y")
    assert(Inference.aucPpm(reversed, col("s"), col("y"))
      .collect()(0).getAs[Long]("auc_ppm") === 0L)
    // all scores tied: every pair counts half -> exactly 0.5
    val tied = (Seq(7L, 7L).map((_, false)) ++ Seq(7L, 7L, 7L).map((_, true)))
      .toDF("s", "y")
    assert(Inference.aucPpm(tied, col("s"), col("y"))
      .collect()(0).getAs[Long]("auc_ppm") === 500000L)
  }

  test("reliability: a perfectly calibrated bucket sits on the diagonal") {
    // 10 rows claiming 300 milli, exactly 3 positive -> empirical 300000
    // ppm, Brier = (7*(300)^2 + 3*(700)^2) / 10 = 210000 micro
    val rows = Seq.fill(7)((300L, false)) ++ Seq.fill(3)((300L, true))
    val r = Inference.reliability(rows.toDF("p", "y"), col("p"), col("y"))
      .collect()(0)
    assert(r.getAs[Long]("bucket") === 3L && r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("mean_pred_ppm") === 300000L)
    assert(r.getAs[Long]("empirical_ppm") === 300000L)
    assert(r.getAs[Long]("brier_bucket_micro") ===
      (7L * 300 * 300 + 3L * 700 * 700) / 10L)
  }

  test("gainsTable: positives concentrated at the top reach 1e6 by their decile") {
    // 100 rows, scores 100..1 descending rank; all 10 positives in the
    // top 10 scores -> decile 1 captures 100% of positives
    val rows = (1L to 100L).map(i => (101L - i, i <= 10))
    val out = Inference.gainsTable(rows.toDF("s", "y"), col("s"), col("y"))
      .orderBy("decile").collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("cum_gain_ppm")))
    assert(out.length === 10)
    assert(out.head === ((1L, 10L, 10L, 1000000L)))
    assert(out.forall(_._4 === 1000000L)) // cumulative stays at 100%
    assert(out.map(_._2).sum === 100L)
  }

  // ---- conformalInterval ----

  test("conformalInterval: conformal rank cut and exact coverage audit") {
    // group g: calibration values 0,10,20,...,90 (n=10, mean 45 -> center
    // 45 by trunc div); residuals {45,35,25,15,5,5,15,25,35,45} sorted ->
    // alpha=20%: target = min(10, ceil(11*0.8)) = 9 -> 9th smallest = 45
    val cal = (0L to 9L).map(i => ("g", i * 10L, true))
    val ev = Seq(("g", 0L, false), ("g", 46L, false), ("g", 95L, false))
    val df = (cal ++ ev).toDF("grp", "v", "cal")
    val r = Inference.conformalInterval(df, Seq("grp"), col("v"), col("cal"),
      alphaPct = 20).collect()(0)
    assert(r.getAs[Long]("center_milli") === 45L)
    assert(r.getAs[Long]("q_milli") === 45L)
    assert(r.getAs[Long]("n_cal") === 10L)
    // eval: |0-45|=45 in, |46-45|=1 in, |95-45|=50 out -> 2/3 covered
    assert(r.getAs[Long]("n_eval") === 3L && r.getAs[Long]("n_covered") === 2L)
    assert(r.getAs[Long]("coverage_ppm") === 2000000L / 3L)
  }

  // ---- cupedDiff ----

  test("cupedDiff: a pure covariate imbalance adjusts to exactly zero") {
    // y == x, but group B drew systematically larger x: the raw diff is
    // all covariate leak; theta == 1 exactly and CUPED removes it all
    val rows = (1L to 100L).map(i =>
      (i, if (i <= 50) i * 10L else i * 10L + 500L, i > 50))
      .map { case (id, x, g) => (id, x, x, g) }
    val df = rows.toDF("id", "x", "y", "grp")
    val r = Inference.cupedDiff(df, col("x"), col("y"), col("grp")).collect()(0)
    assert(r.getAs[Double]("theta") === 1.0)
    assert(r.getAs[Double]("raw_diff") > 0.0)
    assert(r.getAs[Double]("adj_diff") === 0.0)
    // with assignment INDEPENDENT of the covariate (alternating — the
    // randomized-experiment precondition CUPED assumes), a planted +7
    // effect survives adjustment almost exactly
    val eff = (1L to 100L).map(i =>
      (i, i * 10L, i * 10L + (if (i % 2 == 0) 7L else 0L), i % 2 == 0))
    val r2 = Inference.cupedDiff(eff.toDF("id", "x", "y", "grp"),
      col("x"), col("y"), col("grp")).collect()(0)
    assert(math.abs(r2.getAs[Double]("adj_diff") - 7.0) < 0.3)
    // and the adjusted estimate is closer to the truth than the raw one
    // (the raw diff also carries the even-vs-odd x gap)
    assert(math.abs(r2.getAs[Double]("adj_diff") - 7.0) <
      math.abs(r2.getAs[Double]("raw_diff") - 7.0))
  }

  // ---- smoothedRates ----

  test("smoothedRates: pseudo-counts pull small segments to the prior") {
    val rows = Seq(("tiny", true)) ++
      Seq.fill(900)(("big", true)) ++ Seq.fill(100)(("big", false))
    val out = Inference.smoothedRates(rows.toDF("g", "ok"), Seq("g"),
      col("ok"), priorA = 30L, priorB = 70L)
      .collect().map(r => r.getString(0) -> ((r.getAs[Long]("raw_ppm"),
        r.getAs[Long]("smoothed_ppm")))).toMap
    assert(out("tiny") === ((1000000L, 31L * 1000000L / 101L)))
    assert(out("big") === ((900000L, 930L * 1000000L / 1100L)))
    // the 1/1 segment no longer outranks the 900/1000 one
    assert(out("tiny")._2 < out("big")._2)
  }

  // ---- crossCorrDaily ----

  test("crossCorrDaily: a planted 2-day lead shows up at lag +2, not 0") {
    // y copies x shifted 2 days later -> corr(x_t, y_{t+2}) = 1
    val xs = Seq(5L, 9L, 2L, 7L, 4L, 8L, 1L, 6L, 3L, 9L)
    val rows = xs.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, v, false)) ++
        (if (i >= 2) Seq((i.toLong, xs(i - 2), true)) else Nil)
    }
    val df = rows.toDF("day", "v", "isy")
    val out = graft.pipeline.Stats.crossCorrDaily(df, col("day"), col("v"),
      col("isy"), maxLag = 3)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(r.getDouble(2)))).toMap
    // at lag 2 the overlap includes boundary zeros (y before day 2 is 0),
    // so compare against a direct computation over the dense series
    val n = 10
    val x = xs.toArray
    val y = (0 until n).map(i => if (i >= 2) xs(i - 2) else 0L).toArray
    def pearson(pairs: Seq[(Long, Long)]): Double = {
      val m = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble; val sy = pairs.map(_._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      (m * sxy - sx * sy) / (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy))
    }
    val want2 = pearson((0 until n - 2).map(i => (x(i), y(i + 2))))
    assert(math.abs(out(2L).get - want2) < 1e-9)
    assert(out(2L).get > 0.99) // the planted lead dominates
    assert(out(2L).get > out(0L).get && out(2L).get > out(-2L).getOrElse(0.0))
    // n_pairs bookkeeping: lag 3 has n-3 pairs
    val np = graft.pipeline.Stats.crossCorrDaily(df, col("day"), col("v"),
      col("isy"), maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(np(3L) === 7L && np(-3L) === 7L && np(0L) === 10L)
  }

  test("crossCorrDaily: maxDays span guard raises on a non-daily-grain mis-call") {
    // the lag window is single-partition over the dense spine — a huge
    // day span (e.g. micros passed as days) must raise, not materialize
    val df = Seq((0L, 5L, false), (1000L, 7L, true)).toDF("day", "v", "isy")
    val e = intercept[Exception] {
      graft.pipeline.Stats.crossCorrDaily(df, col("day"), col("v"),
        col("isy"), maxLag = 2, maxDays = 100L).collect()
    }
    assert(e.getMessage.contains("crossCorrDaily day span exceeded 100"))
    // within the bound the dense spine builds normally
    val ok = graft.pipeline.Stats.crossCorrDaily(df, col("day"), col("v"),
      col("isy"), maxLag = 2, maxDays = 2000L).collect()
    assert(ok.length === 5)
    // EMPTY input must yield an empty frame, not trip the span guard on
    // the NULL min/max row (r11 advisor)
    val empty = Seq.empty[(Long, Long, Boolean)].toDF("day", "v", "isy")
    assert(graft.pipeline.Stats.crossCorrDaily(empty, col("day"), col("v"),
      col("isy"), maxLag = 2, maxDays = 100L).collect().isEmpty)
  }

  // ---- timeDecayAttribution ----

  test("timeDecayAttribution: halving schedule and exact credit split") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // conversion at noon day3; touches age 0 (w=1000), 1 (500), 2 (250)
    val ev = Seq(
      (1L, 7L, "purchase", ts("2024-01-04 12:00:00")),
      (2L, 7L, "view", ts("2024-01-04 10:00:00")),
      (3L, 7L, "click", ts("2024-01-03 10:00:00")),
      (4L, 7L, "view", ts("2024-01-02 10:00:00")),
      (5L, 8L, "view", ts("2024-01-04 10:00:00"))) // other user: no conversion
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.operators.EventAnalytics.timeDecayAttribution(
      ev, "purchase", Seq("view", "click"), lookbackDays = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // total w = 1750; view = (1000+250)*1e6 div 1750, click = 500*1e6 div 1750
    assert(out("view") === ((2L, 1250L * 1000000L / 1750L)))
    assert(out("click") === ((1L, 500L * 1000000L / 1750L)))
  }

  // ---- holtDaily ----

  test("holtDaily: fold matches a sequential reference; missing days densify to 0") {
    val rows = Seq((0L, 10L), (1L, 12L), (3L, 20L), (4L, 6L)) // day 2 missing
      .map { case (d, y) => ("g", d, y) }
    val df = rows.toDF("grp", "day", "y")
    val got = graft.pipeline.Stats.holtDaily(df, Seq("grp"), col("day"),
      col("y"), alphaNum = 3, alphaDen = 10, betaNum = 1, betaDen = 10)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // sequential reference with Spark's truncating div
    def tdiv(a: Long, b: Long): Long = a / b // JVM / truncates like SQL div
    val ys = Seq(10L, 12L, 0L, 20L, 6L)
    var l = ys.head * 1000000L; var b = 0L
    val want = ys.zipWithIndex.map { case (y, i) =>
      if (i > 0) {
        val l2 = tdiv(3 * y * 1000000L + 7 * (l + b), 10)
        b = tdiv(1 * (l2 - l) + 9 * b, 10)
        l = l2
      }
      (i.toLong, l, b, l + b)
    }
    assert(got.toSeq === want)
    assert(got.exists(_._1 === 2L), "missing day must appear on the spine")
  }

  // ---- holtWintersDaily ----

  test("holtWintersDaily: fold matches a sequential reference incl. the 7-day lookback") {
    // 16 days of a noisy weekly pattern so the seasonal state engages
    // past t=7 (the element_at(acc, -7) path)
    val ys = (0 until 16).map(t => ((t % 7) * 10 + t + 3).toLong)
    val df = ys.zipWithIndex.map { case (y, d) => ("g", d.toLong, y) }
      .toDF("grp", "day", "y")
    val got = graft.pipeline.Stats.holtWintersDaily(df, Seq("grp"), col("day"),
      col("y"), 3, 10, 1, 10, 2, 10)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def tdiv(a: Long, b: Long): Long = a / b
    val S = 1000000L
    var l = ys.head * S; var b = 0L
    val ss = scala.collection.mutable.ArrayBuffer(0L)
    val want = ys.zipWithIndex.map { case (y, t) =>
      if (t > 0) {
        val sp = if (t >= 7) ss(t - 7) else 0L
        val l2 = tdiv(3 * y * S - 3 * sp + 7 * (l + b), 10)
        b = tdiv(1 * (l2 - l) + 9 * b, 10)
        val s2 = tdiv(2 * (y * S - l2) + 8 * sp, 10)
        l = l2
        ss += s2
      }
      (t.toLong, l, b, ss(t))
    }
    assert(got.toSeq === want)
    // the seasonal state is genuinely nonzero once the pattern repeats
    assert(got.drop(8).exists(_._4 !== 0L))
  }

  // ---- changepointDaily ----

  test("changepointDaily: planted mean shift localized with segment means") {
    val rows = Seq(("t", 0L, 10L), ("t", 1L, 10L), ("t", 2L, 10L),
      ("t", 3L, 100L), ("t", 4L, 100L))
    val out = graft.pipeline.Stats.changepointDaily(
      rows.toDF("grp", "day", "y"), Seq("grp"), col("day"), col("y"))
      .collect()(0)
    assert(out.getAs[Long]("split_day") === 2L) // last day of the left segment
    assert(out.getAs[Long]("n_left") === 3L && out.getAs[Long]("n_right") === 2L)
    assert(out.getAs[Long]("mean_left_milli") === 10000L)
    assert(out.getAs[Long]("mean_right_milli") === 100000L)
    // gain = 900/3 + 40000/2 - 41209... exact: sl=30,nl=3, sr=200,nr=2, s=230,n=5
    assert(out.getAs[Long]("gain") === (30L * 30 / 3 + 200L * 200 / 2 - 230L * 230 / 5))
  }

  test("changepointDaily: constant series picks the earliest split with gain ~0") {
    val rows = (0L to 9L).map(d => ("c", d, 5L))
    val out = graft.pipeline.Stats.changepointDaily(
      rows.toDF("grp", "day", "y"), Seq("grp"), col("day"), col("y"))
      .collect()(0)
    assert(out.getAs[Long]("split_day") === 0L)
    assert(math.abs(out.getAs[Long]("gain")) <= 2L) // truncation slack only
  }

  // ---- lDiversity ----

  test("lDiversity: homogeneous large group is at risk; NULL is a sensitive value") {
    val rows = Seq.fill(100)(("big", "flu")) ++ // large but homogeneous
      Seq(("ok", "flu"), ("ok", "cold"), ("ok", "cough")) ++
      Seq(("nn", "flu"), ("nn", null))
    val out = graft.operators.GenericTests.lDiversity(
      rows.toDF("qi", "diag"), Seq("qi"), col("diag"), l = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out("big") === ((100L, 1L, true))) // k-anonymity would pass this
    assert(out("ok") === ((3L, 3L, false)))
    assert(out("nn") === ((2L, 2L, true))) // null counted as its own value
  }

  // ---- ndcgAtK ----

  test("ndcgAtK: perfect ranking scores 1e6 ppm; rank position matters") {
    import graft.pipeline.Similarity
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val perfect = Similarity.ndcgAtK(exact, exact, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(perfect === Map(1L -> 1000000L, 2L -> 1000000L))
    // only the rank-2 slot hits for q1 (w2=630930, idcg=1630930); q2 empty
    val partial = Seq((1L, 99L, 1L), (1L, 10L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.ndcgAtK(exact, partial, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((630930L, 630930L * 1000000L / 1630930L)))
    assert(got(2L) === ((0L, 0L)))
    // same single hit at rank 1 scores strictly higher than at rank 2
    val atOne = Seq((1L, 10L, 1L), (1L, 99L, 2L)).toDF("query_id", "neighbor_id", "rank")
    assert(Similarity.ndcgAtK(exact, atOne, k = 2).filter(col("query_id") === 1L)
      .collect()(0).getLong(2) > got(1L)._2)
  }

  // ---- prfRetrieve ----

  test("prfRetrieve: expansion pulls in docs the seed query cannot see") {
    import graft.pipeline.{TextAnalysis => T}
    // docs 1-2 match the seed and carry the rare term 'qq'; doc 3 has ONLY
    // 'qq'; doc 4 is noise. 'zz' is everywhere -> stopword-filtered.
    val docs = Seq(
      (1L, "seed qq zz alpha"), (2L, "seed qq zz beta"),
      (3L, "qq zz gamma"), (4L, "zz delta"))
      .toDF("doc_id", "text")
    val seedOnly = T.coordMatchTopK(docs, Seq("seed"), topK = 10)
      .select("doc").as[Long].collect().toSet
    assert(seedOnly === Set(1L, 2L))
    val out = T.prfRetrieve(docs, Seq("seed"), fbDocs = 2, fbTerms = 1,
      topK = 10, maxDfMille = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // expansion term is 'qq' (df 3/4 > 600?? no: df*1000=3000 > 4*600=2400
    // -> filtered!). alpha/beta tie at sum_tf 1, df 1 -> score 1e6; 'alpha'
    // wins the term tie-break. So doc 1 gains a second matched term.
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(1L)._2 === 2L && byDoc(1L)._4 === 1L)
    assert(byDoc(2L)._2 === 1L)
    assert(!byDoc.contains(4L))
    // with a permissive df cap and room for 3 terms, the shared rare term
    // 'qq' (score 2e6/3 behind the two df-1 singletons) makes the cut and
    // doc 3 — invisible to the seed query — enters the final ranking
    val out2 = T.prfRetrieve(docs, Seq("seed"), fbDocs = 2, fbTerms = 3,
      topK = 10, maxDfMille = 800)
      .select("doc").as[Long].collect().toSet
    assert(out2.contains(3L))
  }

  test("textRankKeywords: the co-occurrence hub outranks its satellites") {
    import graft.pipeline.{TextAnalysis => T}
    // 'hub' co-occurs with three distinct satellites; satellites only see
    // the hub -> hub accumulates mass from three sources
    val docs = (1 to 5).flatMap(_ => Seq("hub aa", "hub bb", "hub cc"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = T.textRankKeywords(docs, window = 2, minCount = 2,
      iterations = 2, topK = 4)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.head === (("hub", 1L)))
    assert(out.map(_._1).toSet === Set("hub", "aa", "bb", "cc"))
    // deterministic across runs
    val again = T.textRankKeywords(docs, window = 2, minCount = 2,
      iterations = 2, topK = 4).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(again.toSeq === out.map(_._1).zip(
      T.textRankKeywords(docs, 2, 2, 2, 4).collect().map(_.getLong(1))).toSeq)
  }

  test("plan: coordMatchTopK compiles to TakeOrdered, never a global sort") {
    import graft.pipeline.{TextAnalysis => T}
    val docs = (1L to 200L).map(i => (i, s"w$i seed x")).toDF("doc_id", "text")
    val plan = T.coordMatchTopK(docs, Seq("seed"), topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
  }

  // ---- pseudonymize ----

  test("pseudonymize: consistent under a salt, NULL passes through, salt changes token") {
    import graft.pipeline.{TextAnalysis => T}
    val df = Seq(Some(7L), Some(7L), Some(8L), None).toDF("uid")
    val toks = df.select(T.pseudonymize(col("uid"), "s1", "u").as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(toks(0) === toks(1)) // join-safe consistency
    assert(toks(0) !== toks(2))
    assert(toks(3).isEmpty) // NULL is absence, not an identity
    assert(toks(0).get.matches("u_[0-9a-f]{16}"))
    val other = df.select(T.pseudonymize(col("uid"), "s2", "u").as("t"))
      .collect()(0).getString(0)
    assert(other !== toks(0).get) // the salt is the secrecy boundary
  }

  // ---- mmrRerank ----

  test("mmrRerank: a duplicate of the first pick is demoted below a diverse result") {
    import graft.pipeline.Similarity
    // a and b are PARALLEL (sim exactly 1.0 after quantization: b = 2a);
    // c mirrors a across the query axis — same relevance, diverse
    val corpus = Seq(
      (1L, Array(0.9, 0.436)), (2L, Array(1.8, 0.872)), (3L, Array(0.9, -0.436)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus, q, kCand = 3, kOut = 3,
      lambdaMilli = 700)
      .orderBy("mmr_rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // relevance ties (all three have equal cosine) break on id: a first;
    // then MMR demotes the duplicate b below the diverse c
    assert(out.toSeq === Seq((1L, 1L), (3L, 2L), (2L, 3L)))
    // pure-relevance ranking (lambda=1000) keeps id order instead
    val rel = Similarity.mmrRerank(corpus, q, kCand = 3, kOut = 3,
      lambdaMilli = 1000)
      .orderBy("mmr_rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rel.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  // ---- diffInDiff / minDetectableEffect / seasonality ----

  test("diffInDiff: hand 2x2 — the control trend nets out") {
    // control: 100 -> 120 (trend +20); treated: 200 -> 250 -> DiD = +30
    val rows = Seq((100L, false, false), (120L, false, true),
      (200L, true, false), (250L, true, true))
    val r = Inference.diffInDiff(rows.toDF("v", "t", "p"),
      col("v"), col("t"), col("p")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((100000L, 120000L, 200000L, 250000L, 30000L)))
  }

  test("minDetectableEffect: textbook variance and the z-scaled interval") {
    // values 10,20,30: var = 100, n = 3
    val df = Seq(("g", 10L), ("g", 20L), ("g", 30L)).toDF("grp", "v")
    val r = Inference.minDetectableEffect(df, Seq("grp"), col("v")).collect()(0)
    assert(r.getAs[Double]("variance") === 100.0)
    val zSum = (Inference.Z975Micro + Inference.Z80Micro).toDouble / 1e6
    assert(math.abs(r.getAs[Double]("mde") -
      zSum * math.sqrt(2.0 * 100.0 / 3.0)) < 1e-12)
    // a single-row group has no variance and is excluded
    val single = Seq(("s", 5L)).toDF("grp", "v")
    assert(Inference.minDetectableEffect(single, Seq("grp"), col("v")).count() === 0L)
  }

  test("weeklySeasonalityStrength: pure weekly pattern ~1e6, constant -> NULL") {
    val pure = (0L until 28L).map(day => ("g", day, (day % 7) * 100L + 100L))
    val r1 = graft.pipeline.Stats.weeklySeasonalityStrength(
      pure.toDF("grp", "day", "v"), Seq("grp"), col("day"), col("v"))
      .collect()(0)
    assert(r1.getAs[Long]("strength_ppm") >= 999000L) // truncation slack only
    val const = (0L until 28L).map(day => ("c", day, 500L))
    val r2 = graft.pipeline.Stats.weeklySeasonalityStrength(
      const.toDF("grp", "day", "v"), Seq("grp"), col("day"), col("v"))
      .collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("strength_ppm")))
    // a pattern ignoring the week scores lower than the pure-weekly one
    val drift = (0L until 28L).map(day => ("d", day, day * 100L))
    val r3 = graft.pipeline.Stats.weeklySeasonalityStrength(
      drift.toDF("grp", "day", "v"), Seq("grp"), col("day"), col("v"))
      .collect()(0)
    assert(r3.getAs[Long]("strength_ppm") < r1.getAs[Long]("strength_ppm"))
  }

  // ---- audio fingerprint ----

  test("audioFingerprint: bands match direct frame energies; shared-band dedup") {
    implicit val sp = spark
    import sp.implicits._
    def clip(key: Int, corrupt: Boolean): Array[Byte] = {
      val samples = Array.tabulate(400) { t =>
        val base = (t * (key * 7 + 13)) % 2001 - 1000
        (if (corrupt && t == 0) base + 137 else base).toShort
      }
      graft.pipeline.Multimodal.encodeWav(8000, 1, samples)
    }
    val fp = graft.pipeline.Multimodal.audioFingerprint(1L, clip(5, corrupt = false), 100)
    val want = (0 until 4).map { f =>
      ((f * 100 until (f + 1) * 100).map(t =>
        math.abs((t * (5 * 7 + 13)) % 2001 - 1000).toLong).sum % 65536L).toInt
    }
    assert((fp.b0, fp.b1, fp.b2, fp.b3) === ((want(0), want(1), want(2), want(3))))
    // corrupting ONE sample changes only frame 0's band -> 3 shared bands
    val media = Seq((1L, clip(5, corrupt = false)), (2L, clip(5, corrupt = true)),
      (3L, clip(9, corrupt = false)))
      .toDF("doc_id", "media")
    val pairs = graft.pipeline.Multimodal.bandedNearDupPairs(
      graft.pipeline.Multimodal.audioFingerprints(media, 100).toDF(),
      minSharedBands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 3)))
    // a 2-of-4 pair fails minSharedBands = 3
    val far = Seq((1L, 10, 20, 30, 40), (2L, 10, 20, 99, 98))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    assert(graft.pipeline.Multimodal.bandedNearDupPairs(far, 3).count() === 0L)
    assert(graft.pipeline.Multimodal.bandedNearDupPairs(far, 2).count() === 1L)
  }

  // ---- video frame-hash near-dup ----

  test("videoNearDupPairs: one corrupted frame still matches on the other two") {
    implicit val sp = spark
    import sp.implicits._
    def gif(key: Int, corruptFrame: Option[Int]): Array[Byte] =
      graft.pipeline.Multimodal.encodeGif(9, 8, 3, (f, x, y) => {
        val base = (x * 17 + y * 29 + (x * y % 7) * 41 + key * 53 + f * x * 19) % 256
        val g = if (corruptFrame.contains(f) && x == 0 && y == 0)
          (base + 128) % 256 else base
        (g, g, g)
      })
    // key = 1 keeps gray(0,0) < 128 on every frame, so the +128 pixel
    // corruption provably FLIPS gradient bit 0 (no mod-256 wraparound)
    val vids = Seq(
      (1L, gif(1, None)), (2L, gif(1, Some(1))), // share frames 0 and 2
      (3L, gif(1, Some(0))), // shares frames 1, 2 with v1; 2 with v2
      (4L, gif(7, None))) // distinct motif
      .toDF("doc_id", "media")
    val hashes = graft.pipeline.Multimodal.frameDhashes(vids).toDF()
    assert(hashes.count() === 12L) // 4 videos x 3 REAL decoded frames
    val pairs = graft.pipeline.Multimodal.videoNearDupPairs(hashes, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 2L) // frames 0, 2 intact
    assert(pairs((1L, 3L)) === 2L) // frames 1, 2 intact
    assert(!pairs.contains((2L, 3L))) // only frame 2 survives both corruptions
    assert(!pairs.keys.exists(p => p._1 === 4L || p._2 === 4L))
    // duplicate frames inside one video count once (SET semantics)
    val still = Seq((5L, graft.pipeline.Multimodal.encodeGif(9, 8, 3,
      (_, x, y) => { val g = (x * 13 + y * 7) % 256; (g, g, g) })),
      (6L, graft.pipeline.Multimodal.encodeGif(9, 8, 1,
        (_, x, y) => { val g = (x * 13 + y * 7) % 256; (g, g, g) })))
      .toDF("doc_id", "media")
    val sp2 = graft.pipeline.Multimodal.videoNearDupPairs(
      graft.pipeline.Multimodal.frameDhashes(still).toDF(), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sp2.toSeq === Seq((5L, 6L, 1L)))
  }

  // ---- markovRemovalEffect ----

  test("markovRemovalEffect: hand chain — the only converting channel takes all credit") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: view -> purchase; u2: click -> (end, null)
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "purchase", ts("2024-01-01 11:00:00")),
      (3L, 2L, "click", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.operators.EventAnalytics.markovRemovalEffect(
      ev, "purchase", Seq("view", "click"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // full chain: start splits 1/2 to view (then conv) and 1/2 to click
    // (then null) -> p_conv = 0.5
    assert(out("view")._1 === 0.5)
    // removing view kills ALL conversion; removing click changes nothing
    assert(out("view")._2 === 0.0 && out("view")._3 === 0.5)
    assert(out("click")._2 === 0.5 && out("click")._3 === 0.0)
    assert(out("view")._4 === 1.0 && out("click")._4 === 0.0)
  }

  test("markovRemovalEffect: events after the first conversion leave the journey") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 purchases then keeps clicking — the post-conversion clicks must
    // not create click transitions (otherwise click would earn credit)
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "purchase", ts("2024-01-01 11:00:00")),
      (3L, 1L, "click", ts("2024-01-01 12:00:00")),
      (4L, 1L, "click", ts("2024-01-01 13:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.operators.EventAnalytics.markovRemovalEffect(
      ev, "purchase", Seq("view", "click"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("view") === 1.0 && out("click") === 0.0)
  }

  // ---- plan-shape pins (the 100 TB contracts) ----

  test("plan: ECDF window runs over the distinct-value AGGREGATE, never raw rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project, Filter, LogicalPlan, Window => LWindow}
    val df = (1L to 5000L).map(i => (i % 37, i % 2 == 0)).toDF("v", "b")
    def windowChildrenAreAggregates(plan: LogicalPlan): Boolean = {
      def stripToCore(p: LogicalPlan): LogicalPlan = p match {
        case Project(_, c) => stripToCore(c)
        case Filter(_, c) => stripToCore(c)
        case w: LWindow => stripToCore(w.child) // stacked windows share the rollup
        case other => other
      }
      plan.collect { case w: LWindow => stripToCore(w.child) }
        .forall(_.isInstanceOf[Aggregate])
    }
    val ks = Inference.ksTest(df, col("v"), col("b"))
    assert(windowChildrenAreAggregates(ks.queryExecution.optimizedPlan),
      s"KS window not over the rollup:\n${ks.queryExecution.optimizedPlan}")
    val mw = Inference.mannWhitney(df, col("v"), col("b"))
    assert(windowChildrenAreAggregates(mw.queryExecution.optimizedPlan))
    // and the one-row totals ride a broadcast, not a shuffle
    assert(ks.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
  }

  test("plan: gini window is PARTITIONED by the group (parallel across groups)") {
    val df = (1L to 2000L).map(i => (s"g${i % 7}", i % 101)).toDF("grp", "v")
    val plan = Inference.gini(df, Seq("grp"), col("v"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(grp"),
      s"gini window lost its partition spec:\n$plan")
  }

  test("plan: fellegiSunter broadcasts the probe side; dhash pairs never go cartesian") {
    val probes = (1L to 20L).map(i => (i % 5, i, s"n$i")).toDF("blk", "pid", "pn")
    val cands = (1L to 500L).map(i => (i % 5, i, s"n${i % 30}")).toDF("blk", "cid", "cn")
    val fs = FuzzyLink.fellegiSunter(probes, col("pid"), cands, col("cid"),
      "blk", Seq(FuzzyLink.FsField(col("pn") === col("cn"), 1000L, -500L)),
      0L, 800L)
    assert(fs.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val hashes = (1L to 300L).map(i =>
      (i, (i % 50).toInt, (i % 60).toInt, (i % 70).toInt, (i % 80).toInt))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    val pp = Multimodal.dhashNearDupPairs(hashes, 3)
      .queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"),
      s"banded join degenerated to a cross product:\n$pp")
  }

  test("dhashNearDupPairs: pigeonhole recall bound — <=3 differing bits always found") {
    implicit val s = spark
    // hand-build hashes: base vs 3 bits flipped in 3 DIFFERENT bands ->
    // band 3 still identical -> pair must surface with hamming 3
    val rows = Seq((1L, 10, 20, 30, 40), (2L, 11, 21, 31, 40),
      // 4 bits across all 4 bands at radius 4 -> no shared band, invisible
      // to the banded join even though hamming 4 would pass a wider filter
      (3L, 100, 200, 300, 400), (4L, 101, 201, 301, 401))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    val got = Multimodal.dhashNearDupPairs(rows, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  // ---- classifierEval ----

  test("classifierEval: hand confusion, macro zero-division, micro accuracy") {
    import graft.pipeline.Inference
    // preds vs truth: (1,1)x3, (1,2)x1, (2,2)x1, (3,2)x1 — class 3 never
    // true, class 2 under-predicted
    val df = Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, 2L), (2L, 2L),
      (3L, 2L)).toDF("p", "t")
    val out = Inference.classifierEval(df, col("p"), col("t"))
      .collect().map(r => r.getString(0) -> r).toMap
    val c1 = out("1")
    assert((c1.getLong(1), c1.getLong(2), c1.getLong(3)) === ((3L, 1L, 0L)))
    assert((c1.getLong(4), c1.getLong(5), c1.getLong(6)) ===
      ((750000L, 1000000L, 857142L)))
    val c3 = out("3") // predicted once, never true: recall undefined -> null
    assert((c3.getLong(1), c3.getLong(2), c3.getLong(3)) === ((0L, 1L, 0L)))
    assert(c3.isNullAt(5) && c3.getLong(4) === 0L && c3.getLong(6) === 0L)
    val micro = out("__micro")
    assert(micro.getLong(6) === 666666L) // 4 right of 6 = micro F1 = acc
    val macroR = out("__macro")
    // macro recall = (1e6 + 333333 + 0)/3 (class-3 null counts 0)
    assert(macroR.getLong(5) === 444444L)
  }

  // ---- joinCoverage ----

  test("joinCoverage: matched/null/orphan accounting per edge") {
    import graft.pipeline.Profile
    val fact = Seq[(java.lang.Long, String)]((1L, "x"), (1L, "y"), (2L, "z"),
      (9L, "o"), (null, "n")).toDF("k", "payload")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val r = Profile.joinCoverage(fact,
      Seq(("f_d", col("k"), dim, col("dk")))).collect()(0)
    // 5 rows: 3 matched (two k=1, one k=2), 1 orphan (9), 1 null
    assert(r.toSeq === Seq("f_d", 5L, 1L, 3L, 2L, 1L, 600000L))
  }

  // ---- isotonicCalibrate ----

  test("isotonicCalibrate: minimax pools the zig-zag, monotone output") {
    import graft.pipeline.Inference
    def b(p: Long, pos: Int, n: Int) = (1 to n).map(i => (p, i <= pos))
    // raw 0.8 / 0.2 / 0.5 violates monotonicity -> all pool to 0.5
    val df = (b(150L, 8, 10) ++ b(250L, 2, 10) ++ b(350L, 5, 10))
      .toDF("p", "y")
    val out = Inference.isotonicCalibrate(df, col("p"), col("y"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out === Map(1L -> ((800000L, 500000L)),
      2L -> ((200000L, 500000L)), 3L -> ((500000L, 500000L))))
    // already-monotone input passes through untouched
    val mono = (b(150L, 2, 10) ++ b(250L, 5, 10)).toDF("p", "y")
    val m = Inference.isotonicCalibrate(mono, col("p"), col("y"))
      .collect().map(r => r.getLong(3) -> r.getLong(4))
    assert(m.forall { case (raw, cal) => raw === cal })
  }

  // ---- brierDecomposition ----

  test("brierDecomposition: Murphy identity closes on a calibrated vector") {
    import graft.pipeline.Inference
    def b(p: Long, pos: Int, n: Int) = (1 to n).map(i => (p, i <= pos))
    // bucket conf == acc (200 -> 1/5, 800 -> 4/5): reliability exactly 0
    val df = (b(200L, 1, 5) ++ b(800L, 4, 5)).toDF("p", "y")
    val r = Inference.brierDecomposition(df, col("p"), col("y")).collect()(0)
    assert(r.toSeq === Seq(10L, 160000L, 0L, 90000L, 250000L, 0L))
  }

  // ---- kitagawaDecomposition ----

  test("kitagawaDecomposition: hand rate/mix effects close the delta exactly") {
    import graft.pipeline.Inference
    def rows(s: String, p1: Boolean, c: Int, n: Int) =
      (1 to n).map(i => (s, p1, i <= c))
    // X: .25 -> .5 on shrinking traffic; Y: flat .5 on growing traffic
    val df = (rows("X", false, 1, 4) ++ rows("X", true, 1, 2) ++
      rows("Y", false, 2, 4) ++ rows("Y", true, 3, 6)).toDF("s", "p", "y")
    val out = Inference.kitagawaDecomposition(df, col("p"), Seq("s"),
        col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert((out("X").getLong(5), out("X").getLong(6)) === ((62500L, -62500L)))
    assert((out("Y").getLong(5), out("Y").getLong(6)) === ((0L, 125000L)))
    val t = out("__total")
    assert((t.getLong(5), t.getLong(6)) === ((62500L, 62500L)))
    assert(t.getLong(7) === 125000L) // delta
    assert(t.getLong(8) === 0L)      // exact closure on this vector
  }

  // ---- logRankTest ----

  test("logRankTest: hand O/E/V accumulation, censored steps skipped") {
    import graft.pipeline.Inference
    val df = Seq(
      (1L, false, true), (2L, false, true), // A: deaths at 1 and 2
      (1L, false, false), (3L, true, false) // B: death at 1, censored at 3
    ).toDF("dur", "cens", "a")
    val r = Inference.logRankTest(df, col("a"), col("dur"), col("cens"))
      .collect()(0)
    // t=1: e=2*2e6/4=1e6, v=(2*2*2*2*1e6)//48=333333
    // t=2: e=1*1e6/2=5e5, v=(1*1*1*1*1e6)//4=250000; t=3 has no deaths
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 2L) // observed_a
    assert(r.getLong(3) === 1500000L)
    assert(r.getLong(4) === 583333L)
    val num = (2L * 1000000L - 1500000L).toDouble
    assert(r.getDouble(5) === (num * num) / (583333L.toDouble * 1.0e6))
  }

  // ---- mutualBestMatch ----

  test("mutualBestMatch: only reciprocal bests survive; ties break on partner id") {
    // L1's best is R1 (0.9); R1's best is L1 -> kept.
    // L2's best is R1 (0.8) but R1 prefers L1 -> dropped; L2-R2 (0.7) is
    // R2's best but not L2's best -> dropped too (strict mutual-best).
    val pairs = Seq((1L, 10L, 0.9), (2L, 10L, 0.8), (2L, 20L, 0.7),
      (3L, 30L, 0.5), (4L, 30L, 0.5) // tie at R30: smaller left id wins
    ).toDF("a", "b", "s")
    val out = FuzzyLink.mutualBestMatch(pairs, col("a"), col("b"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (3L, 30L)))
  }

  // ---- ece ----

  test("ece: hand bucket gaps, single division; perfect calibration 0") {
    import graft.pipeline.Inference
    // bucket 5 (p=550 milli): 4 rows, 2 pos -> gap |2e6 - 4*550*1000| =
    // 200000; bucket 9 (p=900): 2 rows, 2 pos -> gap |2e6 - 1.8e6| =
    // 200000; ECE = 400000/6 = 66666; MCE = max(200000/4, 200000/2)
    val df = (Seq.fill(2)((550L, true)) ++ Seq.fill(2)((550L, false)) ++
      Seq.fill(2)((900L, true))).toDF("p", "y")
    val r = Inference.ece(df, col("p"), col("y")).collect()(0)
    assert(r.toSeq === Seq(6L, 2L, 66666L, 100000L))
    // exactly calibrated buckets -> 0/0
    val cal = (Seq.fill(1)((500L, true)) ++ Seq.fill(1)((500L, false)))
      .toDF("p", "y")
    val c = Inference.ece(cal, col("p"), col("y")).collect()(0)
    assert((c.getLong(2), c.getLong(3)) === ((0L, 0L)))
  }

  // ---- momSmoothedRates ----

  test("momSmoothedRates: hand MoM prior, shrinkage direction, flat pass-through") {
    import graft.pipeline.Inference
    def grp(g: String, c: Int, n: Int) =
      (1 to n).map(i => (g, i <= c))
    // rates 1/2, 1/4, 3/4 -> m = 500000; v = 1.25e11 div 3; K = 6 - 1 = 5
    val df = (grp("g1", 2, 4) ++ grp("g2", 1, 4) ++ grp("g3", 3, 4))
      .toDF("g", "ok")
    val out = Inference.momSmoothedRates(df, Seq("g"), col("ok"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out("g1") === ((500000L, 5L, 500000L)))
    assert(out("g2") === ((500000L, 5L, 388888L))) // (1e6 + 2.5e6) div 9
    assert(out("g3") === ((500000L, 5L, 611111L)))
    // identical rates -> v = 0 -> k_prior 0, raw passes through
    val flat = (grp("a", 1, 2) ++ grp("b", 1, 2)).toDF("g", "ok")
    val f = Inference.momSmoothedRates(flat, Seq("g"), col("ok"))
      .collect().map(r => (r.getLong(5), r.getLong(3) == r.getLong(6)))
    assert(f.forall(_ == ((0L, true))))
  }

  // ---- blockingQuality ----

  test("blockingQuality: exact reduction ratio and pairs completeness") {
    // 5 rows: blocks A{1,2,3} B{4} null{5} -> cand = C(3,2) = 3 of
    // C(5,2) = 10 -> reduction 700000. truth: (1,2) covered; (1,4) split;
    // (1,5) null side uncovered; (1,9) missing side uncovered -> 1/4
    val df = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (5L, null.asInstanceOf[String])).toDF("id", "blk")
    val truth = Seq((1L, 2L), (1L, 4L), (1L, 5L), (1L, 9L))
      .toDF("id_a", "id_b")
    val r = FuzzyLink.blockingQuality(df, col("id"), col("blk"), truth)
      .select("n_rows", "n_blocks", "cand_pairs", "total_pairs",
        "reduction_ppm", "truth_pairs", "truth_covered", "completeness_ppm")
      .collect()(0)
    assert(r.toSeq === Seq(5L, 2L, 3L, 10L, 700000L, 4L, 1L, 250000L))
  }

  // ---- keySkew ----

  test("keySkew: exact top-share, skew ratio, Gini; uniform keys gini 0") {
    import graft.pipeline.Profile
    // k: counts {a:4, b:1, c:1} n=6 -> top 4/6, ratio 4*3/6 = 2x,
    // gini = (2*(1*1+2*1+3*4) - 4*6) / (3*6) = (30-24)/18 = 1/3
    val df = (Seq.fill(4)("a") ++ Seq("b", "c")).map((_, "u"))
      .toDF("k", "flat")
    val r = Profile.keySkew(df, Seq("k", "flat")).collect()
      .map(x => x.getString(0) -> x.toSeq.drop(1)).toMap
    assert(r("k") === Seq(6L, 0L, 3L, 4L, 666666L, 2000000L, 333333L))
    // flat: one key -> gini exactly 0, ratio exactly 1e6
    assert(r("flat") === Seq(6L, 0L, 1L, 6L, 1000000L, 1000000L, 0L))
  }

  // ---- wassersteinByGroup ----

  test("wassersteinByGroup: hand integral equals the true W1; identical samples give 0") {
    import spark.implicits._
    // A = {0, 10}, B = {10, 20}: true W1 = 10 units = 10e6 micro
    val df = Seq(("g", 0L, false), ("g", 10L, false),
      ("g", 10L, true), ("g", 20L, true)).toDF("grp", "v", "b")
    val r = Inference.wassersteinByGroup(df, Seq("grp"), col("v"), col("b"))
      .collect()(0)
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("w1_micro") === 10000000L)
    // identical samples -> exactly 0
    val same = Seq(("g", 1L, false), ("g", 5L, false),
      ("g", 1L, true), ("g", 5L, true)).toDF("grp", "v", "b")
    assert(Inference.wassersteinByGroup(same, Seq("grp"), col("v"), col("b"))
      .collect()(0).getAs[Long]("w1_micro") === 0L)
    // metric-awareness: a 100-unit shift reads 10x a 10-unit shift
    // (KS would call both D = 1)
    val far = Seq(("g", 0L, false), ("g", 100L, true)).toDF("grp", "v", "b")
    val near = Seq(("g", 0L, false), ("g", 10L, true)).toDF("grp", "v", "b")
    val wFar = Inference.wassersteinByGroup(far, Seq("grp"), col("v"), col("b"))
      .collect()(0).getAs[Long]("w1_micro")
    val wNear = Inference.wassersteinByGroup(near, Seq("grp"), col("v"), col("b"))
      .collect()(0).getAs[Long]("w1_micro")
    assert(wFar === 10L * wNear && wNear === 10000000L)
    // one-sided group drops
    val oneSide = Seq(("h", 1L, false), ("h", 2L, false)).toDF("grp", "v", "b")
    assert(Inference.wassersteinByGroup(oneSide, Seq("grp"), col("v"), col("b"))
      .collect().isEmpty)
    // single shared distinct value: both sides present -> w1_micro = 0,
    // NOT a dropped group (r11 advisor: "no drift" must never read as
    // "no result")
    val single = Seq(("s", 7L, false), ("s", 7L, false), ("s", 7L, true))
      .toDF("grp", "v", "b")
    val sr = Inference.wassersteinByGroup(single, Seq("grp"), col("v"),
      col("b")).collect()
    assert(sr.length === 1)
    assert(sr(0).getAs[Long]("n_a") === 2L && sr(0).getAs[Long]("n_b") === 1L)
    assert(sr(0).getAs[Long]("w1_micro") === 0L)
  }

  // ---- matthewsCorrelation ----

  test("matthewsCorrelation: textbook cells, perfect predictor, degenerate NULL") {
    import spark.implicits._
    // tp=4 fp=1 fn=2 tn=3 — assert against the exact declared IEEE chain
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val r = Inference.matthewsCorrelation(rows.toDF("p", "y"), col("p"), col("y"))
      .collect()(0)
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
      r.getAs[Long]("tn")) === ((4L, 1L, 2L, 3L)))
    assert(r.getAs[Long]("accuracy_ppm") === 700000L)
    assert(r.getAs[Long]("precision_ppm") === 800000L)
    assert(r.getAs[Long]("recall_ppm") === 666666L)
    assert(r.getAs[Long]("f1_ppm") === 727272L)
    val want = (4.0 * 3.0 - 1.0 * 2.0) /
      (((math.sqrt(5.0) * math.sqrt(6.0)) * math.sqrt(4.0)) * math.sqrt(5.0))
    assert(r.getAs[Double]("mcc") === want)
    // perfect predictor: mcc is the chain value, within an ulp of 1
    val perfect = (Seq.fill(5)((true, true)) ++ Seq.fill(5)((false, false)))
      .toDF("p", "y")
    val pm = Inference.matthewsCorrelation(perfect, col("p"), col("y"))
      .collect()(0).getAs[Double]("mcc")
    assert(math.abs(pm - 1.0) < 1e-12)
    // all-true predictions: two zero marginals -> NULL mcc, defined f1
    val allPred = (Seq.fill(3)((true, true)) ++ Seq.fill(2)((true, false)))
      .toDF("p", "y")
    val ap = Inference.matthewsCorrelation(allPred, col("p"), col("y"))
      .collect()(0)
    assert(ap.isNullAt(ap.fieldIndex("mcc")))
    assert(ap.getAs[Long]("recall_ppm") === 1000000L)
  }

  // ---- kishEffectiveSample ----

  test("kishEffectiveSample: uniform weights keep neff = n; concentration collapses it") {
    import spark.implicits._
    val uni = Seq(("g", 2000L), ("g", 2000L), ("g", 2000L), ("g", 2000L))
      .toDF("grp", "w")
    val u = Inference.kishEffectiveSample(uni, Seq("grp"), col("w"))
      .collect()(0)
    assert(u.getAs[Long]("n") === 4L)
    assert(u.getAs[Long]("neff_milli") === 4000L)
    assert(u.getAs[Long]("deff_ppm") === 1000000L)
    // one dominant weight: neff = 144e6/84e3 = 1714 milli, deff = 2333333
    val skew = Seq(("g", 1000L), ("g", 1000L), ("g", 1000L), ("g", 9000L))
      .toDF("grp", "w")
    val k = Inference.kishEffectiveSample(skew, Seq("grp"), col("w"))
      .collect()(0)
    assert(k.getAs[Long]("neff_milli") === 1714L)
    assert(k.getAs[Long]("deff_ppm") === 2333333L)
    // non-positive and NULL weights are excluded
    val mixed = Seq(("g", Some(1000L)), ("g", Some(0L)), ("g", Some(-5L)),
      ("g", None)).toDF("grp", "w")
    assert(Inference.kishEffectiveSample(mixed, Seq("grp"), col("w"))
      .collect()(0).getAs[Long]("n") === 1L)
  }

  // ---- bhFdr ----

  test("bhFdr: step-up rescues earlier ranks; empty-rejection and raise edges") {
    import spark.implicits._
    // p = {15k, 18k, 20k, 900k, 1000k} at alpha 5%: criticals 10k*i;
    // rank 1 FAILS its own threshold (15k > 10k) but rank 3 passes
    // (20k <= 30k) so the step-up rejects ranks 1-3 — the defining
    // BH property a naive per-rank filter would get wrong
    val df = Seq(("a", 15000L), ("b", 18000L), ("c", 20000L),
      ("d", 900000L), ("e", 1000000L)).toDF("id", "p")
    val r = Inference.bhFdr(df, col("id"), col("p"), alphaPpm = 50000L)
      .collect().map(x => x.getAs[String]("test_id") ->
        (x.getAs[Long]("rank"), x.getAs[Boolean]("rejected"))).toMap
    assert(r("a") === ((1L, true)) && r("b") === ((2L, true)) &&
      r("c") === ((3L, true)))
    assert(r("d") === ((4L, false)) && r("e") === ((5L, false)))
    // nothing passes -> k = 0, nothing rejected
    val none = Seq(("a", 500000L), ("b", 900000L)).toDF("id", "p")
    assert(Inference.bhFdr(none, col("id"), col("p"), alphaPpm = 50000L)
      .collect().forall(!_.getAs[Boolean]("rejected")))
    // deterministic tie ranking by id
    val tie = Seq(("z", 10000L), ("y", 10000L)).toDF("id", "p")
    val tr = Inference.bhFdr(tie, col("id"), col("p"), alphaPpm = 100000L)
      .collect().map(x => x.getAs[String]("test_id") -> x.getAs[Long]("rank"))
      .toMap
    assert(tr("y") === 1L && tr("z") === 2L)
    // out-of-range p fails loud
    val bad = Seq(("a", 1000001L)).toDF("id", "p")
    val e = intercept[Exception] {
      Inference.bhFdr(bad, col("id"), col("p")).collect()
    }
    assert(e.getMessage.contains("outside [0, 1e6]"))
  }

  // ---- krippendorffAlpha ----

  test("krippendorffAlpha: hand vectors incl. negative alpha, singleton drop, NULL, raise") {
    import spark.implicits._
    // u1:(a,a) u2:(a,b): Do_sum = 2/(2-1), n = 4, pooled a:3 b:1,
    // De_sum = 3*1 + 1*3 = 6 -> alpha = 1 - 3*2/6 = 0 exactly
    val df = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b"))
      .toDF("u", "c")
    val r = Inference.krippendorffAlpha(df, col("u"), col("c")).collect()(0)
    assert(r.getAs[Long]("n_units") === 2L && r.getAs[Long]("n_ratings") === 4L)
    assert(r.getAs[Long]("alpha_ppm") === 0L)
    // perfect agreement -> exactly 1e6
    val perfect = Seq(("u1", "a"), ("u1", "a"), ("u2", "b"), ("u2", "b"))
      .toDF("u", "c")
    assert(Inference.krippendorffAlpha(perfect, col("u"), col("c"))
      .collect()(0).getAs[Long]("alpha_ppm") === 1000000L)
    // systematic within-unit disagreement -> alpha = -0.5 exactly
    val worse = Seq(("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "b"))
      .toDF("u", "c")
    assert(Inference.krippendorffAlpha(worse, col("u"), col("c"))
      .collect()(0).getAs[Long]("alpha_ppm") === -500000L)
    // a singleton unit is unpairable: result identical to dropping it
    val withSingleton = df.unionByName(Seq(("u3", "b")).toDF("u", "c"))
    val ws = Inference.krippendorffAlpha(withSingleton, col("u"), col("c"))
      .collect()(0)
    assert(ws.getAs[Long]("n_units") === 2L &&
      ws.getAs[Long]("alpha_ppm") === 0L)
    // all ratings one value -> De = 0 -> NULL alpha
    val flat = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "a"))
      .toDF("u", "c")
    val fr = Inference.krippendorffAlpha(flat, col("u"), col("c")).collect()(0)
    assert(fr.isNullAt(fr.fieldIndex("alpha_ppm")))
    // a unit over maxRaters fails loud (the L-headroom contract)
    val big = (1 to 4).map(i => ("u1", s"v$i")).toDF("u", "c")
    val e = intercept[Exception] {
      Inference.krippendorffAlpha(big, col("u"), col("c"), maxRaters = 3)
        .collect()
    }
    assert(e.getMessage.contains("exceeds 3 ratings"))
  }

  // ---- gwetAc1 ----

  test("gwetAc1: hand vector, perfect -1/+1 edges, single-category NULL") {
    import spark.implicits._
    // cells: yy 8, yn 1, ny 0, nn 1 -> po 0.9; m_y = 17, m_n = 3,
    // pe_num = 102, D = 400 -> ac1 = 2580/2980 = 865771 ppm (trunc)
    val rows = Seq.fill(8)(("y", "y")) ++ Seq.fill(1)(("y", "n")) ++
      Seq.fill(1)(("n", "n"))
    val r = Inference.gwetAc1(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("n_categories") === 2L)
    assert(r.getAs[Long]("ac1_ppm") === 865771L)
    // kappa on the same data for the contrast (pe_k = 0.74)
    val k = Inference.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    assert(k.getAs[Long]("pe_ppm") === 740000L)
    // systematic disagreement -> exactly -1e6
    val worse = Seq.fill(5)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
    assert(Inference.gwetAc1(worse.toDF("a", "b"), col("a"), col("b"))
      .collect()(0).getAs[Long]("ac1_ppm") === -1000000L)
    // perfect agreement -> exactly 1e6
    val perfect = Seq.fill(4)(("y", "y")) ++ Seq.fill(6)(("n", "n"))
    assert(Inference.gwetAc1(perfect.toDF("a", "b"), col("a"), col("b"))
      .collect()(0).getAs[Long]("ac1_ppm") === 1000000L)
    // one observed category: chance agreement is total -> NULL
    val one = Seq.fill(5)(("y", "y"))
    val or = Inference.gwetAc1(one.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    assert(or.isNullAt(or.fieldIndex("ac1_ppm")))
  }

  // ---- youdenThreshold ----

  test("youdenThreshold: perfect separation, tie to smallest cut, degenerate empty") {
    import spark.implicits._
    // pos at {3,4}, neg at {1,2}: cut 2 -> TPR 1e6, FPR 0, J 1e6
    val sep = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("v", "y")
    val r = Inference.youdenThreshold(sep, col("v"), col("y")).collect()(0)
    assert(r.getAs[Long]("best_threshold") === 2L)
    assert(r.getAs[Long]("tpr_ppm") === 1000000L)
    assert(r.getAs[Long]("fpr_ppm") === 0L)
    assert(r.getAs[Long]("best_j_ppm") === 1000000L)
    // overlap: cuts 1 and 2 tie at J = 500000 -> smallest threshold wins
    val tie = Seq((1L, false), (2L, false), (2L, true), (3L, true))
      .toDF("v", "y")
    val t = Inference.youdenThreshold(tie, col("v"), col("y")).collect()(0)
    assert(t.getAs[Long]("best_j_ppm") === 500000L)
    assert(t.getAs[Long]("best_threshold") === 1L)
    // one-class input: no operating point exists
    assert(Inference.youdenThreshold(
      Seq((1L, true), (2L, true)).toDF("v", "y"), col("v"), col("y"))
      .collect().isEmpty)
    // maxDistinct guard
    val wide = (1L to 30L).map(i => (i, i % 2 == 0)).toDF("v", "y")
    val e = intercept[Exception] {
      Inference.youdenThreshold(wide, col("v"), col("y"), maxDistinct = 5L)
        .collect()
    }
    assert(e.getMessage.contains("exceeded 5"))
  }

  // ---- cliffsDelta ----

  test("cliffsDelta: dominance edges, tie zero, Romano magnitude labels") {
    import spark.implicits._
    // complete dominance: every B above every A -> delta exactly -1
    val dom = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("v", "b")
    val r = Inference.cliffsDelta(dom, col("v"), col("b")).collect()(0)
    assert(r.getAs[Long]("delta_ppm") === -1000000L)
    assert(r.getAs[String]("magnitude") === "large")
    // reversed -> exactly +1
    val rev = Seq((3L, false), (4L, false), (1L, true), (2L, true))
      .toDF("v", "b")
    assert(Inference.cliffsDelta(rev, col("v"), col("b")).collect()(0)
      .getAs[Long]("delta_ppm") === 1000000L)
    // all tied -> exactly 0, negligible
    val tied = Seq((5L, false), (5L, true)).toDF("v", "b")
    val t = Inference.cliffsDelta(tied, col("v"), col("b")).collect()(0)
    assert(t.getAs[Long]("delta_ppm") === 0L)
    assert(t.getAs[String]("magnitude") === "negligible")
    // hand mixed case: A={1,3}, B={2,4}: #(a>b)=1, #(a<b)=3 -> -0.5, large
    val mix = Seq((1L, false), (3L, false), (2L, true), (4L, true))
      .toDF("v", "b")
    val m = Inference.cliffsDelta(mix, col("v"), col("b")).collect()(0)
    assert(m.getAs[Long]("delta_ppm") === -500000L)
    assert(m.getAs[String]("magnitude") === "large")
  }

  test("compressed-baseline envelopes: KS/W1 inside the stride bound, categorical trio monotone under coarsening (q472 laws)") {
    import graft.functions.QuantileSketch
    // a shaped baseline (values 1..200, weight = 1 + v%3) against a
    // shifted live side (60..259): exact vs k=16-compressed readings
    val base = (1L to 200L).map(v => (v, 1L + v % 3L))
      .toDF("qs_value", "qs_weight").localCheckpoint(false)
    val live = (60L to 259L).map(v => (v, 1L)).toDF("qs_value", "qs_weight")
      .localCheckpoint(false)
    val comp = QuantileSketch.qsCompress(base, Nil, 16).localCheckpoint(false)
    val w = base.agg(sum(col("qs_weight"))).head().getLong(0)
    val s = (w + 15) / 16
    // KS: |d_ppm_comp - d_ppm_exact| <= ceil(s*1e6/W) + 1 (the kept-rank
    // exactness bound — gap mass between kept points < s)
    val dE = Inference.ksFromRegisters(base, live).head().getAs[Long]("d_ppm")
    val dC = Inference.ksFromRegisters(comp, live).head().getAs[Long]("d_ppm")
    val ksBound = (s * 1000000L + w - 1) / w + 1
    assert(math.abs(dC - dE) <= ksBound, s"KS gap ${math.abs(dC - dE)} > $ksBound")
    // W1: |delta| <= ceil(s*span*1e6/W) + 1 (sup-norm bound integrated
    // over the union support span)
    val w1E = Inference.w1FromRegisters(base, live).head().getAs[Long]("w1_micro")
    val w1C = Inference.w1FromRegisters(comp, live).head().getAs[Long]("w1_micro")
    val span = 259L - 1L
    val w1Bound = (s * span * 1000000L + w - 1) / w + 1
    assert(math.abs(w1C - w1E) <= w1Bound, s"W1 gap ${math.abs(w1C - w1E)} > $w1Bound")
    // categorical trio on the summary's bucketing (live value -> smallest
    // kept >= it, overflow fresh): coarsening is monotone — TVD outright,
    // chi2 within 2*n_cats millis, TD within n_cats ppm (the per-term
    // truncation slack)
    val grid = comp.select(col("qs_value").as("gv"))
    val gmax = comp.agg(max(col("qs_value")).as("gmax"))
    val lb = live.join(broadcast(grid), col("gv") >= col("qs_value"), "left")
      .groupBy(col("qs_value"), col("qs_weight"))
      .agg(min(col("gv")).as("b"))
      .crossJoin(broadcast(gmax))
      .select(coalesce(col("b"), col("gmax") + 1L).as("qs_value"),
        col("qs_weight"))
      .groupBy(col("qs_value")).agg(sum(col("qs_weight")).as("qs_weight"))
      .localCheckpoint(false)
    val nCats = Inference.tvdFromRegisters(base, live).head().getAs[Long]("n_cats")
    val tvE = Inference.tvdFromRegisters(base, live).head().getAs[Long]("tv_ppm")
    val tvB = Inference.tvdFromRegisters(comp, lb).head().getAs[Long]("tv_ppm")
    assert(tvB <= tvE, s"TVD coarsening increased: $tvB > $tvE")
    val c2E = Inference.chi2FromRegisters(base, live).head().getAs[Long]("chi2_milli")
    val c2B = Inference.chi2FromRegisters(comp, lb).head().getAs[Long]("chi2_milli")
    assert(c2B <= c2E + 2 * nCats, s"chi2 coarsening increased: $c2B > $c2E")
    val tdE = Inference.tdFromRegisters(base, live).head().getAs[Long]("td_ppm")
    val tdB = Inference.tdFromRegisters(comp, lb).head().getAs[Long]("td_ppm")
    assert(tdB <= tdE + nCats, s"TD coarsening increased: $tdB > $tdE")
  }
}
