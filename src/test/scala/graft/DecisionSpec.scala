package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Features
import graft.pipeline.{Inference, Stats}

/** Hand-computable vectors for the decision-statistics battery
  * (q387-q396): one-way ANOVA, Kruskal-Wallis, McNemar, Brown-Forsythe,
  * Cohen's d, Cochran-Armitage, competing-risks CIF, FIFO allocation and
  * the NRR bridge. Each vector is small enough to verify on paper and
  * pins the exact-arithmetic conventions (truncating per-group divisions,
  * doubled ranks/medians, ppm folds).
  */
class DecisionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- anovaF ----

  test("anovaF: textbook two-group vector (means 2 vs 6)") {
    // g1=[1,2,3], g2=[5,6,7]: SSB = 3*(2-4)^2 + 3*(6-4)^2 = 24, SSW = 4,
    // F = (24/1)/(4/4) = 24
    val df = (Seq(1L, 2L, 3L).map((_, "a")) ++ Seq(5L, 6L, 7L).map((_, "b")))
      .toDF("v", "g")
    val r = Inference.anovaF(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 2L, 24L, 4L)))
    assert(r.getDouble(4) === 24.0)
  }

  test("anovaF: single group emits NULL F; identical groups give ssb 0") {
    val one = Seq((1L, "a"), (2L, "a")).toDF("v", "g")
    assert(Inference.anovaF(one, col("v"), col("g")).collect()(0).isNullAt(4))
    val same = (Seq(1L, 2L).map((_, "a")) ++ Seq(1L, 2L).map((_, "b")))
      .toDF("v", "g")
    val r = Inference.anovaF(same, col("v"), col("g")).collect()(0)
    assert(r.getLong(2) === 0L && r.getDouble(4) === 0.0)
  }

  // ---- kruskalWallis ----

  test("kruskalWallis: untied two-group vector gives H = 2.4") {
    // g1=[1,2], g2=[3,4]: R1=3, R2=7; H = 12/(4*5)*(9/2+49/2) - 15 = 2.4
    val df = (Seq(1L, 2L).map((_, "a")) ++ Seq(3L, 4L).map((_, "b")))
      .toDF("v", "g")
    val r = Inference.kruskalWallis(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 0L)))
    assert(r.getDouble(3) === (48.0 / 20.0) * (60.0 / 60.0))
  }

  test("kruskalWallis: tie correction and per-group truncation convention") {
    // g1=[1,2,2], g2=[2,3]: doubled ranks 2,6,6 | 6,10 -> R2 = 14, 16;
    // terms 196 div 3 = 65, 256 div 2 = 128 -> S2 = 193; T = 2^3-2 = ...
    // only the triple tie at v=2: 27-3 = 24; H = (579-540)/30 * 120/96
    val df = (Seq(1L, 2L, 2L).map((_, "a")) ++ Seq(2L, 3L).map((_, "b")))
      .toDF("v", "g")
    val r = Inference.kruskalWallis(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5L, 2L, 24L)))
    assert(r.getDouble(3) === (39.0 / 30.0) * (120.0 / 96.0))
  }

  test("kruskalWallis: all-tied input emits NULL H") {
    val df = Seq((7L, "a"), (7L, "b"), (7L, "a")).toDF("v", "g")
    assert(Inference.kruskalWallis(df, col("v"), col("g"))
      .collect()(0).isNullAt(3))
  }

  // ---- mcnemar ----

  test("mcnemar: discordant cells drive the statistic") {
    // a=[T,T,F,F,T], b=[T,F,T,F,F]: both=1, a_only=2, b_only=1, neither=1
    val df = Seq((true, true), (true, false), (false, true), (false, false),
      (true, false)).toDF("a", "b")
    val r = Inference.mcnemar(df, col("a"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((5L, 1L, 2L, 1L, 1L)))
    assert(r.getDouble(5) === 1.0 / 3.0)
    assert(r.getDouble(6) === 0.0) // |b-c|-1 clamps to 0
  }

  test("mcnemar: perfect agreement emits NULL chi2") {
    val df = Seq((true, true), (false, false)).toDF("a", "b")
    val r = Inference.mcnemar(df, col("a"), col("b")).collect()(0)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  // ---- cohensD ----

  test("cohensD: separated samples give d = 3, Hedges g = 2.4") {
    // A=[1,2,3], B=[4,5,6]: pooled var = 4/4 = 1, mean diff 3;
    // J = 1 - 3/15 = 0.8
    val df = (Seq(1L, 2L, 3L).map((_, false)) ++ Seq(4L, 5L, 6L).map((_, true)))
      .toDF("v", "b")
    val r = Inference.cohensD(df, col("v"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 4L)))
    assert(r.getDouble(3) === 3.0)
    assert(r.getDouble(4) === 3.0 * (1.0 - 3.0 / 15.0))
  }

  test("cohensD: sign flips with direction; zero-variance emits NULL") {
    val df = (Seq(4L, 5L, 6L).map((_, false)) ++ Seq(1L, 2L, 3L).map((_, true)))
      .toDF("v", "b")
    assert(Inference.cohensD(df, col("v"), col("b")).collect()(0)
      .getDouble(3) === -3.0)
    val const = (Seq(5L, 5L).map((_, false)) ++ Seq(5L, 5L).map((_, true)))
      .toDF("v", "b")
    assert(Inference.cohensD(const, col("v"), col("b")).collect()(0).isNullAt(3))
  }

  // ---- cochranArmitage ----

  test("cochranArmitage: perfect dose response z = 2") {
    // doses 0,1,2 with 2 subjects each, successes 0,1,2:
    // num = 6*5 - 3*6 = 12; var = 3*3*(6*10-36)/6 = 36; z = 2
    val df = Seq((0L, false), (0L, false), (1L, true), (1L, false),
      (2L, true), (2L, true)).toDF("w", "s")
    val r = Inference.cochranArmitage(df, col("w"), col("s")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 3L, 6L, 5L)))
    assert(r.getDouble(4) === 2.0)
  }

  test("cochranArmitage: constant dose or all-success emits NULL z") {
    val flat = Seq((3L, true), (3L, false)).toDF("w", "s")
    assert(Inference.cochranArmitage(flat, col("w"), col("s"))
      .collect()(0).isNullAt(4))
    val all = Seq((0L, true), (1L, true)).toDF("w", "s")
    assert(Inference.cochranArmitage(all, col("w"), col("s"))
      .collect()(0).isNullAt(4))
  }

  // ---- brownForsythe ----

  test("brownForsythe: odd-n medians, hand ANOVA over deviations") {
    // g1=[0,2,4] med 2 -> |2x-4| = [4,0,4]; g2=[0,10,20] med 10 ->
    // [20,0,20]; bterms 64 div 3 = 21, 1600 div 3 = 533; b = 554;
    // grand 48^2 div 6 = 384; ssb = 170, ssw = 832-554 = 278;
    // F = 170*4 / (278*1)
    val df = (Seq(0L, 2L, 4L).map((_, "a")) ++ Seq(0L, 10L, 20L).map((_, "b")))
      .toDF("v", "g")
    val r = Inference.brownForsythe(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 2L, 170L, 278L)))
    assert(r.getDouble(4) === 680.0 / 278.0)
  }

  test("brownForsythe: even-n doubled median; equal spreads -> ssw 0, NULL F") {
    // g1=[1,3] med2=4 -> devs [2,2]; g2=[10,30] med2=40 -> devs [20,20]:
    // within-group deviation spread is zero in both groups
    val df = (Seq(1L, 3L).map((_, "a")) ++ Seq(10L, 30L).map((_, "b")))
      .toDF("v", "g")
    val r = Inference.brownForsythe(df, col("v"), col("g")).collect()(0)
    assert(r.getLong(3) === 0L && r.isNullAt(4))
    assert(r.getLong(2) === 324L)
  }

  // ---- competingRisks ----

  test("competingRisks: three-step curve, surv + cifs == 1e6 at every step") {
    // exits: (1,A),(1,B),(2,A),(3,cens),(3,A); risk sets 5,3,2
    val df = Seq((1L, true, false), (1L, false, true), (2L, true, false),
      (3L, false, false), (3L, true, false)).toDF("dur", "ca", "cb")
    val rows = Inference.competingRisks(df, col("dur"), col("ca"), col("cb"))
      .orderBy("duration").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq === Seq(
      (1L, 5L, 1L, 1L, 600000L, 200000L, 200000L),
      (2L, 3L, 1L, 0L, 400000L, 400000L, 200000L),
      (3L, 2L, 1L, 0L, 200000L, 600000L, 200000L)))
    // the additive identity the truncating fold preserves by construction
    rows.foreach(r =>
      assert(r.getLong(4) + r.getLong(5) + r.getLong(6) === 1000000L))
  }

  test("competingRisks: cause-A-wins tie convention in the caller pattern") {
    // both flags set -> d_a counts it, d_b must not double-count
    val df = Seq((1L, true, true), (2L, false, true)).toDF("dur", "ca", "cb")
    val rows = Inference.competingRisks(df, col("dur"), col("ca"), col("cb"))
      .orderBy("duration").collect()
    assert(rows.map(r => (r.getLong(2), r.getLong(3))).toSeq ===
      Seq((1L, 0L), (0L, 1L)))
  }

  // ---- fifoAllocate ----

  test("fifoAllocate: layered matching prices each slice at its supply layer") {
    // supply (qty@cents): 5@10 then 5@20; demand: 3, 4, 3
    // -> 3@10 | 2@10 + 2@20 | 3@20; total cost 150
    val supply = Seq((1L, 1L, 5L, 10L), (1L, 2L, 5L, 20L))
      .toDF("k", "ord", "qty", "cents")
    val demand = Seq((1L, 1L, 3L), (1L, 2L, 4L), (1L, 3L, 3L))
      .toDF("k", "ord", "qty")
    val rows = Features.fifoAllocate(supply, demand, "k",
      col("ord"), col("qty"), col("cents"), col("ord"), col("qty"))
      .orderBy("d_ord", "s_ord").collect()
    assert(rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(5))).toSeq === Seq(
      (1L, 1L, 3L, 30L), (2L, 1L, 2L, 20L), (2L, 2L, 2L, 40L),
      (3L, 2L, 3L, 60L)))
  }

  test("fifoAllocate: demand beyond supply is simply unmatched") {
    val supply = Seq((1L, 1L, 2L, 10L)).toDF("k", "ord", "qty", "cents")
    val demand = Seq((1L, 1L, 2L), (1L, 2L, 5L)).toDF("k", "ord", "qty")
    val rows = Features.fifoAllocate(supply, demand, "k",
      col("ord"), col("qty"), col("cents"), col("ord"), col("qty")).collect()
    assert(rows.length === 1 && rows(0).getLong(3) === 2L)
  }

  test("fifoAllocate: keys never cross-match") {
    val supply = Seq((1L, 1L, 5L, 10L)).toDF("k", "ord", "qty", "cents")
    val demand = Seq((2L, 1L, 5L)).toDF("k", "ord", "qty")
    assert(Features.fifoAllocate(supply, demand, "k", col("ord"), col("qty"),
      col("cents"), col("ord"), col("qty")).count() === 0L)
  }

  // ---- nrrBridge ----

  test("nrrBridge: expansion/contraction/churn/new decomposition and ppms") {
    // m1: A=100 B=50 C=40; m2: A=120 B=30 D=60
    val df = Seq((1L, "A", 100L), (1L, "B", 50L), (1L, "C", 40L),
      (2L, "A", 120L), (2L, "B", 30L), (2L, "D", 60L)).toDF("m", "c", "v")
    val rows = Features.nrrBridge(df, col("m"), col("c"), col("v"))
      .orderBy("m").collect()
    val m2 = rows(1)
    assert((m2.getLong(1), m2.getLong(2), m2.getLong(3), m2.getLong(4),
      m2.getLong(5)) === ((190L, 20L, 20L, 40L, 60L)))
    assert(m2.getLong(6) === 150L * 1000000L / 190L)
    assert(m2.getLong(7) === 130L * 1000000L / 190L)
    // m1 has no prior base -> NULL ppms; m3 is all-churn with nrr 0
    assert(rows(0).isNullAt(6))
    val m3 = rows(2)
    assert(m3.getLong(1) === 210L && m3.getLong(4) === 210L &&
      m3.getLong(6) === 0L)
  }

  // ---- generative cross-checks vs brute-force references ----
  //
  // Seeded random small datasets (deliberate ties via tiny value domains)
  // checked against straightforward single-machine implementations of the
  // DEFINITIONS — this validates the distributed constructions (densified
  // grids, rank windows, interval joins, weighted medians) rather than
  // re-deriving the algebra the hand vectors already pin.

  private val gen = new scala.util.Random(42)

  test("generative: jonckheereTerpstra jt2 equals the O(n^2) pair definition") {
    for (trial <- 1 to 5) {
      val k = 2 + gen.nextInt(3)
      val data = for {
        g <- 1 to k
        _ <- 1 to (5 + gen.nextInt(20))
      } yield (gen.nextInt(8).toLong, g.toLong)
      val jt2Brute = (for {
        (x, gx) <- data; (y, gy) <- data if gx < gy
      } yield if (x < y) 2L else if (x == y) 1L else 0L).sum
      val r = Inference.jonckheereTerpstra(data.toDF("v", "g"),
        col("v"), col("g")).collect()(0)
      assert(r.getLong(2) === jt2Brute, s"trial $trial")
    }
  }

  test("generative: kruskalWallis matches the doubled-rank definition with ties") {
    for (trial <- 1 to 4) {
      val k = 2 + gen.nextInt(3)
      val data = for {
        g <- 1 to k
        _ <- 1 to (4 + gen.nextInt(15))
      } yield (gen.nextInt(6).toLong, s"g$g")
      val n = data.size.toLong
      def below(v: Long) = data.count(_._1 < v).toLong
      def cnt(v: Long) = data.count(_._1 == v).toLong
      def r2(v: Long) = 2L * below(v) + cnt(v) + 1L
      val s2 = data.groupBy(_._2).values.map { rows =>
        val rs = BigInt(rows.map(r => r2(r._1)).sum)
        (rs * rs) / rows.size
      }.sum
      val t = data.map(_._1).distinct.map { v =>
        val c = BigInt(cnt(v)); c * c * c - c
      }.sum
      val num = BigInt(3) * s2 - BigInt(3) * n * (n + 1) * (n + 1)
      val n3 = BigInt(n) * n * n - n
      val hBrute = (num.toDouble / (BigInt(n) * (n + 1)).toDouble) *
        (n3.toDouble / (n3 - t).toDouble)
      val r = Inference.kruskalWallis(data.toDF("v", "g"),
        col("v"), col("g")).collect()(0)
      assert(r.getLong(2) === t.toLong && r.getDouble(3) === hBrute,
        s"trial $trial")
    }
  }

  test("generative: wilcoxonSignedRank W2+ matches the sorted-|d| definition") {
    for (trial <- 1 to 5) {
      val ds = Seq.fill(10 + gen.nextInt(30))(gen.nextInt(11).toLong - 5L)
      val nz = ds.filter(_ != 0L)
      def below(a: Long) = nz.count(d => math.abs(d) < a).toLong
      def cnt(a: Long) = nz.count(d => math.abs(d) == a).toLong
      val w2Brute = nz.filter(_ > 0L)
        .map(d => 2L * below(d) + cnt(d) + 1L).sum
      val r = Inference.wilcoxonSignedRank(ds.toDF("d"), col("d"))
        .collect()(0)
      assert(r.getLong(0) === nz.size.toLong && r.getLong(1) === w2Brute,
        s"trial $trial")
    }
  }

  test("generative: hodgesLehmannShift equals the sorted cross-difference median") {
    for (trial <- 1 to 5) {
      val as = Seq.fill(3 + gen.nextInt(12))(gen.nextInt(9).toLong)
      val bs = Seq.fill(3 + gen.nextInt(12))(gen.nextInt(9).toLong)
      val diffs = (for (a <- as; b <- bs) yield b - a).sorted
      val w = diffs.size
      val hl2Brute = diffs((w + 1) / 2 - 1) + diffs((w + 2) / 2 - 1)
      val df = (as.map((_, false)) ++ bs.map((_, true))).toDF("v", "b")
      val r = Inference.hodgesLehmannShift(df, col("v"), col("b"))
        .collect()(0)
      assert(r.getLong(2) === hl2Brute, s"trial $trial")
    }
  }

  test("generative: fifoAllocate equals a sequential queue simulation") {
    for (trial <- 1 to 4) {
      val supply = (1 to (3 + gen.nextInt(6))).map(i =>
        (1L, i.toLong, (1 + gen.nextInt(8)).toLong, (1 + gen.nextInt(50)).toLong))
      val demand = (1 to (3 + gen.nextInt(6))).map(i =>
        (1L, i.toLong, (1 + gen.nextInt(8)).toLong))
      // sequential reference: walk both queues front-to-front
      val out = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long)]
      var si = 0
      var sRem = supply.headOption.map(_._3).getOrElse(0L)
      for ((_, dOrd, dQty) <- demand) {
        var dRem = dQty
        while (dRem > 0 && si < supply.size) {
          val take = math.min(dRem, sRem)
          if (take > 0)
            out += ((dOrd, supply(si)._2, take, take * supply(si)._4))
          dRem -= take; sRem -= take
          if (sRem == 0) { si += 1
            sRem = if (si < supply.size) supply(si)._3 else 0L }
        }
      }
      val got = graft.operators.Features.fifoAllocate(
        supply.toDF("k", "ord", "qty", "cents"),
        demand.toDF("k", "ord", "qty"), "k",
        col("ord"), col("qty"), col("cents"), col("ord"), col("qty"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
        .toSet
      assert(got === out.toSet, s"trial $trial")
    }
  }

  test("generative: cmh matches BigInt floor accumulation of the definition") {
    for (trial <- 1 to 4) {
      val data = for {
        s <- 1 to (2 + gen.nextInt(3))
        _ <- 1 to (8 + gen.nextInt(20))
      } yield (s"s$s", gen.nextBoolean(), gen.nextBoolean())
      val strata = data.groupBy(_._1).values.map { rows =>
        val a = rows.count(r => r._2 && r._3).toLong
        val b = rows.count(r => r._2 && !r._3).toLong
        val c = rows.count(r => !r._2 && r._3).toLong
        val d = rows.count(r => !r._2 && !r._3).toLong
        (a, b, c, d, a + b + c + d)
      }.filter(_._5 >= 2).toSeq
      val rSum = strata.map { case (a, _, _, d, n) =>
        BigInt(a) * d * 1000000 / n }.sum
      val sSum = strata.map { case (_, b, c, _, n) =>
        BigInt(b) * c * 1000000 / n }.sum
      val orBrute = if (sSum > 0) Some((rSum * 1000 / sSum).toLong) else None
      val r = Inference.cmh(data.toDF("st", "e", "o"), Seq("st"),
        col("e"), col("o")).collect()(0)
      assert(r.getLong(1) === strata.map(_._1).sum, s"trial $trial a")
      orBrute match {
        case Some(v) => assert(r.getLong(2) === v, s"trial $trial or")
        case None => assert(r.isNullAt(2), s"trial $trial or-null")
      }
    }
  }

  test("generative: anovaF ssb/ssw match BigInt floor moments") {
    for (trial <- 1 to 4) {
      val k = 2 + gen.nextInt(3)
      val data = for {
        g <- 1 to k
        _ <- 1 to (3 + gen.nextInt(12))
      } yield (gen.nextInt(50).toLong, s"g$g")
      val groups = data.groupBy(_._2).values.toSeq
      val b = groups.map { rows =>
        val s = BigInt(rows.map(_._1).sum); (s * s) / rows.size
      }.sum
      val s = BigInt(data.map(_._1).sum)
      val q = data.map(r => BigInt(r._1) * r._1).sum
      val ssbBrute = ((b - (s * s) / data.size) max BigInt(0)).toLong
      val sswBrute = (q - b).toLong
      val r = Inference.anovaF(data.toDF("v", "g"), col("v"), col("g"))
        .collect()(0)
      assert((r.getLong(2), r.getLong(3)) === ((ssbBrute, sswBrute)),
        s"trial $trial")
    }
  }

  test("generative: friedman matches within-block doubled-rank accounting") {
    for (trial <- 1 to 4) {
      val k = 3 + gen.nextInt(2)
      val b = 3 + gen.nextInt(5)
      val data = for (blk <- 1 to b; t <- 1 to k)
        yield (blk.toLong, s"t$t", gen.nextInt(5).toLong)
      def r2(blk: Long, y: Long) = {
        val ys = data.filter(_._1 == blk).map(_._3)
        2L * ys.count(_ < y) + ys.count(_ == y) + 1L
      }
      val a2 = data.map { case (blk, _, y) =>
        val v = BigInt(r2(blk, y)); v * v }.sum
      val c2 = BigInt(b) * k * (k + 1) * (k + 1)
      val num = data.groupBy(_._2).values.map { rows =>
        val rs = BigInt(rows.map(r => r2(r._1, r._3)).sum)
        val dev = rs - BigInt(b) * (k + 1); dev * dev
      }.sum
      val r = Inference.friedman(data.toDF("b", "t", "y"),
        col("b"), col("t"), col("y")).collect()(0)
      assert(r.getLong(2) === (a2 - c2).toLong, s"trial $trial spread")
      if (a2 > c2)
        assert(r.getDouble(3) ===
          (BigInt(k - 1) * num).toDouble / (a2 - c2).toDouble,
          s"trial $trial chi2")
      else assert(r.isNullAt(3), s"trial $trial null")
    }
  }

  test("generative: competingRisks fold matches a sequential ppm recursion") {
    for (trial <- 1 to 4) {
      val subj = Seq.fill(10 + gen.nextInt(40))((
        (1 + gen.nextInt(6)).toLong, gen.nextInt(3)))
      val df = subj.map { case (dur, c) => (dur, c == 1, c == 2) }
        .toDF("dur", "ca", "cb")
      // sequential reference
      var atRisk = subj.size.toLong
      var surv = 1000000L; var cifA = 0L; var cifB = 0L
      val expect = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long, Long, Long, Long)]
      for (dur <- subj.map(_._1).distinct.sorted) {
        val exits = subj.filter(_._1 == dur)
        val dA = exits.count(_._2 == 1).toLong
        val dB = exits.count(_._2 == 2).toLong
        if (dA + dB > 0) {
          val s0 = surv
          surv = s0 * (atRisk - dA - dB) / atRisk
          cifA += s0 * dA / atRisk
          cifB += s0 * dB / atRisk
          expect += ((dur, atRisk, dA, dB, surv, cifA, cifB))
        }
        atRisk -= exits.size
      }
      val got = Inference.competingRisks(df, col("dur"), col("ca"),
        col("cb")).orderBy("duration").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
      assert(got === expect.toSeq, s"trial $trial")
    }
  }

  test("generative: rakingIpf matches a map-based sweep loop") {
    for (trial <- 1 to 4) {
      val xs = 1 to (2 + gen.nextInt(3))
      val ys = Seq("a", "b", "c").take(2 + gen.nextInt(2))
      val sample = for {
        x <- xs; y <- ys
        _ <- 1 to (1 + gen.nextInt(9))
      } yield (x.toLong, y)
      val rowT = xs.map(x => (x.toLong, (10 + gen.nextInt(90)).toLong))
      val colT = ys.map(y => (y, (10 + gen.nextInt(90)).toLong))
      // reference loop over a mutable map
      var w = sample.groupBy(identity).map { case ((x, y), rows) =>
        (x, y) -> BigInt(rows.size) * 1000000 }
      val rt = rowT.toMap; val ct = colT.toMap
      for (_ <- 1 to 4) {
        val rs = w.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
        w = w.map { case ((x, y), v) =>
          (x, y) -> v * rt(x) * 1000000 / rs(x) }
        val cs = w.groupBy(_._1._2).map { case (y, m) => y -> m.values.sum }
        w = w.map { case ((x, y), v) =>
          (x, y) -> v * ct(y) * 1000000 / cs(y) }
      }
      val got = Inference.rakingIpf(sample.toDF("x", "y"), col("x"),
        col("y"), rowT.toDF("x", "target"), colT.toDF("y", "target"),
        iterations = 4)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3))
        .toMap
      assert(got === w.map { case (k, v) => k -> v.toLong }, s"trial $trial")
    }
  }

  // ---- pageTrend ----

  test("pageTrend: strictly increasing treatments give z = 2") {
    // 2 blocks, 3 ordered treatments, y rising with the order:
    // L = 28 (max), E = 24, Var = 4
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 4L), (2L, 20L, 5L), (2L, 30L, 6L)).toDF("b", "t", "y")
    val r = Inference.pageTrend(df, col("b"), col("t"), col("y"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 3L, 56L)))
    assert(r.getDouble(3) === 2.0)
    // the score is the POSITION in the order (10/20/30 weigh 1/2/3),
    // which the l2 = 56 above already proves
  }

  test("pageTrend: incomplete blocks drop; reversed order flips the sign") {
    val df = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L),
      (2L, 10L, 6L), (2L, 20L, 5L), (2L, 30L, 4L),
      (3L, 10L, 9L)).toDF("b", "t", "y") // block 3 incomplete
    val r = Inference.pageTrend(df, col("b"), col("t"), col("y"))
      .collect()(0)
    assert(r.getLong(0) === 2L && r.getDouble(3) === -2.0)
  }

  // ---- bowkerSymmetry ----

  test("bowkerSymmetry: per-pair milli terms over discordant cells") {
    // (0,1)x3 vs (1,0)x1 -> 4000/4 = 1000 milli; (0,2)x2 vs (2,0)x2 -> 0
    val df = (Seq.fill(3)((0L, 1L)) ++ Seq((1L, 0L)) ++
      Seq.fill(2)((0L, 2L)) ++ Seq.fill(2)((2L, 0L)) ++ Seq((1L, 1L)))
      .toDF("a", "b")
    val r = Inference.bowkerSymmetry(df, col("a"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((9L, 2L, 1000L)))
  }

  test("bowkerSymmetry: perfect symmetry scores 0; one-sided pairs count") {
    val sym = Seq((0L, 1L), (1L, 0L), (2L, 2L)).toDF("a", "b")
    assert(Inference.bowkerSymmetry(sym, col("a"), col("b"))
      .collect()(0).getLong(2) === 0L)
    // a pair observed in only one direction still contributes fully
    val oneSided = Seq((0L, 1L), (0L, 1L)).toDF("a", "b")
    val r = Inference.bowkerSymmetry(oneSided, col("a"), col("b"))
      .collect()(0)
    assert(r.getLong(1) === 1L && r.getLong(2) === 2000L)
  }

  // ---- seasonalNaiveMase / pinballLoss ----

  test("seasonalNaiveMase: identity series scores 7e6 ppm; gaps drop") {
    // y = day on days 1..9: seasonal AE 7, naive AE 1 on days 8 and 9
    val df = (1L to 9L).map(t => ("g", t, t)).toDF("g", "day", "y")
    val r = Stats.seasonalNaiveMase(df, Seq("g"), col("day"), col("y"))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((2L, 14L, 2L, 7000000L)))
    // a missing day-8 means day 9 has no naive lag: nothing scores
    val gap = ((1L to 7L) :+ 9L).map(t => ("g", t, t)).toDF("g", "day", "y")
    assert(Stats.seasonalNaiveMase(gap, Seq("g"), col("day"), col("y"))
      .count() === 0L)
  }

  test("theilTracking: identity series gives U2 = 7 and a +2 tracking signal") {
    // y = day on 1..9: e = 7, en = 1 on days 8 and 9
    val df = (1L to 9L).map(t => ("g", t, t)).toDF("g", "day", "y")
    val r = Stats.theilTracking(df, Seq("g"), col("day"), col("y"))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 14L, 14L)))
    assert(r.getDouble(4) === math.sqrt(98.0 / 2.0))
    assert(r.getDouble(5) === 2.0 * 14.0 / 14.0)
  }

  test("pinballLoss: asymmetric milli weights around the quantile") {
    // q = 10 at p = 0.9: y = 8 costs 100*2, y = 13 costs 900*3
    val test = Seq(("g", 8L), ("g", 13L)).toDF("g", "y")
    val q = Seq(("g", 10L)).toDF("g", "value")
    val r = Stats.pinballLoss(test, Seq("g"), col("y"), q, pMille = 900)
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((10L, 2L, 2900L, 1450L)))
  }

  // ---- cmh ----

  test("cmh: single stratum (3,1,1,3) gives OR 9 and the hand chi2") {
    val df = (Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false)))
      .map { case (e, o) => ("s1", e, o) }.toDF("st", "e", "o")
    val r = Inference.cmh(df, Seq("st"), col("e"), col("o")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 3L, 9000L)))
    // E6 = 2e6, Var6 = 256e6 // 448 = 571428
    assert(r.getDouble(3) === 1.0e12 / 571428.0e6)
  }

  test("cmh: identical strata pool cleanly; no-discordant strata NULL the OR") {
    val one = (Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false)))
    val df = (one.map { case (e, o) => ("s1", e, o) } ++
      one.map { case (e, o) => ("s2", e, o) }).toDF("st", "e", "o")
    val r = Inference.cmh(df, Seq("st"), col("e"), col("o")).collect()(0)
    assert(r.getLong(2) === 9000L)
    assert(r.getDouble(3) === 4.0e12 / 1142856.0e6)
    val diag = Seq(("s1", true, true), ("s1", false, false))
      .toDF("st", "e", "o")
    val r2 = Inference.cmh(diag, Seq("st"), col("e"), col("o")).collect()(0)
    assert(r2.isNullAt(2) && r2.getDouble(3) === 1.0)
  }

  // ---- dunnPosthoc ----

  test("dunnPosthoc: two separated groups, hand z off the shared rank pool") {
    val df = (Seq(1L, 2L).map((_, "a")) ++ Seq(3L, 4L).map((_, "b")))
      .toDF("v", "g")
    val rows = Inference.dunnPosthoc(df, col("v"), col("g")).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)) ===
      (("a", "b", 2L, 2L)))
    assert(r.getDouble(4) === (6.0 / 2.0 - 14.0 / 2.0) /
      (2.0 * math.sqrt(((20.0 - 0.0 / 3.0) / 12.0) *
        (1.0 / 2.0 + 1.0 / 2.0))))
  }

  test("dunnPosthoc: k groups emit every unordered pair once") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a")).toDF("v", "g")
    val rows = Inference.dunnPosthoc(df, col("v"), col("g")).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  // ---- vocabRichness / goodTuringDiscounts ----

  test("vocabRichness: hand spectrum; no-doubleton corpus NULLs chao1") {
    import graft.pipeline.{TextAnalysis => TA}
    // bigrams: "a b" x2, "a c" x1 -> S=2, N=3, f1=1, f2=1
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val r = TA.vocabRichness(docs, n = 2).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((3L, 2L, 1L, 1L, 2L, 2L, 333333L)))
    val one = Seq("a b").toDF("text")
    val r2 = TA.vocabRichness(one, n = 2).collect()(0)
    assert(r2.isNullAt(4) && r2.getLong(5) === 1L &&
      r2.getLong(6) === 1000000L)
  }

  test("goodTuringDiscounts: c* = (c+1) N_{c+1} / N_c on a hand spectrum") {
    import graft.pipeline.{TextAnalysis => TA}
    // spectrum: one singleton gram, one doubleton gram
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val rows = TA.goodTuringDiscounts(docs, n = 2).orderBy("c").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq((1L, 1L, 1L, 2000L), (2L, 1L, 0L, 0L)))
  }

  // ---- hodgesLehmannShift ----

  test("hodgesLehmannShift: median of cross differences, doubled midpoint") {
    // A=[1,2], B=[2,4]: diffs {0,1,2,3} -> HL = 1.5 (hl2 = 3)
    val df = (Seq(1L, 2L).map((_, false)) ++ Seq(2L, 4L).map((_, true)))
      .toDF("v", "b")
    val r = Inference.hodgesLehmannShift(df, col("v"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 3L, 1500L)))
  }

  test("hodgesLehmannShift: bin multiplicities weight the median") {
    // A = two zeros, B = one 1: the only diff is 1 with weight 2
    val df = (Seq(0L, 0L).map((_, false)) ++ Seq(1L).map((_, true)))
      .toDF("v", "b")
    val r = Inference.hodgesLehmannShift(df, col("v"), col("b")).collect()(0)
    assert(r.getLong(2) === 2L && r.getLong(3) === 1000L)
  }

  // ---- kaplanMeierGreenwood ----

  test("kaplanMeierGreenwood: bands match the hand variance factor; " +
    "all-die step parks the sentinel") {
    // exits (1,death),(2,death),(2,cens),(3,death): risk 4,3,1
    val df = Seq((1L, false), (2L, false), (2L, true), (3L, false))
      .toDF("dur", "cens")
    val rows = Inference.kaplanMeierGreenwood(df, col("dur"), col("cens"))
      .orderBy("duration").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq ===
      Seq((1L, 750000L, 83333333333L), (2L, 500000L, 249999999999L),
        (3L, 0L, -1L)))
    val se1 = 750000.0 * math.sqrt(83333333333L.toDouble / 1.0e12)
    assert(rows(0).getDouble(5) === 750000.0 - 1.96 * se1)
    assert(rows(0).getDouble(6) === 750000.0 + 1.96 * se1)
    assert(rows(2).isNullAt(5) && rows(2).isNullAt(6))
    // surv column must stay bit-identical to the plain kaplanMeier fold
    val km = Inference.kaplanMeier(df, col("dur"), col("cens"))
      .orderBy("duration").collect().map(_.getLong(3)).toSeq
    assert(rows.map(_.getLong(3)).toSeq === km)
  }

  // ---- moodMedianTest ----

  test("moodMedianTest: perfectly separated groups give chi2 = N, V = 1") {
    // g1=[1..4], g2=[5..8]: grand med2 = 9, the split is exact
    val df = (Seq(1L, 2L, 3L, 4L).map((_, "a")) ++
      Seq(5L, 6L, 7L, 8L).map((_, "b"))).toDF("v", "g")
    val r = Inference.moodMedianTest(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((9L, 8L, 1L, 8000L)))
    assert(r.getDouble(4) === 1.0)
  }

  // ---- runsTest ----

  test("runsTest: perfectly alternating sequence, hand z") {
    // T,F,T,F,T: n1=2, n2=3, R=5; E = 12/5+1, Var = 84/100
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, false),
      (5L, true)).toDF("t", "b")
    val r = Inference.runsTest(df, col("t"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 3L, 5L)))
    assert(r.getDouble(3) ===
      (5.0 - (12.0 / 5.0 + 1.0)) / math.sqrt(84.0 / 100.0))
  }

  test("runsTest: a one-sided sequence has no defined z") {
    val df = Seq((1L, true), (2L, true)).toDF("t", "b")
    val r = Inference.runsTest(df, col("t"), col("b")).collect()(0)
    assert(r.getLong(2) === 1L && r.isNullAt(3))
  }

  // ---- wilcoxonSignedRank ----

  test("wilcoxonSignedRank: untied vector, zeros drop") {
    // d = [1, 2, -3, 4, 0]: doubled ranks 2,4,6,8; W2+ = 14
    val df = Seq(1L, 2L, -3L, 4L, 0L).toDF("d")
    val r = Inference.wilcoxonSignedRank(df, col("d")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 14L, 0L)))
    assert(r.getDouble(3) ===
      (14.0 - 20.0 / 2.0) / (2.0 * math.sqrt(360.0 / 48.0)))
  }

  test("wilcoxonSignedRank: tie-corrected variance on |d| ties") {
    // d = [1, -1, 2]: |d| ranks (tied pair) 3,3,6 doubled; W2+ = 9; T = 6
    val df = Seq(1L, -1L, 2L).toDF("d")
    val r = Inference.wilcoxonSignedRank(df, col("d")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 9L, 6L)))
    assert(r.getDouble(3) ===
      (9.0 - 12.0 / 2.0) / (2.0 * math.sqrt(162.0 / 48.0)))
  }

  // ---- blandAltman ----

  test("blandAltman: hand bias/sd/limits") {
    // diffs 2, -2, 0: bias 0, sample sd 2
    val df = Seq((10L, 8L), (10L, 12L), (10L, 10L)).toDF("a", "b")
    val r = Inference.blandAltman(df, col("a"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((3L, 0L)))
    assert(r.getDouble(2) === 0.0 && r.getDouble(3) === 2.0)
    assert(r.getDouble(4) === 0.0 - 1.96 * 2.0 &&
      r.getDouble(5) === 0.0 + 1.96 * 2.0)
  }

  // ---- partialCorrelation ----

  test("partialCorrelation: hand moments, chain-exact partial") {
    // x=[1,2,3,4], z=[1,-1,1,-1], y=x+z
    val df = Seq((1L, 2L, 1L), (2L, 1L, -1L), (3L, 4L, 1L), (4L, 3L, -1L))
      .toDF("x", "y", "z")
    val r = Inference.partialCorrelation(df, col("x"), col("y"), col("z"))
      .collect()(0)
    val rxy = 12.0 / (math.sqrt(20.0) * math.sqrt(20.0))
    val rxz = -8.0 / (math.sqrt(20.0) * math.sqrt(16.0))
    val ryz = 8.0 / (math.sqrt(20.0) * math.sqrt(16.0))
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === rxy && r.getDouble(2) === rxz &&
      r.getDouble(3) === ryz)
    assert(r.getDouble(4) === (rxy - rxz * ryz) /
      (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz)))
  }

  test("partialCorrelation: a ±1 control correlation emits NULL partial") {
    val df = Seq((1L, 1L, 1L), (2L, 3L, 2L), (3L, 2L, 3L)).toDF("x", "y", "z")
    val r = Inference.partialCorrelation(df, col("x"), col("y"), col("z"))
      .collect()(0)
    // the declared sqrt*sqrt chain overshoots 1 by an ulp here — which is
    // exactly why the guard is abs(r) < 1.0, not a NaN check downstream
    assert(r.getDouble(2) === 6.0 / (math.sqrt(6.0) * math.sqrt(6.0)))
    assert(r.getDouble(2) > 1.0 && r.isNullAt(4))
  }

  // ---- cronbachAlpha ----

  test("cronbachAlpha: identical items give alpha 1; incomplete subjects drop") {
    val df = Seq((1L, "i1", 1L), (1L, "i2", 1L), (2L, "i1", 2L),
      (2L, "i2", 2L), (3L, "i1", 3L), (3L, "i2", 3L),
      (4L, "i1", 9L)).toDF("subj", "item", "y") // subj 4 incomplete
    val r = Inference.cronbachAlpha(df, col("subj"), col("item"), col("y"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === (2.0 / 1.0) * (1.0 - 12.0 / 24.0))
  }

  test("cronbachAlpha: perfectly anti-correlated items -> zero total variance, NULL") {
    val df = Seq((1L, "i1", 1L), (1L, "i2", 3L), (2L, "i1", 2L),
      (2L, "i2", 2L), (3L, "i1", 3L), (3L, "i2", 1L)).toDF("subj", "item", "y")
    assert(Inference.cronbachAlpha(df, col("subj"), col("item"), col("y"))
      .collect()(0).isNullAt(2))
  }

  // ---- rakingIpf ----

  test("rakingIpf: uniform sample rakes to skewed column margins exactly") {
    // 2x2 uniform cells; row targets already met, col targets 3:1 ->
    // one sweep converges, further sweeps are exact no-ops
    val samp = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")).toDF("x", "y")
    val rowT = Seq((1L, 2L), (2L, 2L)).toDF("x", "target")
    val colT = Seq(("a", 3L), ("b", 1L)).toDF("y", "target")
    val rows = Inference.rakingIpf(samp, col("x"), col("y"), rowT, colT,
      iterations = 2).orderBy("x", "y").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .toSeq === Seq((1L, "a", 1500000L), (1L, "b", 500000L),
      (2L, "a", 1500000L), (2L, "b", 500000L)))
  }

  // ---- ordinalAssociation ----

  test("ordinalAssociation: hand 2x2 gives gamma 0.6, tau-b 1/3") {
    // x=1: y-counts (2,1); x=2: (1,2) -> C = 4, D = 1; Tx2 = Ty2 = 12
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 2L))
      .toDF("x", "y")
    val r = Inference.ordinalAssociation(df, col("x"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 4L, 1L)))
    assert(r.getDouble(3) === 3.0 / 5.0)
    assert(r.getDouble(4) === 6.0 / (math.sqrt(18.0) * math.sqrt(18.0)))
    assert(r.getDouble(5) === 6.0 / 18.0 && r.getDouble(6) === 6.0 / 18.0)
  }

  test("ordinalAssociation: perfect diagonal gives gamma/somers 1") {
    val df = Seq((1L, 1L), (1L, 1L), (2L, 2L), (2L, 2L)).toDF("x", "y")
    val r = Inference.ordinalAssociation(df, col("x"), col("y")).collect()(0)
    assert(r.getDouble(3) === 1.0 && r.getDouble(5) === 1.0)
    // tau-b is the declared sqrt*sqrt chain: sqrt(8)*sqrt(8) != 8 in IEEE
    assert(r.getDouble(4) === 8.0 / (math.sqrt(8.0) * math.sqrt(8.0)))
  }

  // ---- weightedKappa ----

  test("weightedKappa: hand vector gives qwk 0.5; identity gives 1") {
    // cells (0,0):1 (0,1):1 (1,1):2 -> wo = 1, we = 8, qwk = 1 - 4/8
    val df = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L)).toDF("a", "b")
    val r = Inference.weightedKappa(df, col("a"), col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 1L, 8L)))
    assert(r.getDouble(3) === 0.5)
    val same = Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(Inference.weightedKappa(same, col("a"), col("b"))
      .collect()(0).getDouble(3) === 1.0)
  }

  test("weightedKappa: constant raters have zero expected weight -> NULL") {
    val df = Seq((2L, 2L), (2L, 2L)).toDF("a", "b")
    assert(Inference.weightedKappa(df, col("a"), col("b"))
      .collect()(0).isNullAt(3))
  }

  // ---- cochranQ ----

  test("cochranQ: textbook 4-block 3-treatment vector gives Q = 3") {
    // blocks (1,1,0),(1,0,0),(1,1,1),(0,0,0): C = (3,2,1), R = (2,1,3,0)
    val df = Seq(
      (1L, "a", true), (1L, "b", true), (1L, "c", false),
      (2L, "a", true), (2L, "b", false), (2L, "c", false),
      (3L, "a", true), (3L, "b", true), (3L, "c", true),
      (4L, "a", false), (4L, "b", false), (4L, "c", false))
      .toDF("blk", "t", "s")
    val r = Inference.cochranQ(df, col("blk"), col("t"), col("s"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 3L, 6L)))
    assert(r.getDouble(3) === 3.0)
  }

  test("cochranQ: all-degenerate blocks emit NULL Q") {
    val df = Seq((1L, "a", true), (1L, "b", true),
      (2L, "a", false), (2L, "b", false)).toDF("blk", "t", "s")
    assert(Inference.cochranQ(df, col("blk"), col("t"), col("s"))
      .collect()(0).isNullAt(3))
  }

  // ---- icc ----

  test("icc: ICC(1,1) from the anovaF vector is 23/26") {
    // g1=[1,2,3], g2=[5,6,7]: ssb 24, ssw 4, n0 = 3 -> MSB 24, MSW 1,
    // icc = (24-1)/(24 + 2*1)
    val df = (Seq(1L, 2L, 3L).map((_, "a")) ++ Seq(5L, 6L, 7L).map((_, "b")))
      .toDF("v", "g")
    val r = Inference.icc(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 2L, 24L, 4L)))
    assert(r.getDouble(4) === 3.0)
    assert(r.getDouble(5) === 23.0 / 26.0)
  }

  test("icc: single group emits NULL icc") {
    val df = Seq((1L, "a"), (2L, "a")).toDF("v", "g")
    val r = Inference.icc(df, col("v"), col("g")).collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  // ---- littlesLawAudit ----

  test("littlesLawAudit: sweep equals duration sum; L, W, lambda exact") {
    // [0,10), [5,15), [20,30): integral = 30 both ways; span 30 ->
    // L = 1.0 (micro 1e6), W = 10, lambda = 3*3.6e12/30
    import graft.operators.Intervals
    val df = Seq((0L, 10L), (5L, 15L), (20L, 30L)).toDF("s", "e")
    val r = Intervals.littlesLawAudit(df, col("s"), col("e")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((3L, 30L, 30L, 0L, 30L)))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((1000000L, 10L, 360000000000L)))
  }

  test("littlesLawAudit: zero-length intervals occupy nothing (half-open)") {
    import graft.operators.Intervals
    val df = Seq((0L, 10L), (5L, 5L)).toDF("s", "e")
    val r = Intervals.littlesLawAudit(df, col("s"), col("e")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 10L, 10L, 0L)))
  }

  // ---- friedman ----

  test("friedman: textbook 3x3 vector gives chi2 = 2") {
    // blocks 1,2 rank t1<t2<t3; block 3 ranks t2<t3<t1:
    // R = 5,5,8 -> 12/(3*3*4)*(25+25+64) - 3*3*4 = 2
    val df = Seq((1L, "t1", 1L), (1L, "t2", 2L), (1L, "t3", 3L),
      (2L, "t1", 1L), (2L, "t2", 2L), (2L, "t3", 3L),
      (3L, "t1", 3L), (3L, "t2", 1L), (3L, "t3", 2L)).toDF("b", "t", "y")
    val r = Inference.friedman(df, col("b"), col("t"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 24L)))
    assert(r.getDouble(3) === 2.0)
  }

  test("friedman: incomplete blocks drop; fully-tied blocks give NULL chi2") {
    // block 4 is missing t3 -> excluded, b stays 3 in the complete set;
    // then an all-tied frame has A2 = C2
    val df = Seq((1L, "t1", 1L), (1L, "t2", 2L), (1L, "t3", 3L),
      (2L, "t1", 1L), (2L, "t2", 2L), (2L, "t3", 3L),
      (3L, "t1", 3L), (3L, "t2", 1L), (3L, "t3", 2L),
      (4L, "t1", 9L), (4L, "t2", 9L)).toDF("b", "t", "y")
    val r = Inference.friedman(df, col("b"), col("t"), col("y")).collect()(0)
    assert(r.getLong(0) === 3L && r.getDouble(3) === 2.0)
    val tied = Seq((1L, "t1", 5L), (1L, "t2", 5L), (2L, "t1", 7L),
      (2L, "t2", 7L)).toDF("b", "t", "y")
    assert(Inference.friedman(tied, col("b"), col("t"), col("y"))
      .collect()(0).isNullAt(3))
  }

  // ---- jonckheereTerpstra ----

  test("jonckheereTerpstra: two separated groups, hand z") {
    // g1=[1,2] < g2=[3,4]: JT = 4 (all 4 cross pairs ascend), jt2 = 8;
    // E2 = (16-8)/2 = 4; var = 5/3 -> z = 4/(2*sqrt(2880/1728))
    val df = (Seq(1L, 2L).map((_, 1L)) ++ Seq(3L, 4L).map((_, 2L)))
      .toDF("v", "g")
    val r = Inference.jonckheereTerpstra(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 8L)))
    assert(r.getDouble(3) === 4.0 / (2.0 * math.sqrt(2880.0 / 1728.0)))
  }

  test("jonckheereTerpstra: all-distinct values still count lower-group mass") {
    // the densify regression pin: with unique values, a sparse per-value
    // prefix sees no lower-group rows at all and zeroes the statistic —
    // g1=[1], g2=[1,2], g3=[2] must give jt2 = 8 (1.5 + 1 + 1.5 doubled)
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L)).toDF("v", "g")
    val r = Inference.jonckheereTerpstra(df, col("v"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 3L, 8L)))
    assert(r.getDouble(3) === 3.0 / (2.0 * math.sqrt(2592.0 / 1728.0)))
  }

  test("jonckheereTerpstra: reversed order flips the sign of z") {
    val df = (Seq(1L, 2L).map((_, 2L)) ++ Seq(3L, 4L).map((_, 1L)))
      .toDF("v", "g")
    val r = Inference.jonckheereTerpstra(df, col("v"), col("g")).collect()(0)
    assert(r.getLong(2) === 0L)
    assert(r.getDouble(3) === -4.0 / (2.0 * math.sqrt(2880.0 / 1728.0)))
  }

  // ---- associationRules ----

  test("associationRules: both directions with support/confidence/lift/conviction") {
    // baskets {1,2},{1,2},{1,3},{2}: pair (1,2) has n_both=2, n_1=n_2=3
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L),
      (4L, 2L)).toDF("b", "i")
    val rows = Features.associationRules(df, col("b"), col("i"),
      minSupport = 2).orderBy("antecedent").collect()
    assert(rows.length === 2)
    val r12 = rows(0)
    assert((r12.getLong(0), r12.getLong(1), r12.getLong(2), r12.getLong(3),
      r12.getLong(4)) === ((1L, 2L, 2L, 3L, 3L)))
    assert((r12.getLong(5), r12.getLong(6), r12.getLong(7), r12.getLong(8))
      === ((500000L, 666666L, 888L, 750L)))
    // reverse direction: same numbers by symmetry of this vector
    assert(rows(1).getLong(6) === 666666L)
  }

  test("associationRules: a rule that never misses has NULL conviction") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("b", "i")
    val rows = Features.associationRules(df, col("b"), col("i"),
      minSupport = 2).collect()
    assert(rows.length === 2 && rows.forall(_.isNullAt(8)))
    assert(rows.forall(_.getLong(6) === 1000000L))
  }

  // ---- crostonDemand ----

  test("crostonDemand: size/interval recursion at alpha 1/5, hand-checked") {
    // demand weeks 1(q=10), 4(q=12+8), 5(q=5); zero-qty rows drop
    val df = Seq(("a", 1L, 10L), ("a", 4L, 12L), ("a", 4L, 8L), ("a", 5L, 5L),
      ("a", 3L, 0L)).toDF("g", "wk", "q")
    val rows = Stats.crostonDemand(df, Seq("g"), col("wk"), col("q"),
      alphaNum = 1, alphaDen = 5).orderBy("period").collect()
    assert(rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSeq === Seq(
      (1L, 10L, 1L, 10000000L, 1000000L, 10000L),
      (4L, 20L, 3L, 12000000L, 1400000L, 8571L),
      (5L, 5L, 1L, 10600000L, 1320000L, 8030L)))
  }

  test("crostonDemand: groups fold independently") {
    val df = Seq(("a", 1L, 10L), ("b", 1L, 99L)).toDF("g", "wk", "q")
    val rows = Stats.crostonDemand(df, Seq("g"), col("wk"), col("q"), 1, 5)
      .orderBy("g").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(4))).toSeq ===
      Seq(("a", 10000000L), ("b", 99000000L)))
  }

  // ---- itsRegression ----

  test("itsRegression: exact per-side fits, slope change, zero level shift") {
    // pre: y = 10x on days 1..4; post: y = 200 - 10x on days 10..13 —
    // both lines pass through (10, 100), so the level shift is exactly 0
    val df = (Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)) ++
      Seq((10L, 100L), (11L, 90L), (12L, 80L), (13L, 70L))).toDF("day", "y")
    val r = Features.itsRegression(df, col("day"), col("y"), breakDay = 10L)
      .collect()(0)
    assert((r.getLong(0), r.getLong(3)) === ((4L, 4L)))
    assert(r.getDouble(1) === 10.0 && r.getDouble(2) === 0.0)
    assert(r.getDouble(4) === -10.0 && r.getDouble(5) === 200.0)
    assert(r.getDouble(6) === -20.0 && r.getDouble(7) === 0.0)
  }

  test("itsRegression: a side with zero x-variance emits NULL fits") {
    val df = Seq((1L, 10L), (2L, 20L), (10L, 50L)).toDF("day", "y")
    val r = Features.itsRegression(df, col("day"), col("y"), breakDay = 10L)
      .collect()(0)
    assert(r.getDouble(1) === 10.0 && r.isNullAt(4) && r.isNullAt(6))
  }
}
