package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Unit vectors for the Snowflake-semantics helpers (SURVEY §2.7 caveats). */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ageOf(birth: String, asOf: String): Int =
    Seq((birth, asOf)).toDF("b", "a")
      .select(ageAt(to_date($"b"), to_date($"a")).as("age"))
      .collect()(0).getInt(0)

  test("ageAt: anniversary adjustment (int_gap_col_status.sql:39-43 semantics)") {
    assert(ageOf("1970-01-01", "2025-12-31") === 55)
    // birthday exactly on asOf: anniversary passed -> full year counts
    assert(ageOf("1950-06-15", "2025-06-15") === 75)
    // day before birthday: not yet
    assert(ageOf("1950-06-15", "2025-06-14") === 74)
    // leap-day birth: add_months clamps to Feb-28 in non-leap years,
    // so the anniversary counts on Feb-28 (FIXTURES.md §4 vector)
    assert(ageOf("1980-02-29", "2025-02-28") === 45)
    assert(ageOf("1980-02-29", "2025-02-27") === 44)
  }

  test("surrogateKey: exact md5 recipe incl. NULL coalesce (fct_gap_exceptions.sql:9-16)") {
    val got = Seq((Some(1L), "COL")).toDF("member_id", "measure_id")
      .select(surrogateKey($"member_id", $"measure_id").as("k"))
      .collect()(0).getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("1|COL".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === md)
    // NULL -> '' per the coalesce path (FIXTURES.md §4)
    val gotNull = Seq(Tuple1[java.lang.Long](null)).toDF("member_id")
      .select(surrogateKey($"member_id", lit("COL")).as("k"))
      .collect()(0).getString(0)
    val mdNull = java.security.MessageDigest.getInstance("MD5")
      .digest("|COL".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(gotNull === mdNull)
  }

  test("safeCastIntegral agrees with try_cast on every string shape") {
    val vectors = Seq("123", " 42 ", "+7", "-0", "5-LOW", "", "12.5", "1e3",
      "99999999999999999999", "0x1F", "  ", "\t9\t", "９")
    val df = vectors.toDF("s")
      .select($"s", safeCastIntegral($"s", "int").as("fast"),
        safeCast($"s", "int").as("slow"))
    df.collect().foreach { r =>
      assert(r.get(1) === r.get(2), s"diverged on '${r.getString(0)}'")
    }
  }

  test("dateSpine month grain is inclusive of both endpoints") {
    assert(dateSpine(spark, "1995-01-01", "1995-12-01", "month").count() === 12)
    assert(dateSpine(spark, "1995-01-01", "1995-01-10", "day").count() === 10)
  }

  test("listAgg sorts, slices, joins") {
    val got = Seq(("g", "b"), ("g", "c"), ("g", "a")).toDF("g", "v")
      .groupBy($"g").agg(listAgg($"v", "|", Some(2)).as("l"))
      .collect()(0).getString(1)
    assert(got === "a|b")
  }

  test("triStateFlag keeps NULL as the third state") {
    val rows = Seq((true, true), (true, false), (false, false))
      .toDF("q", "c")
      .select(triStateFlag($"q", $"c").as("f"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(rows.toSeq === Seq(Some(1), Some(0), None))
  }

  test("generateSeries matches spark.range semantics") {
    assert(generateSeries(spark, 5).as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("listAggBy orders by the key with value tie-break; desc reverses") {
    val df = Seq(("g", "x", 2), ("g", "y", 1), ("g", "z", 2)).toDF("g", "v", "k")
    def agg(desc: Boolean, limit: Option[Int] = None) = df.groupBy($"g")
      .agg(listAggBy($"v", $"k", ",", limit, desc).as("l")).collect()(0).getString(1)
    assert(agg(desc = false) === "y,x,z") // k asc, v asc within k=2
    assert(agg(desc = true) === "z,x,y")  // k desc, v desc within k=2
    assert(agg(desc = true, Some(2)) === "z,x")
  }

  test("HLL sketch: estimate within 3 sigma of exact; register merge is associative") {
    import graft.functions.Sketches
    val n = 20000
    val vals = spark.range(n).select((col("id") * 2654435761L % 1000003L).as("v"))
    val regs = Sketches.hllRegisters(vals, Nil, $"v")
    val est = Sketches.hllEstimate(regs, Nil).collect()(0).getDouble(0)
    val exact = vals.distinct().count().toDouble
    // sigma = 1.04/sqrt(256) ~ 6.5%
    assert(math.abs(est - exact) / exact < 0.195, s"est=$est exact=$exact")
    // registers from two disjoint halves merge (bucket max) to the whole
    val h1 = Sketches.hllRegisters(vals.filter($"v" % 2 === 0), Nil, $"v")
    val h2 = Sketches.hllRegisters(vals.filter($"v" % 2 =!= 0), Nil, $"v")
    val merged = h1.unionByName(h2).groupBy($"hll_bucket")
      .agg(max($"hll_rho").as("hll_rho"))
    // the regroup drops the carried hll_b build parameter — compare registers
    val regsOnly = regs.drop("hll_b")
    assert(merged.exceptAll(regsOnly).isEmpty && regsOnly.exceptAll(merged).isEmpty)
    // NULLs are ignored like COUNT DISTINCT
    val withNulls = vals.unionByName(spark.range(5).select(lit(null).cast("long").as("v")))
    assert(Sketches.hllRegisters(withNulls, Nil, $"v").exceptAll(regs).isEmpty)
    // hex-misaligned b must raise, not silently shear the bucket substring
    Seq(0, 3, 10, 20).foreach { bad =>
      intercept[IllegalArgumentException](Sketches.hllRegisters(vals, Nil, $"v", b = bad))
    }
  }

  test("Count-Min sketch: never undercounts, exact sans collision, sum-mergeable") {
    import graft.functions.Sketches
    // skewed: value v appears (21 - v) times, heavy collisions at w=8
    val vals = spark.range(1, 21).select(explode(sequence(lit(1), col("id"))).as("x"))
      .select(col("x"), col("x").cast("string").as("v"))
    val truth = (1L to 20L).map(v => v.toString -> (21L - v)).toMap
    def check(d: Int, w: Int, expectExact: Boolean): Unit = {
      val regs = Sketches.cmRegisters(vals, Nil, $"v", d, w)
      val probes = vals.select($"v").distinct()
      val est = Sketches.cmEstimate(regs, probes, $"v", d, w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"undercount at d=$d w=$w key $k")
        if (expectExact) assert(est(k) === n, s"collision at d=$d w=$w key $k")
      }
    }
    check(d = 4, w = 1024, expectExact = true) // 20 keys in 1024 cols: no shared cell survives 4 rows
    check(d = 2, w = 8, expectExact = false)   // forced collisions still never undercount
    // registers from disjoint halves merge by SUM to the whole
    val regs = Sketches.cmRegisters(vals, Nil, $"v", 4, 64)
    val h1 = Sketches.cmRegisters(vals.filter($"x" % 2 === 0), Nil, $"v", 4, 64)
    val h2 = Sketches.cmRegisters(vals.filter($"x" % 2 =!= 0), Nil, $"v", 4, 64)
    val merged = h1.unionByName(h2).groupBy($"cm_row", $"cm_col")
      .agg(sum($"cm_count").as("cm_count"))
    assert(merged.exceptAll(regs).isEmpty && regs.exceptAll(merged).isEmpty)
    // absent key reads 0 through min(coalesce)
    val absent = Sketches.cmEstimate(regs,
      Seq("nope").toDF("v"), $"v", 4, 64).collect()
    assert(absent.length === 1 && absent(0).getLong(1) >= 0L)
    intercept[IllegalArgumentException](Sketches.cmRegisters(vals, Nil, $"v", d = 0))
    intercept[IllegalArgumentException](Sketches.cmRegisters(vals, Nil, $"v", d = 4, w = 1))
  }

  test("log2-histogram sketch: factor-2 quantile bound, mergeable, rejects negatives") {
    import graft.functions.Sketches
    val rng = new scala.util.Random(13)
    val raw = (1 to 2000).map(_ => math.abs(rng.nextLong()) % 50000L) :+ 0L
    val vals = raw.toDF("v")
    val regs = Sketches.histRegisters(vals, Nil, $"v")
    val qs = Seq(100, 500, 900, 1000)
    val got = Sketches.histQuantile(regs, Nil, qs)
      .as[(Int, Long)].collect().toMap
    val sorted = raw.sorted
    qs.foreach { qm =>
      val exact = sorted(math.ceil(qm.toDouble * sorted.size / 1000.0).toInt - 1)
      val est = got(qm)
      assert(est >= exact, s"q$qm: upper bound $est below exact $exact")
      assert(exact == 0L || est < 2 * exact, s"q$qm: $est not within 2x of $exact")
    }
    // registers from disjoint halves merge by SUM to the whole
    val h1 = Sketches.histRegisters(vals.filter($"v" % 2 === 0), Nil, $"v")
    val h2 = Sketches.histRegisters(vals.filter($"v" % 2 =!= 0), Nil, $"v")
    val merged = h1.unionByName(h2).groupBy($"hist_bin")
      .agg(sum($"hist_count").as("hist_count"))
    assert(merged.exceptAll(regs).isEmpty && regs.exceptAll(merged).isEmpty)
    // a negative value must raise, not corrupt quantiles silently
    val ex = intercept[Exception] {
      Sketches.histRegisters(Seq(-1L).toDF("v"), Nil, $"v").collect()
    }
    assert(ex.getMessage.contains("non-negative"))
  }

  test("NormalizeNfc composes decomposed sequences; equal bytes after canon") {
    import graft.plans.Expressions
    val df = Seq(
      ("e\u0301", "\u00e9"), // e + combining acute vs precomposed
      ("A\u030a", "\u00c5"), // A + combining ring vs precomposed
      ("plain ascii", "plain ascii")) // NFC is identity on ASCII
      .toDF("decomposed", "composed")
    val out = df.select(
      Expressions.normalizeNfc($"decomposed").as("n"),
      $"composed", length($"decomposed").as("lr"), length(col("n")).as("ln"))
    out.collect().foreach { r =>
      assert(r.getString(0) === r.getString(1))
    }
    // md5 equality after canon — the dedup-relevant property
    val hashes = df.select(
      md5(Expressions.normalizeNfc($"decomposed")) === md5($"composed"))
      .collect().map(_.getBoolean(0))
    assert(hashes.forall(identity))
    // NULL propagates
    assert(df.select(Expressions.normalizeNfc(lit(null).cast("string")))
      .collect()(0).isNullAt(0))
  }

  test("dbt_utils surface: starExcept / getColumnValues / safeAdd") {
    import graft.functions.Functions.{getColumnValues, safeAdd, starExcept}
    val df = Seq((1L, "a", Some(2.0), "X"), (2L, "b", None, "Y"),
      (3L, "c", Some(5.0), "X")).toDF("id", "name", "v", "seg")
    // star: case-insensitive except, order preserved
    assert(starExcept(df, Seq("NAME", "v")).columns.toSeq === Seq("id", "seg"))
    assertThrows[IllegalArgumentException](
      starExcept(df, Seq("id", "name", "v", "seg")))
    // get_column_values: sorted distinct, NULLs dropped, cap raises
    assert(getColumnValues(df, "seg") === Seq("X", "Y"))
    assert(getColumnValues(df.withColumn("seg",
      when($"id" === 1, lit(null)).otherwise($"seg")), "seg") === Seq("X", "Y"))
    assertThrows[IllegalArgumentException](
      getColumnValues(df, "id", maxValues = 2))
    // safe_add: NULL as 0, single column passes through
    val sums = df.select(safeAdd($"v", $"id")).collect().map(_.getDouble(0))
    assert(sums.toSeq === Seq(3.0, 2.0, 8.0))
    assertThrows[IllegalArgumentException](safeAdd())
  }

  // ---- mergeable quantile summary (QuantileSketch) ----

  test("quantile summary: hand compress vector, rank preservation, weight conservation") {
    import graft.functions.QuantileSketch._
    // values 1..5 once each, k=2: tot=5, s=ceil(5/2)=3 -> kept ranks
    // {3 (stride), 5 (max)} with telescoped weights {3, 2}
    val regs = qsRegisters(Seq(1L, 2L, 3L, 4L, 5L).toDF("v"), Nil, $"v")
    val c = qsCompress(regs, Nil, k = 2).collect()
      .map(r => r.getAs[Long]("qs_value") -> r.getAs[Long]("qs_weight")).toMap
    assert(c === Map(3L -> 3L, 5L -> 2L))
    // kept cumulative weights ARE original ranks: cum(3)=3, cum(5)=5
    // weight conservation through any k
    for (k <- Seq(2, 3, 64)) {
      val tot = qsCompress(regs, Nil, k).agg(sum($"qs_weight")).collect()(0).getLong(0)
      assert(tot === 5L)
    }
    // k >= distinct values: compress is the identity on exact registers
    val id = qsCompress(regs, Nil, k = 64).collect()
      .map(r => r.getAs[Long]("qs_value") -> r.getAs[Long]("qs_weight")).toMap
    assert(id === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // negative weights raise (div-floor parity would silently corrupt)
    val neg = Seq((1L, 2L), (2L, -1L)).toDF("qs_value", "qs_weight")
    val e = intercept[Exception](qsCompress(neg, Nil, k = 4).collect())
    assert(e.getMessage.contains("non-negative register weights"))
  }

  test("quantile summary: interpolated cuts == interpolatedQuantiles on exact registers; weighted hand vector") {
    import graft.functions.QuantileSketch._
    val raw = Seq(10L, 20L, 20L, 30L, 50L).toDF("v")
    val viaRegs = qsQuantileInterp(qsRegisters(raw, Nil, $"v"), Nil,
      Seq(0, 250, 500, 750, 1000)).collect()
      .map(r => r.getAs[Int]("q_mille") -> r.getAs[Long]("value_micro")).toMap
    val direct = graft.pipeline.Stats.interpolatedQuantiles(raw, Nil, $"v",
      Seq(0, 250, 500, 750, 1000)).collect()
      .map(r => r.getAs[Int]("q_mille") -> r.getAs[Long]("value_micro")).toMap
    assert(viaRegs === direct)
    // hand values: n=5, p = q*(n-1)/1000; p50 -> index 2 exactly -> 20;
    // p25 -> position 1.0 exact -> 20; p75 -> position 3.0 -> 30
    assert(viaRegs(500) === 20000000L && viaRegs(250) === 20000000L &&
      viaRegs(750) === 30000000L && viaRegs(0) === 10000000L &&
      viaRegs(1000) === 50000000L)
    // weighted registers ARE the multiset: {10 x3, 40 x1} at p500 ->
    // position 0.5*(4-1) = 1.5 -> lo = idx1 = 10, hi = idx2 = 10 -> 10e6;
    // p900 -> position 2.7 -> lo = idx2 = 10, hi = idx3 = 40 ->
    // 10e6 + 700*30*1000 = 31e6
    val wregs = Seq((10L, 3L), (40L, 1L)).toDF("qs_value", "qs_weight")
    val wq = qsQuantileInterp(wregs, Nil, Seq(500, 900)).collect()
      .map(r => r.getAs[Int]("q_mille") -> r.getAs[Long]("value_micro")).toMap
    assert(wq === Map(500 -> 10000000L, 900 -> 31000000L))
  }

  test("quantile summary: exact-register merge is lossless and union-associative") {
    import graft.functions.QuantileSketch._
    val all = (1L to 1000L).toDF("v")
    val a = qsRegisters(all.filter($"v" % 3 === 0), Nil, $"v")
    val b = qsRegisters(all.filter($"v" % 3 === 1), Nil, $"v")
    val cc = qsRegisters(all.filter($"v" % 3 === 2), Nil, $"v")
    // merge = bag union + compress (which pre-rolls equal values), so
    // any union ORDER compresses identically — associativity by
    // construction, pinned on both groupings
    val left = qsCompress(a.unionByName(b).unionByName(cc), Nil, k = 16)
    val right = qsCompress(cc.unionByName(b).unionByName(a), Nil, k = 16)
    assert(left.exceptAll(right).isEmpty && right.exceptAll(left).isEmpty)
    // and equals compressing the registers of the full multiset directly
    val direct = qsCompress(qsRegisters(all, Nil, $"v"), Nil, k = 16)
    assert(left.exceptAll(direct).isEmpty && direct.exceptAll(left).isEmpty)
  }

  test("quantile summary: rank-error bound per level; cuts on exact registers are exact") {
    import graft.functions.QuantileSketch._
    val n = 1000L
    val regs = qsRegisters((1L to n).toDF("v"), Nil, $"v")
    // uncompressed: qsQuantile == exact percentile_disc (value v at
    // per-mille q over 1..1000 is exactly ceil(q*n/1000) = q)
    val exact = qsQuantile(regs, Nil, Seq(250, 500, 750, 990)).collect()
      .map(r => r.getAs[Int]("q_mille") -> r.getAs[Long]("value")).toMap
    assert(exact === Map(250 -> 250L, 500 -> 500L, 750 -> 750L, 990 -> 990L))
    // one level at k=20: s = ceil(1000/20) = 50; every cut value's true
    // rank (== value here) must lie in [target, target + s)
    val c1 = qsCompress(regs, Nil, k = 20)
    val cut1 = qsQuantile(c1, Nil, Seq(250, 500, 750, 990)).collect()
      .map(r => r.getAs[Int]("q_mille") -> r.getAs[Long]("value")).toMap
    cut1.foreach { case (q, v) =>
      val t = q.toLong // target rank = q*1000/1000
      assert(v >= t && v < t + 50, s"q=$q v=$v outside [t, t+s)")
    }
    // two levels (split-merge-recompress): strides add, bound stays
    val a = qsCompress(qsRegisters((1L to n).filter(_ % 2 == 0).toDF("v"), Nil, $"v"), Nil, 20)
    val b = qsCompress(qsRegisters((1L to n).filter(_ % 2 == 1).toDF("v"), Nil, $"v"), Nil, 20)
    val merged = qsCompress(a.unionByName(b), Nil, k = 20)
    val cut2 = qsQuantile(merged, Nil, Seq(250, 500, 750, 990)).collect()
      .map(r => r.getAs[Int]("q_mille") -> r.getAs[Long]("value")).toMap
    // s_a = s_b = ceil(500/20) = 25, s_merge = 50 -> bound 100
    cut2.foreach { case (q, v) =>
      val t = q.toLong
      assert(v >= t && v < t + 100, s"q=$q v=$v outside two-level bound")
    }
  }

  test("kmvRegisters: k smallest distinct keys, partition-invariant, merge law holds") {
    import graft.functions.Sketches
    val df = (0L until 500L).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toDF("g", "id")
    val regs = Sketches.kmvRegisters(df, Seq("g"), col("id"), 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // exactly k per group, and they ARE the k lexicographically-smallest
    // md5 keys (brute-force ground truth via the same key expression)
    val truth = df.select(col("g"), Sketches.kmvKey(col("id")).as("k"),
      col("id").cast("string").as("i")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3)).take(8).toSet)
    assert(regs.length === 16)
    for (g <- Seq("a", "b"))
      assert(regs.filter(_._1 == g).toSet === truth(g), s"group $g")
    // partition layout must not matter
    val reparts = Sketches.kmvRegisters(df.repartition(7), Seq("g"), col("id"), 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(reparts === regs.toSet)
    // merge law: bottomK(A u B) == bottomK(bottomK(A) u bottomK(B))
    val a = Sketches.kmvRegisters(df.filter(col("id") < 250), Seq("g"), col("id"), 8)
    val b = Sketches.kmvRegisters(df.filter(col("id") >= 250), Seq("g"), col("id"), 8)
    val merged = Sketches.kmvMerge(a.unionByName(b), Seq("g"), 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(merged === regs.toSet)
    // duplicate ids collapse (DISTINCT semantics)
    val dup = Sketches.kmvRegisters(df.unionByName(df), Seq("g"), col("id"), 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(dup === regs.toSet)
  }

  test("kmvWeightedRegisters: replicated-multiset law, merge law, weight payload, estimator reads total weight") {
    import graft.functions.Sketches
    val df = (0L until 100L).map(i => ("g", i, i % 3L + 1L))
      .toDF("g", "id", "w")
    val regs = Sketches.kmvWeightedRegisters(df, Seq("g"), col("id"),
      col("w"), 8)
    // the aggregate must run on the object-hash path (bounded partial,
    // not a collect_set materialization)
    assert(regs.queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"))
    val got = regs.collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    // ground truth: the bottom-8 of the weight-replicated multiset, via
    // the same md5 sub-key expression
    val truth = df
      .select(col("id").cast("string").as("i"), col("w"),
        explode(sequence(lit(0L), col("w") - 1L)).as("j"))
      .select(md5(concat(col("i"), lit("#"), col("j").cast("string"))).as("k"),
        col("i"), col("w")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).take(8).toSet
    assert(got === truth)
    // partition layout must not matter (exercises partial serialize/merge)
    val reparts = Sketches.kmvWeightedRegisters(df.repartition(7), Seq("g"),
      col("id"), col("w"), 8).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(reparts === got)
    // merge law: bottomK(A u B) == merge(bottomK(A), bottomK(B)), weights
    // carried; idempotent under re-merge
    val a = Sketches.kmvWeightedRegisters(df.filter(col("id") < 50),
      Seq("g"), col("id"), col("w"), 8)
    val b = Sketches.kmvWeightedRegisters(df.filter(col("id") >= 50),
      Seq("g"), col("id"), col("w"), 8)
    val merged = Sketches.kmvWeightedMerge(a.unionByName(b), Seq("g"), 8)
    assert(merged.collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet === got)
    assert(Sketches.kmvWeightedMerge(merged.unionByName(merged), Seq("g"), 8)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet === got)
    // a group whose TOTAL WEIGHT fits under k is exhaustive, and the
    // distinct estimator then reads the exact total weight (distinct
    // sub-items = sum of weights over distinct ids)
    val small = (0L until 10L).map(i => ("s", i, 2L)).toDF("g", "id", "w")
    val est = Sketches.kmvDistinctEstimate(
      Sketches.kmvWeightedRegisters(small, Seq("g"), col("id"), col("w"), 64)
        .drop("kmv_w"), Seq("g"), 64).collect()(0)
    assert(est.getAs[Long]("n_regs") === 20L &&
      est.getAs[Long]("est_distinct") === 20L)
    // out-of-range weight raises in-plan, never silently corrupts
    val bad = Sketches.kmvWeightedRegisters(
      Seq(("g", 1L, 0L)).toDF("g", "id", "w"), Seq("g"), col("id"), col("w"), 8)
    val ex = intercept[Throwable](bad.collect())
    assert(ex.getMessage.contains("weight out of"), ex.getMessage)
  }

  test("kmvDistinctEstimate: exhaustive groups exact, estimator within sampling error, conv parity anchor") {
    import graft.functions.Sketches
    // engine-parity anchor: Spark's conv(hex, 16, 10) must equal DuckDB's
    // CAST('0x...' AS BIGINT) on the md5('hello') prefix (pinned value)
    val anchor = spark.range(1)
      .select(conv(substring(md5(lit("hello")), 1, 15), 16, 10).cast("long"))
      .head().getLong(0)
    assert(anchor === 419982666956583591L)
    // a group with < k distinct ids is counted EXACTLY
    val small = (0L until 20L).map(i => ("s", i)).toDF("g", "id")
    val es = Sketches.kmvDistinctEstimate(
      Sketches.kmvRegisters(small, Seq("g"), col("id"), 64), Seq("g"), 64)
      .collect()(0)
    assert(es.getAs[Long]("n_regs") === 20L &&
      es.getAs[Long]("est_distinct") === 20L)
    // 10000 distinct ids at k=64: deterministic estimate, inside the
    // ~3/sqrt(k-2) envelope (38%) of truth — and derived EXACTLY from the
    // kth register's 15-hex prefix (the law replayed here)
    val big = (0L until 10000L).map(i => ("b", i * 7L + 3L)).toDF("g", "id")
    val regs = Sketches.kmvRegisters(big, Seq("g"), col("id"), 64)
    val eb = Sketches.kmvDistinctEstimate(regs, Seq("g"), 64).collect()(0)
    val kth = regs.agg(max(col("kmv_key"))).head().getString(0)
    val kthNum = java.lang.Long.parseLong(kth.take(15), 16)
    assert(eb.getAs[Long]("kth_num") === kthNum)
    assert(eb.getAs[Long]("est_distinct") ===
      (BigInt(63) * BigInt(1152921504606846976L) / BigInt(kthNum)).toLong)
    val est = eb.getAs[Long]("est_distinct").toDouble
    assert(est > 6200 && est < 13800, s"estimate $est implausibly far from 10000")
  }

  test("kmvJaccard: exhaustive sketches give EXACT Jaccard; estimator replays the union-sample law") {
    import graft.functions.Sketches
    def regs(ids: Seq[Long], k: Int) =
      Sketches.kmvRegisters(ids.map(i => ("g", i)).toDF("g", "id"),
        Nil, col("id"), k)
    // A = 1..10, B = 6..15, k = 64 >> |A u B|: both exhaustive, Jaccard
    // exact = 5/15
    val a = (1L to 10L); val b = (6L to 15L)
    val exact = Sketches.kmvJaccard(regs(a, 64), regs(b, 64), 64).collect()(0)
    assert((exact.getAs[Long]("n_union"), exact.getAs[Long]("n_overlap"),
      exact.getAs[Long]("j_ppm")) === ((15L, 5L, 333333L)))
    // k = 6 < |A u B|: deterministic ESTIMATE — replay the law by hand
    // (bottom-6 keys of the union, membership in each side's bottom-6)
    val ra = regs(a, 6); val rb = regs(b, 6)
    val got = Sketches.kmvJaccard(ra, rb, 6).collect()(0)
    val keysA = ra.collect().map(_.getString(0)).toSet
    val keysB = rb.collect().map(_.getString(0)).toSet
    val union6 = (keysA ++ keysB).toSeq.sorted.take(6)
    val overlap = union6.count(x => keysA(x) && keysB(x)).toLong
    assert((got.getAs[Long]("n_union"), got.getAs[Long]("n_overlap"),
      got.getAs[Long]("j_ppm")) ===
      ((6L, overlap, overlap * 1000000L / 6L)))
    // disjoint sets read zero
    val dj = Sketches.kmvJaccard(regs(1L to 5L, 64), regs(100L to 104L, 64), 64)
      .collect()(0)
    assert(dj.getAs[Long]("n_overlap") === 0L && dj.getAs[Long]("j_ppm") === 0L)
  }

  test("kmvJaccardMatrix: every pair equals the two-sketch kmvJaccard; exhaustive pairs exact") {
    import graft.functions.Sketches
    val df = ((1L to 10L).map(("a", _)) ++ (6L to 15L).map(("b", _)) ++
      (1L to 20L by 2).map(("c", _))).toDF("g", "id")
    for (k <- Seq(6, 64)) { // estimating and exhaustive regimes
      val regs = Sketches.kmvRegisters(df, Seq("g"), col("id"), k)
      val m = Sketches.kmvJaccardMatrix(regs, "g", k).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("n_union"), r.getAs[Long]("n_overlap"),
            r.getAs[Long]("j_ppm"))).toMap
      assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
      for (((g1, g2), got) <- m) {
        def side(g: String) = regs.filter(col("g") === g)
          .select(col("kmv_key"), col("kmv_id"))
        val solo = Sketches.kmvJaccard(side(g1), side(g2), k).collect()(0)
        assert(got === ((solo.getAs[Long]("n_union"),
          solo.getAs[Long]("n_overlap"), solo.getAs[Long]("j_ppm"))),
          s"pair ($g1,$g2) k=$k")
      }
    }
    // exhaustive ground truth: |a n b| = 5, |a u b| = 15; |a n c| = 5
    // (odd 1..9), |a u c| = 15; |b n c| = 4 (7,9,11,13... odd in 6..15 =
    // 7,9,11,13,15 -> 5), |b u c| = 15
    val exact = Sketches.kmvJaccardMatrix(
      Sketches.kmvRegisters(df, Seq("g"), col("id"), 64), "g", 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_union"), r.getAs[Long]("n_overlap"))).toMap
    assert(exact(("a", "b")) === ((15L, 5L)))
    assert(exact(("a", "c")) === ((15L, 5L)))
    assert(exact(("b", "c")) === ((15L, 5L)))
  }

  test("kmvSetOps: exhaustive pairs exact; estimator replays the scaled union-sample law; disjoint and nested edges") {
    import graft.functions.Sketches
    def regs(ids: Seq[Long], k: Int) =
      Sketches.kmvRegisters(ids.map(i => ("g", i)).toDF("g", "id"),
        Nil, col("id"), k)
    // A = 1..10, B = 6..15, k = 64 >> |A u B|: everything exact —
    // est_* equal the true cardinalities, containments exact
    val a = (1L to 10L); val b = (6L to 15L)
    val ex = Sketches.kmvSetOps(regs(a, 64), regs(b, 64), 64).collect()(0)
    assert((ex.getAs[Long]("n_union"), ex.getAs[Long]("n_both"),
      ex.getAs[Long]("n_only_a"), ex.getAs[Long]("n_only_b")) ===
      ((15L, 5L, 5L, 5L)))
    assert((ex.getAs[Long]("est_union"), ex.getAs[Long]("est_both"),
      ex.getAs[Long]("est_only_a"), ex.getAs[Long]("est_only_b")) ===
      ((15L, 5L, 5L, 5L)))
    // cont_a = |A n B| / |A| = 5/10 exactly (the union sample's A-members
    // ARE A when exhaustive)
    assert(ex.getAs[Long]("cont_a_ppm") === 500000L)
    assert(ex.getAs[Long]("cont_b_ppm") === 500000L)
    // k = 6 < |A u B|: replay the law by hand — union bottom-6,
    // membership per side, (k-1)/U(k) union estimate, scaled counts
    val ra = regs(a, 6); val rb = regs(b, 6)
    val got = Sketches.kmvSetOps(ra, rb, 6).collect()(0)
    val keysA = ra.collect().map(_.getString(0)).toSet
    val keysB = rb.collect().map(_.getString(0)).toSet
    val union6 = (keysA ++ keysB).toSeq.sorted.take(6)
    val nBoth = union6.count(x => keysA(x) && keysB(x)).toLong
    val nOnlyA = union6.count(x => keysA(x) && !keysB(x)).toLong
    val kthNum = java.lang.Long.parseLong(union6.last.take(15), 16)
    val estU = (BigInt(5) * BigInt(1152921504606846976L) / BigInt(kthNum)).toLong
    assert(got.getAs[Long]("kth_num") === kthNum)
    assert(got.getAs[Long]("est_union") === estU)
    assert(got.getAs[Long]("est_both") ===
      (BigInt(nBoth) * BigInt(estU) / BigInt(6)).toLong)
    assert(got.getAs[Long]("est_only_a") ===
      (BigInt(nOnlyA) * BigInt(estU) / BigInt(6)).toLong)
    assert(got.getAs[Long]("cont_a_ppm") ===
      nBoth * 1000000L / got.getAs[Long]("n_a_regs"))
    // disjoint sets: zero intersection, zero containment, est splits
    val dj = Sketches.kmvSetOps(regs(1L to 5L, 64), regs(100L to 104L, 64), 64)
      .collect()(0)
    assert(dj.getAs[Long]("n_both") === 0L &&
      dj.getAs[Long]("est_both") === 0L &&
      dj.getAs[Long]("cont_a_ppm") === 0L)
    assert((dj.getAs[Long]("est_only_a"), dj.getAs[Long]("est_only_b")) ===
      ((5L, 5L)))
    // nested (A ⊂ B): containment of A reads 100%, only-A reads zero
    val nest = Sketches.kmvSetOps(regs(1L to 5L, 64), regs(1L to 20L, 64), 64)
      .collect()(0)
    assert(nest.getAs[Long]("cont_a_ppm") === 1000000L)
    assert(nest.getAs[Long]("n_only_a") === 0L &&
      nest.getAs[Long]("est_only_a") === 0L)
    assert(nest.getAs[Long]("est_union") === 20L)
  }

  test("mgRegisters/mgCompress/mgBound: deterministic cut, lower-bound counts, self-certifying envelope across merges, bounded plan") {
    import graft.functions.Sketches
    // hand data: counts a=10, b=6, c=4, d=3, e=2, f=1 (26 rows), k=3
    val rows = Seq.fill(10)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d") ++ Seq.fill(2)("e") ++ Seq("f")
    val df = rows.zipWithIndex.map { case (v, i) => ("g", v, i) }
      .toDF("g", "v", "i")
    val regs = Sketches.mgRegisters(df, Seq("g"), col("v"), 3)
    // the cut computation must ride the bounded ObjectHashAggregate path
    // (BottomKPairs), never a value-domain rank window
    assert(regs.queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"))
    assert(!regs.queryExecution.executedPlan.toString.contains("Window"))
    // cut = 4th-largest count = 3 -> survivors a=7, b=3, c=1
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getString(1), x.getLong(2))).toSet
    assert(pairs(regs) === Set(("a", 7L), ("b", 3L), ("c", 1L)))
    // partition invariance (exercises the aggregate's partial merge)
    assert(pairs(Sketches.mgRegisters(df.repartition(7), Seq("g"),
      col("v"), 3)) === Set(("a", 7L), ("b", 3L), ("c", 1L)))
    // <= k distinct values: cut 0, counts EXACT
    assert(pairs(Sketches.mgRegisters(
      df.filter(col("v").isin("a", "b", "c")), Seq("g"), col("v"), 3)) ===
      Set(("a", 10L), ("b", 6L), ("c", 4L)))
    // envelope: n=26, stored=11, err=(26-11) div 4=3; every true count
    // within [stored, stored+err], absent values <= err (d=3, e=2, f=1)
    val totals = Seq(("g", 26L)).toDF("g", "n_total")
    val b0 = Sketches.mgBound(regs, Seq("g"), totals, 3).collect()(0)
    assert(b0.getAs[Long]("stored_mass") === 11L &&
      b0.getAs[Long]("err_bound") === 3L)
    for ((v, t) <- Seq("a" -> 10L, "b" -> 6L, "c" -> 4L)) {
      val c = pairs(regs).find(_._1 == v).get._2
      assert(c <= t && t <= c + 3L, s"$v: $c vs $t")
    }
    // merge across two deterministic shards: counter values depend on
    // the tree (hand-derived: shard cuts 2 and 1 -> a3,b1 / a4,b2,c1 ->
    // merged a7,b3,c1 with a 0 cut), and the SAME envelope still
    // certifies every true count — the mergeability theorem
    val s1 = Sketches.mgRegisters(df.filter(col("i") % 2 === 0),
      Seq("g"), col("v"), 3)
    val s2 = Sketches.mgRegisters(df.filter(col("i") % 2 === 1),
      Seq("g"), col("v"), 3)
    val merged = Sketches.mgCompress(s1.unionByName(s2), Seq("g"), 3)
    assert(pairs(merged) === Set(("a", 7L), ("b", 3L), ("c", 1L)))
    val bm = Sketches.mgBound(merged, Seq("g"), totals, 3).collect()(0)
    for ((v, t) <- Seq("a" -> 10L, "b" -> 6L, "c" -> 4L, "d" -> 3L)) {
      val c = pairs(merged).find(_._1 == v).map(_._2).getOrElse(0L)
      assert(c <= t && t <= c + bm.getAs[Long]("err_bound"), s"$v: $c vs $t")
    }
    // no false negative: every value with true count > err_bound is stored
    val heavy = Seq("a" -> 10L, "b" -> 6L, "c" -> 4L, "d" -> 3L,
      "e" -> 2L, "f" -> 1L).filter(_._2 > bm.getAs[Long]("err_bound"))
    assert(heavy.forall(h => pairs(merged).exists(_._1 == h._1)),
      s"missing heavy: $heavy vs ${pairs(merged)}")
    // a negative count raises in-plan, never silently corrupts the cut
    val bad = Sketches.mgCompress(
      Seq(("g", "x", -1L)).toDF("g", "mg_value", "mg_count"), Seq("g"), 3)
    val exn = intercept[Throwable](bad.collect())
    assert(exn.getMessage.contains("negative count"), exn.getMessage)
  }
}
