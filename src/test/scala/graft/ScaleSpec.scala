package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Skew, Warehouse}

/** Scale-path utilities: salted joins must be result-equivalent to plain
  * joins; bucketed tables must join without exchanges.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin is result-equivalent to a plain join") {
    // skewed fact: 90% of rows on key 1
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i.toLong))
      .toDF("k", "fact_id")
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), k = 8, factUniquifier = "fact_id")
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // k = 0 would pmod-by-zero every salt to NULL and silently join to
    // nothing — must fail loudly instead
    assertThrows[IllegalArgumentException](
      Skew.saltedJoin(fact, dim, Seq("k"), k = 0, factUniquifier = "fact_id"))
  }

  test("compactBucketed: one file per bucket, content identical, appends keep working") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_compact_bkt").toString
    val wh = new Warehouse(root, spark)
    def parquetFiles(): Seq[java.nio.file.Path] =
      Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet")
          && p.toString.contains("cb"))
        .toSeq
    try {
      wh.writeBucketed("cb", (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v"),
        Seq("k"), nBuckets = 4)
      (1 to 5).foreach(i => wh.appendBucketed("cb",
        Seq((1000L + i, s"a$i")).toDF("k", "v"), Seq("k"), nBuckets = 4))
      val before = spark.table("cb").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(parquetFiles().size > 4, "appends should have left debris")
      wh.compactBucketed("cb", Seq("k"), nBuckets = 4)
      // the forced bucketed scan (autoBucketedScan disabled inside
      // compactBucketed) gives one task per bucket, so the rewrite is
      // exactly one file per bucket with no exchange
      assert(parquetFiles().size === 4,
        s"expected one file per bucket: ${parquetFiles()}")
      assert(spark.table("cb").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap === before)
      // the bucketing survives the rewrite: self-join stays exchange-free
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = spark.table("cb").join(spark.table("cb").select(col("k"),
          col("v").as("v2")), Seq("k"))
        assert(!j.queryExecution.executedPlan.toString.contains("Exchange"))
        assert(j.count() === 205)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // append-after-compaction: the generation table keeps accepting
      wh.appendBucketed("cb", Seq((2000L, "post")).toDF("k", "v"),
        Seq("k"), nBuckets = 4)
      assert(spark.table("cb").count() === 206)
    } finally spark.sql("DROP TABLE IF EXISTS cb")
  }

  test("bucketed tables join with zero exchanges") {
    val wh = new Warehouse(Files.createTempDirectory("graft_bkt").toString, spark)
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    wh.writeBucketed("bkt_left", left, Seq("k"), nBuckets = 4)
    wh.writeBucketed("bkt_right", right, Seq("k"), nBuckets = 4)
    // small tables would broadcast (hiding the bucketing); force the
    // shuffle-join path the tables would take at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() === 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("incremental dedup run 2 never re-signatures the corpus (survives corpus-source deletion)") {
    // the O(delta) claim, proven black-box: after run 1 builds the index,
    // the corpus SOURCE files are deleted outright — run 2 must still
    // produce its delta-touching pairs, because it reads only the delta
    // and the persisted band/shingle index, never corpus text
    import graft.pipeline.IncrementalDedup
    val tmp = Files.createTempDirectory("graft_incdd_s").toString
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, s"alpha beta gamma delta eps zeta token$i tail$i")).toDF("doc_id", "text")
    // doc 100 duplicates corpus doc 1's text exactly; doc 101 is novel
    val corpus = mk(1L to 8L)
    val delta = mk(Seq(101L)).unionByName(
      Seq((100L, "alpha beta gamma delta eps zeta token1 tail1")).toDF("doc_id", "text"))
    corpus.write.parquet(s"$tmp/corpus")
    delta.write.parquet(s"$tmp/delta")
    val wh = new Warehouse(s"$tmp/wh", spark)
    try {
      IncrementalDedup.initRun(wh, "incdd_s", spark.read.parquet(s"$tmp/corpus"),
        n = 3, k = 8, bandSize = 2, threshold = 0.9, nBuckets = 4)
      // delete the corpus source — any run-2 read of it now throws
      wh.deleteRec(java.nio.file.Paths.get(tmp, "corpus"))
      val pairs = IncrementalDedup.deltaRun(wh, "incdd_s",
        spark.read.parquet(s"$tmp/delta"),
        n = 3, k = 8, bandSize = 2, threshold = 0.9, nBuckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.toSet === Set((1L, 100L)),
        s"expected the planted delta-vs-corpus pair, got ${pairs.toSeq}")
      // and the index grew: a THIRD run's delta pairs against doc 100 work
      val pairs3 = IncrementalDedup.deltaRun(wh, "incdd_s",
        Seq((200L, "alpha beta gamma delta eps zeta token1 tail1"))
          .toDF("doc_id", "text"),
        n = 3, k = 8, bandSize = 2, threshold = 0.9, nBuckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs3 === Set((1L, 200L), (100L, 200L)),
        s"appended signatures not visible to the next run: $pairs3")
      // plan shape of the index probe: the corpus band table arrives
      // bucketed (zero corpus-side exchange) — only the delta shuffles
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val dBanded = Seq((300L, "alpha beta gamma delta eps zeta fresh new"))
          .toDF("doc_id", "text")
          .select($"doc_id".as("id"),
            graft.pipeline.Dedup.minhashSignature(
              graft.pipeline.TextAnalysis.wordShingles($"text", 3), 8).as("sig"))
          .select($"id", $"sig",
            explode(graft.pipeline.Dedup.lshBands($"sig", 2, 4)).as("b"))
          .select($"id", $"b.band".as("band"), $"b.value".as("value"))
        val probe = dBanded.join(spark.table("incdd_s_bands"), Seq("band", "value"))
        val plan = probe.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
        val nExchanges = plan.linesIterator.count(_.contains("Exchange"))
        assert(nExchanges === 1, s"expected the delta-side exchange only:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally Seq("incdd_s_bands", "incdd_s_sh").foreach(wh.drop)
  }

  test("incremental-dedup index compaction bounds file count across delta runs") {
    // VERDICT r7 next-7: an append-only signature index accretes one
    // part-file per bucket per run — linear file growth, the corpus-scale
    // small-file explosion. With the cadence wired into deltaRun, the
    // data-file count must stay bounded by the budget no matter how many
    // runs land, and correctness must survive the generation rewrites.
    import graft.pipeline.IncrementalDedup
    val wh = new Warehouse(Files.createTempDirectory("graft_incdd_c").toString, spark)
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, s"alpha beta gamma delta eps zeta token$i tail$i")).toDF("doc_id", "text")
    try {
      IncrementalDedup.initRun(wh, "incdd_c", mk(1L to 8L),
        n = 3, k = 8, bandSize = 2, threshold = 0.9, nBuckets = 4)
      val budget = 4 * 2 // nBuckets * compactAboveFilesPerBucket
      (1 to 6).foreach { i =>
        IncrementalDedup.deltaRun(wh, "incdd_c", mk(Seq(1000L + i)),
          n = 3, k = 8, bandSize = 2, threshold = 0.9, nBuckets = 4,
          compactAboveFilesPerBucket = 2).count()
        // invariant AFTER every run: at most one uncompacted batch over
        // budget (the compaction check runs post-append)
        Seq("incdd_c_bands", "incdd_c_sh").foreach { t =>
          val n = wh.bucketedFileCount(t)
          assert(n <= budget + 4, s"run $i: $t at $n files (budget $budget + one batch)")
        }
      }
      // without the cadence, 1 init + 6 appends at up to 4 files each would
      // sit near 28 files; compaction must have actually fired
      assert(wh.bucketedFileCount("incdd_c_bands") < 28)
      // correctness across generation rewrites: a delta matching doc 1's
      // text still pairs against the original corpus signature
      val pairs = IncrementalDedup.deltaRun(wh, "incdd_c",
        Seq((9000L, "alpha beta gamma delta eps zeta token1 tail1"))
          .toDF("doc_id", "text"),
        n = 3, k = 8, bandSize = 2, threshold = 0.9, nBuckets = 4,
        compactAboveFilesPerBucket = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 9000L)), s"post-compaction probe pairs: $pairs")
    } finally Seq("incdd_c_bands", "incdd_c_sh").foreach(wh.drop)
  }

  test("bucketed incremental merge keeps bucket metadata across generations; zero-exchange self-join") {
    val wh = new Warehouse(Files.createTempDirectory("graft_bkt_inc").toString, spark)
    try {
      wh.writeBucketed("bkt_inc", (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
        Seq("k"), nBuckets = 4)
      wh.mergeBucketed("bkt_inc", Seq((1L, "V1"), (9001L, "new")).toDF("k", "v"),
        Seq("k"), nBuckets = 4)
      val out = spark.table("bkt_inc").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.size === 501 && out(1L) === "V1" && out(9001L) === "new" && out(2L) === "v2")
      // second merge cycles back to the other generation path
      wh.mergeBucketed("bkt_inc", Seq((2L, "V2")).toDF("k", "v"), Seq("k"), nBuckets = 4)
      val out2 = spark.table("bkt_inc").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out2(2L) === "V2")
      // bucket layout survived the generation swaps: a key self-join plans
      // with ZERO exchanges (the property the per-run merge join rides)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = spark.table("bkt_inc")
          .join(spark.table("bkt_inc").withColumnRenamed("v", "v2"), Seq("k"))
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"expected exchange-free bucketed self-join:\n$plan")
        assert(j.count() === 501)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_inc")
  }

  test("tri-state violations compiles to a single pass, not a union of scans") {
    import graft.operators.TriStateRules
    val base = Seq(
      (1L, Some(7), Some("r")), (2L, Some(1), None), (3L, None, Some("x")))
      .toDF("member_id", "gap_flag", "closure_reason")
    val rules = TriStateRules("gap_flag", Seq("member_id"),
      closedRequires = Seq("closure_reason"),
      notQualifiedForbids = Seq("closure_reason"))
    val out = rules.violations(base)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), s"expected single-pass plan, got:\n$plan")
    assert(plan.contains("Generate"))
    // and the semantics still match the per-family filters
    val reasons = out.collect().map(r => r.getLong(1) -> r.getString(0)).toSet
    assert(reasons === Set(
      1L -> "A_FLAG_NOT_0_1_NULL",
      2L -> "C_CLOSED_MISSING_REQUIRED",
      3L -> "D_NOT_QUALIFIED_HAS_FORBIDDEN"))
  }

  test("partitioned upsert rewrites ONLY touched buckets (untouched files byte-identical)") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_upsert_part").toString
    val wh = new Warehouse(root, spark)
    val batch1 = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    wh.upsertPartitioned("t", batch1, Seq("k"), nBuckets = 8)

    def fileState(): Map[String, (Long, String)] = {
      val dir = java.nio.file.Paths.get(root, "t")
      Files.walk(dir).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map { p =>
          val bytes = Files.readAllBytes(p)
          val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          dir.relativize(p).toString -> (Files.size(p), md.map("%02x".format(_)).mkString)
        }.toMap
    }
    val before = fileState()
    assert(before.keySet.map(_.split("/")(0)).size === 8, "expected 8 bucket dirs")

    // second batch: one updated key + one new key -> at most 2 buckets touched
    val batch2 = Seq((1L, "V1-upd"), (9001L, "new")).toDF("k", "v")
    wh.upsertPartitioned("t", batch2, Seq("k"), nBuckets = 8)
    val after = fileState()

    val touchedBuckets = batch2
      .select(org.apache.spark.sql.functions.pmod(hash(col("k")), lit(8)).as("b"))
      .distinct().collect().map(r => s"__graft_bucket=${r.getInt(0)}").toSet
    val untouchedBefore = before.filterNot { case (p, _) => touchedBuckets.contains(p.split("/")(0)) }
    val untouchedAfter  = after.filterNot { case (p, _) => touchedBuckets.contains(p.split("/")(0)) }
    assert(untouchedBefore === untouchedAfter,
      s"untouched bucket files changed; touched=$touchedBuckets")

    // and the merge semantics are intact
    val out = wh.read("t").select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 201 && out(1L) === "V1-upd" && out(9001L) === "new" && out(2L) === "v2")

    // READ side of the upsert: the PRODUCTION pruned-read path
    // (touchedBucketScan, the exact scan upsertPartitioned merges over)
    // must reach the scan as a STATIC partition filter — a broadcast
    // semi-join looks right but DPP declines it without stats and re-reads
    // the whole target
    val restricted = wh.touchedBucketScan("t", "__graft_bucket", Seq(1, 3))
    val planStr = restricted.queryExecution.executedPlan.toString
    val partFilters = "PartitionFilters: \\[[^\\]]*".r
      .findFirstIn(planStr).getOrElse("")
    assert(partFilters.contains("IN (1,3)"),
      s"expected a static IN partition filter on the scan, got: $partFilters")
  }

  test("freeLocalCheckpoint actually releases checkpoint blocks (unpersist does not)") {
    import org.apache.spark.sql.GraftSqlBridge
    // assert on the SPECIFIC checkpoint RDD id — global persistent-RDD
    // counts race the asynchronous ContextCleaner
    def registered(ids: Seq[Int]): Boolean =
      ids.exists(spark.sparkContext.getPersistentRDDs.contains)
    val cp = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").localCheckpoint(true)
    val ids = GraftSqlBridge.localCheckpointRddIds(cp)
    assert(ids.nonEmpty && registered(ids), "checkpoint should register a persistent RDD")
    cp.unpersist() // the trap: clears nothing for checkpoint storage
    assert(registered(ids), "Dataset.unpersist must be a no-op here")
    GraftSqlBridge.freeLocalCheckpoint(cp)
    assert(!registered(ids), "freeLocalCheckpoint must release the RDD")
  }

  test("compact collapses append debris and preserves partition layout") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_compact").toString
    val wh = new Warehouse(root, spark)
    def parquetFiles(name: String): Seq[String] = {
      val d = java.nio.file.Paths.get(root, name)
      Files.walk(d).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => d.relativize(p).toString).toSeq
    }
    // plain table: 12 appends -> many files -> one
    wh.writeSwap("t", Seq((0L, "v")).toDF("k", "v"))
    (1 to 12).foreach(i => wh.append("t", Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(parquetFiles("t").size >= 13)
    val before = wh.read("t").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    wh.compact("t")
    assert(parquetFiles("t").size === 1)
    assert(wh.read("t").collect().map(r => r.getLong(0) -> r.getString(1)).toMap === before)

    // partitioned (streaming upsert) table: layout survives, files per bucket drop
    val big = (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v")
    wh.upsertPartitioned("p", big, Seq("k"), nBuckets = 4)
    (1 to 6).foreach(i =>
      wh.upsertPartitioned("p", Seq((i.toLong, s"u$i")).toDF("k", "v"), Seq("k"), nBuckets = 4))
    val contentBefore = wh.read("p").select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    wh.compact("p")
    val files = parquetFiles("p")
    assert(files.forall(_.startsWith("__graft_bucket=")), s"layout lost: $files")
    assert(files.map(_.split("/")(0)).distinct.size === 4)
    assert(files.size === 4, s"expected one file per bucket: $files")
    assert(wh.read("p").select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap === contentBefore)
  }

  test("stratifiedSplit plans one shared exchange for both window functions") {
    import graft.pipeline.Sampling
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "st")
    val out = Sampling.stratifiedSplit(df, Seq("st"), $"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val plan = out.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges === 1,
      s"expected the rank and count windows to share ONE shuffle:\n$plan")
  }

  test("packSequences plans ONE exchange shared by the position and token windows") {
    import graft.pipeline.Sampling
    val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "ntok")
    val out = Sampling.packSequences(df, $"id", $"ntok", seqLen = 16, nShards = 4)
    val plan = out.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges === 1, s"expected one shared shuffle:\n$plan")
  }

  test("bloom decontaminate: the clean branch reads map-side only (no exchange before the union)") {
    import graft.pipeline.Contamination
    val corpus = (0L until 300L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" % 60 === 0)
    val out = Contamination.decontaminate(corpus, bench, m = 256, k = 2)
    // sparkPlan, not executedPlan: AQE hides the tree behind
    // AdaptiveSparkPlanExec until execution
    val plan = out.queryExecution.sparkPlan
    // the union's FIRST child (bloom-negatives) must be exchange-free: those
    // rows are proven clean map-side and never shuffle
    val union = plan.collectFirst {
      case u: org.apache.spark.sql.execution.UnionExec => u }.get
    val cleanBranch = union.children.head
    val exchanges = cleanBranch.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"bloom-negative branch must not shuffle:\n$cleanBranch")
  }

  test("invertedIndex posting cap is a map-side WindowGroupLimit, df rollup partial-aggregates") {
    import graft.pipeline.TextAnalysis
    val df = (1L to 200L).map(i => (i, s"tok${i % 9} tok${i % 5} filler$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(df, minDf = 2, maxPostings = 3)
    val plan = out.queryExecution.executedPlan.toString
    // partial (pre-shuffle) + final group-limit: a stopword token's posting
    // list must be pruned to maxPostings in the map task, not the reducer
    val nGroupLimits = "WindowGroupLimit".r.findAllIn(plan).length
    assert(nGroupLimits === 2, s"expected partial+final WindowGroupLimit:\n$plan")
  }

  test("temperatureSample's derived-rate filter pushes to the scan (no exchange)") {
    import graft.pipeline.Sampling
    val dir = java.nio.file.Files.createTempDirectory("graft_temp_scan").toString
    try {
      (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "src")
        .write.mode("overwrite").parquet(dir)
      val stored = spark.read.parquet(dir)
      val out = Sampling.temperatureSample(stored, "src", $"id", budget = 100, salt = "p")
      val plan = out.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exchanges.isEmpty, s"sampling filter must be a pure scan filter:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("Count-Min register build partial-aggregates before its single exchange") {
    import graft.functions.Sketches
    val df = (1L to 500L).map(i => (i, s"v${i % 40}")).toDF("id", "v")
    val out = Sketches.cmRegisters(df, Nil, $"v", d = 4, w = 64)
    val plan = out.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges === 1, s"one shuffle on (row,col):\n$plan")
    assert("partial_count".r.findAllIn(plan).nonEmpty,
      s"map-side combine must precede the exchange:\n$plan")
  }

  test("streaming merge resumes after a mid-commit crash (checkpoint replay + marker recovery)") {
    import graft.streaming.EventsStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val wh = new Warehouse(Files.createTempDirectory("graft_stream_crash").toString, spark)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("k", "v")
    mem.addData((1L, "a"), (2L, "b"))
    val q1 = EventsStream.mergeStream(stream, wh, "m", Seq("k"), nBuckets = 4)
    q1.awaitTermination()
    assert(wh.read("m").count() === 2)
    // the second batch dies right after the intent marker — the worst
    // window of the staged upsert commit (old bucket data deleted next)
    mem.addData((2L, "B2"), (3L, "c"))
    wh.failpoint = p =>
      if (p == "slice:marker") throw new RuntimeException(s"injected crash at $p")
    val q2 = EventsStream.mergeStream(stream, wh, "m", Seq("k"), nBuckets = 4)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](q2.awaitTermination())
    // restart: the failed batch's offsets were never committed, so
    // foreachBatch replays it; recover() first completes the interrupted
    // swap, then the replayed merge is idempotent on the recovered state
    wh.failpoint = _ => ()
    val q3 = EventsStream.mergeStream(stream, wh, "m", Seq("k"), nBuckets = 4)
    q3.awaitTermination()
    val out = wh.read("m").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("valueRanks windows the ROLLED-UP values: HashAggregate strictly below Window") {
    import graft.operators.Ranking
    val df = (1L to 500L).map(i => (s"g${i % 3}", i % 20)).toDF("g", "v")
    val out = Ranking.valueRanks(df, Seq("g"), $"v")
    val plan = out.queryExecution.executedPlan.toString
    // the raw-row rollup must happen BEFORE the window (the point of the
    // operator: the cumsum sorts distinct values, never raw rows)
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx,
      s"expected Window ABOVE (printed before) HashAggregate:\n$plan")
    // both rank columns share one Window operator / one sort
    assert("Window \\[".r.findAllIn(plan).length === 1, plan)
  }

  test("bm25TermScores broadcasts stats and df - the corpus side never shuffles wide") {
    import graft.pipeline.TextAnalysis
    val df = (1L to 200L).map(i => (i, s"the doc $i of words")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TermScores(df, Seq("the", "of"))
    val plan = out.queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
      s"df and corpus stats must ride broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no wide join expected:\n$plan")
  }

  test("drop removes bucketed-table state: catalog entry, generation dirs, gen sidecar") {
    val wh = new Warehouse(Files.createTempDirectory("graft_bktdrop").toString, spark)
    val rows = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    wh.writeBucketed("bkt_drop_t", rows, Seq("k"), nBuckets = 4)
    wh.mergeBucketed("bkt_drop_t", rows.filter($"k" <= 10), Seq("k"), nBuckets = 4)
    assert(spark.table("bkt_drop_t").count() === 100)
    wh.drop("bkt_drop_t")
    // a "dropped" bucketed table must not stay readable from its @a/@b
    // generation dir, and a recreate must not inherit a stale gen pointer
    assert(!spark.catalog.tableExists("bkt_drop_t"))
    assert(!Files.exists(java.nio.file.Paths.get(wh.root, "bkt_drop_t@a")))
    assert(!Files.exists(java.nio.file.Paths.get(wh.root, "bkt_drop_t@b")))
    assert(wh.getMeta("bkt_drop_t__bktgen").isEmpty)
    // the name is immediately reusable through the full lifecycle
    wh.writeBucketed("bkt_drop_t", rows.filter($"k" <= 5), Seq("k"), nBuckets = 4)
    assert(spark.table("bkt_drop_t").count() === 5)
    wh.drop("bkt_drop_t")
  }

  test("window battery (q120 shape): all five functions share ONE exchange and one Window pair") {
    val df = (1L to 400L).map(i => (s"f${i % 3}", i, i % 20)).toDF("g", "id", "qty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"qty".asc, $"id".asc)
    val full = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val out = df.select($"g", $"id", $"qty",
      ntile(4).over(w).as("q4"), percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      first($"qty").over(full).as("mn"), last($"qty").over(full).as("mx"))
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"five window functions over one (partition, order) must share one shuffle:\n$plan")
    // running-frame and full-frame functions need two Window operators max
    assert("Window \\[".r.findAllIn(plan).length <= 2, plan)
  }

  test("web curation ops are exchange-free narrow maps (q141/q143/q144/q146 shape)") {
    import graft.pipeline.{TextAnalysis, Web}
    val docs = Seq((1L, "the quick brown fox"), (2L, "spark at scale"))
      .toDF("doc_id", "text")
    val html = concat(lit("<p>"), $"text",
      lit("</p><a href=\"https://ads.tracker.net/x\"></a><a href=\"https://OK.site:443/p\"></a>"))
    val out = docs.select($"doc_id",
      TextAnalysis.tokenCount(TextAnalysis.stripHtml(html)).as("n_tokens"),
      TextAnalysis.canonicalizeUrl(lit("HTTP://A.B:80/x?b=2&a=1#f")).as("u"),
      Web.blockedByDomain(lit("https://cdn.example.com/x"), Seq("example.com")).as("b"),
      size(filter(Web.extractLinks(html), l =>
        !Web.blockedByDomain(TextAnalysis.canonicalizeUrl(l.getField("href")),
          Seq("tracker.net")))).as("n_links"))
    out.collect() // force execution so executedPlan is final
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-page curation must stay a narrow map:\n$plan")
  }

  test("randomProjection is an exchange-free narrow map (q174 shape)") {
    import graft.pipeline.Similarity
    val vecs = Seq((1L, Array(1.0f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(vecs, inDim = 4, outDim = 8, salt = "t")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"JL projection must stay a narrow map:\n$plan")
    // the sign matrix rides as literals, never as a per-row md5
    assert(!plan.toLowerCase.contains("md5"), s"per-row hashing crept in:\n$plan")
  }

  test("continuouslyEnrolled: islands pay ONE member-keyed shuffle (q187 shape)") {
    import graft.operators.GapEngine
    def d(s: String) = java.sql.Date.valueOf(s)
    val spans = (1L to 200L).map(i =>
      (i % 40, d(s"2024-0${(i % 6) + 1}-01"), d(s"2024-0${(i % 6) + 2}-15")))
      .toDF("member_id", "cov_start", "cov_end")
    val out = GapEngine.continuouslyEnrolled(spans,
      lit(d("2024-02-01")), lit(d("2024-05-01")))
    // no collect: a finalized AQE plan stringifies final+initial subtrees
    // and double-counts every Exchange (q120 pin does the same)
    val plan = out.queryExecution.executedPlan.toString
    // both mergeIntervals windows + the island aggregate + the distinct
    // share the member_id partitioning: exactly one hash exchange
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"islands -> eligibility must reuse one member-keyed shuffle:\n$plan")
    // the tolerant variant adds the island-gap lead() + verdict aggregate,
    // which must ALSO ride the same partitioning (a re-sort, never a
    // second exchange)
    val tol = GapEngine.continuouslyEnrolledTolerant(spans,
      lit(d("2024-02-01")), lit(d("2024-05-01")), maxGapDays = 30, maxGaps = 1)
    val tolPlan = tol.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(tolPlan).length === 1,
      s"tolerant enrollment must stay one member-keyed shuffle:\n$tolPlan")
  }

  test("fuzzyLink never degenerates to a cartesian/broadcast-nested-loop") {
    import graft.operators.FuzzyLink
    val m = Seq((1L, "mercy general hospital")).toDF("id", "k")
    val out = FuzzyLink.link(m, $"id", $"k", m, $"id", $"k",
      maxDist = 2, blockLen = 4, maxBlockSize = 100)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"blocking must keep the candidate join an equi-join:\n$plan")
  }

  test("q69 corpus-clean composite: one scan, two group-limited shuffles (plan pin)") {
    // VERDICT r7 next-5: q69 regressed in the driver bench without a code
    // change — pin its plan shape so a real regression (extra scan, lost
    // group-limit prune, a third shuffle) fails HERE instead of surfacing
    // as a bench surprise. Shape: quality gate + fingerprint + hash all in
    // the scan's project; the ONLY wide ops are the two dedup/quota
    // windows, both group-limit pruned map-side.
    val out = SparkEntry.queries("q69_corpus_clean_pipeline")(
      spark, "/root/testdata/sf0.001")
    out.collect() // force execution so executedPlan (and AQE) is final
    // AQE's toString prints BOTH the final and the initial plan — count
    // operators in the final section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(plan).length === 1,
      s"composite must read documents exactly once:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2,
      s"only the fingerprint window and the per-source cap may shuffle:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank filters must prune map-side (WindowGroupLimit):\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("streaming merge upserts into the warehouse across microbatches") {
    import graft.streaming.EventsStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val wh = new Warehouse(Files.createTempDirectory("graft_stream_wh").toString, spark)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("k", "v")
    mem.addData((1L, "a"), (2L, "b"))
    val q1 = EventsStream.mergeStream(stream, wh, "merged", Seq("k"))
    q1.awaitTermination()
    assert(wh.read("merged").count() === 2)
    mem.addData((2L, "B2"), (3L, "c"))
    val q2 = EventsStream.mergeStream(stream, wh, "merged", Seq("k"))
    q2.awaitTermination()
    val out = wh.read("merged").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("rfm never global-sorts raw customers: no ntile, quantile windows above rollups") {
    import graft.operators.Features
    val orders = (1L to 300L).map(i =>
      (i % 50, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays((i % 200).toInt)), (i % 90) * 10.0)).toDF("cust", "odate", "amt")
    val out = Features.rfm(orders, "cust", "odate", "amt")
    val plan = out.queryExecution.executedPlan.toString
    // the anti-pattern rfm avoids: ntile's global single-partition window
    assert(!plan.contains("ntile"), s"boundary scoring must not ntile:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"bounds/anchor must broadcast, never wide-join:\n$plan")
    // each quantile Window sits above a HashAggregate rollup (distinct
    // values only — the exactQuantiles discipline): below the first
    // Window (printed after it) another rollup must appear
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("HashAggregate", winIdx) > winIdx, plan)
  }

  test("targetEncode: fact rows join the category rollup by broadcast only") {
    import graft.operators.Features
    val df = (1L to 400L).map(i => (i, s"c${i % 9}", i % 70)).toDF("k", "cat", "t")
    val out = Features.targetEncode(df, $"k", $"cat", $"t")
    val plan = out.queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
      s"per-category stats and the global mean must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must never wide-join:\n$plan")
  }

  test("corrMatrix: all moments in ONE pass — single exchange to a 1-row agg") {
    import graft.operators.Features
    val df = (1L to 500L).map(i => (i * 0.01, (i % 37) * 0.02, (i % 11) * 0.05))
      .toDF("x", "y", "z")
    val out = Features.corrMatrix(df, Seq("x" -> Features.cents($"x"),
      "y" -> Features.cents($"y"), "z" -> Features.cents($"z")))
    val plan = out.queryExecution.executedPlan.toString
    // partial agg below, final agg above, exactly one exchange between —
    // the whole 15-moment profile costs one scan of the input
    assert("Exchange".r.findAllIn(plan).length === 1,
      s"one single-row exchange expected:\n$plan")
    assert(!plan.contains("Join"), s"no join belongs in a one-pass profile:\n$plan")
  }

  test("ewmaDaily is window-free: spine + weight fan-out + keyed partial aggs") {
    import graft.pipeline.Stats
    val df = (1L to 300L).map(i => ("g" + i % 3, 100L + i % 40, i % 5))
      .toDF("grp", "day", "y")
    val out = Stats.ewmaDaily(df, Seq("grp"), $"day", $"y", 1, 4, 14)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"EWMA must come from keyed aggs, never a running window:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("labelPropagation rounds stay equi-keyed: no cartesian, no nested-loop") {
    import graft.operators.Graph
    val edges = (1L to 300L).map(i => (i % 40, (i % 23) + 40)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", rounds = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"every LPA round must join on the node key:\n$plan")
  }

  test("vocab coverage (q213 shape): top-k via TakeOrdered, window only above it") {
    val docs = (1L to 200L).map(i => (i, s"tok${i % 17} tok${i % 5} the a of"))
      .toDF("doc_id", "text")
    val counts = docs.select(explode(graft.pipeline.TextAnalysis.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy($"cnt".desc, $"token".asc).limit(200)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be per-partition heads + k-row merge:\n$plan")
  }

  test("chiSquareCells: marginals broadcast back onto the cell rollup") {
    import graft.operators.Features
    val df = (1L to 400L).map(i => (s"a${i % 7}", s"b${i % 5}")).toDF("a", "b")
    val out = Features.chiSquareCells(df, $"a", $"b")
    val plan = out.queryExecution.executedPlan.toString
    // raw rows shuffle ONCE for the (a,b) rollup; marginals/grand total are
    // rollups of that rollup and must come back as broadcasts
    assert("BroadcastExchange".r.findAllIn(plan).length >= 3,
      s"row/col/grand marginals must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"cells must never wide-join their marginals:\n$plan")
  }

  test("autocorr: ONE sort serves every lag; moments partial-aggregate") {
    import graft.pipeline.Stats
    val df = (1L to 300L).map(i => ("g" + i % 3, 100L + i % 50, i % 7))
      .toDF("grp", "day", "y")
    val out = Stats.autocorr(df, Seq("grp"), $"day", $"y", maxLag = 5)
    val plan = out.queryExecution.executedPlan.toString
    // all five lead-k columns ride a single Window node over one sort —
    // a per-lag window would multiply the sort cost by maxLag
    assert("Window".r.findAllIn(plan).length === 1,
      s"expected exactly one Window for all lags:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("containmentPairs: shingle-keyed joins, never cartesian") {
    import graft.pipeline.Dedup
    val docs = (1L to 60L).map(i =>
      (i, (0 until 6).map(j => s"w${(i + j) % 19}").mkString(" "), s"blk${i % 2}"))
      .toDF("doc_id", "text", "block")
    val out = Dedup.containmentPairs(docs, "block", n = 3, threshold = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must equi-join on (block, shingle):\n$plan")
  }

  test("rrfFuse re-rank compiles to WindowGroupLimit above the fused rollup") {
    import graft.pipeline.Similarity
    val l1 = (1L to 200L).map(i => (i % 20, i, (i % 5 + 1).toInt))
      .toDF("query_id", "neighbor_id", "rank")
    val l2 = (1L to 200L).map(i => (i % 20, i + 3, (i % 5 + 1).toInt))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.rrfFuse(Seq(l1, l2), k = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must prune map-side before the final window:\n$plan")
  }

  test("rewriteZOrdered: second-dimension slab lands in fewer files than linear layout") {
    import graft.engine.Warehouse
    val wh = new Warehouse(
      java.nio.file.Files.createTempDirectory("graft_zorder").toString, spark)
    val grid = spark.range(0, 65536).select(
      (col("id") / 256).cast("long").as("x"), (col("id") % 256).as("y"),
      col("id").as("payload"))
    // linear layout: 32 x-range files — a y-slab lives in EVERY file
    wh.writeSwap("zt", grid.repartitionByRange(32, col("x"))
      .sortWithinPartitions(col("x")))
    def slabFiles() = wh.read("zt").filter(col("y") >= 32 && col("y") < 48)
      .select(input_file_name()).distinct().count()
    val before = slabFiles()
    wh.rewriteZOrdered("zt", "x", "y", numFiles = 32)
    val after = slabFiles()
    // the slab is 1/16 of the space: the Morton layout confines it to a
    // fraction of the files where the linear layout smeared it over all
    assert(before === 32L)
    assert(after < before, s"z-order should localize the slab: $after vs $before")
    // content identical through the rewrite
    assert(wh.read("zt").count() === 65536L)
    assert(wh.read("zt").agg(sum(col("payload"))).collect()(0).getLong(0)
      === (0L until 65536L).sum)
  }

  test("jaroWinkler probe match is broadcast + narrow map (q215 shape)") {
    import graft.plans.Expressions
    val parts = (1L to 300L).map(i => (i, s"name variant $i")).toDF("pk", "nm")
    val probes = parts.filter($"pk" % 100 === 0)
      .select($"pk".as("probe_key"), $"nm".as("probe_name"))
    val out = parts.crossJoin(broadcast(probes))
      .select($"probe_key", $"pk",
        Expressions.jaroWinkler($"probe_name", $"nm").as("jw"))
      .filter($"jw" >= 0.85)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the catalog side must never shuffle for a broadcast probe set:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
