package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY §2.10): the reference has no streams;
  * its nearest constructs are microbatch event-time windows (I5) and dynamic
  * tables (S8). We expose:
  *  - a watermarked tumbling-window aggregate over the events table
  *    (readStream -> transform -> writeStream), and
  *  - a stateful sessionizer via flatMapGroupsWithState — the engine-level
  *    analogue of the batch sessionize query (q23).
  *
  * Scale notes: the window aggregate is a streaming shuffle keyed by
  * (window, event_type); the watermark bounds state. Sessionization keys by
  * user_id; state per key is O(1). Both run identically on a real cluster —
  * `Trigger.AvailableNow` drives the same code as a live source.
  */
object EventsStream {

  /** Events parquet schema as stored, with `ts` typed the way THIS dataset's
    * files encode it: generations of the driver testdata have shipped both
    * int64-nanos (surfacing as LongType under
    * spark.sql.legacy.parquet.nanosAsLong) and native timestamp[us]. A
    * streaming source must pin a schema up front, so sniff one batch footer
    * and pin what the files actually contain — one footer read per query
    * start, not a per-batch cost, and the same adaptivity the batch reader
    * ([[graft.sources.Sources.events]]) applies per-DataFrame.
    */
  def eventsSchema(spark: SparkSession, sfDir: String): StructType =
    if (new java.io.File(s"$sfDir/events.parquet").exists())
      graft.sources.Sources.table(spark, sfDir, "events").schema
    else
      // empty-at-start streaming: no file to sniff yet, so pin the
      // documented generator schema (ts native timestamp[us] — the current
      // testdata encoding); files later arriving as int64-nanos against a
      // schema pinned this way are a re-generation event, restart the query
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))

  /** Streaming source over the events dir with ts normalized to
    * TimestampType (micros) regardless of on-disk encoding.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val pinned = eventsSchema(spark, sfDir)
    val raw = spark.readStream
      .schema(pinned)
      // the events table is a single parquet file; FileStreamSource needs a
      // directory, so stream the dir with a name filter
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    pinned("ts").dataType.typeName match {
      case "long"          => raw.withColumn("ts", graft.sources.Sources.nsToTimestamp(col("ts")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _               => raw
    }
  }

  /** Streaming source over the documents table (same single-file glob
    * discipline as [[readEvents]]) — the ingest shape of a corpus arriving
    * continuously, for the dedup-on-ingest operators. Schema pinned from
    * one batch footer read at query start.
    */
  def readDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(s"$sfDir/documents.parquet").schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)

  /** Watermarked tumbling-window aggregate (the S8 dynamic-table analogue). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Run a streaming aggregate to completion over the (finite) file source
    * and return the result as a batch DataFrame. `AvailableNow` processes all
    * available data then stops — same operator graph as a live stream.
    */
  def runToBatch(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming-incremental bridge (the dbt microbatch strategy I5 driven by a
    * live source): each microbatch MERGEs into a warehouse table via
    * foreachBatch — dedup on key across batches, latest batch wins.
    *
    * Scale path: the target is key-hash-bucket partitioned and each batch
    * rewrites only its touched buckets ([[graft.engine.Warehouse
    * .upsertPartitioned]]) — per-batch I/O is O(batch), not O(target), which
    * is what keeps a long-running stream viable at 100 TB targets.
    */
  def mergeStream(events: DataFrame, wh: graft.engine.Warehouse, table: String,
      keys: Seq[String], nBuckets: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      // offsets checkpoint under the warehouse: a restarted query resumes
      // instead of replaying; batch replays after a mid-write crash are
      // idempotent (same batch -> same buckets -> same bucket contents)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        wh.upsertPartitioned(table, batch, keys, nBuckets)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming NEAR-DUP bridge: each micro-batch of arriving documents is
    * MinHash-deduped against the persisted signature index via
    * [[graft.pipeline.IncrementalDedup.deltaRun]] — pairs with >= 1 side in
    * the batch append to `pairsTable`, and the batch's signatures join the
    * index, so the stream continuously maintains exactly the state the
    * batch path would have built ([[graft.pipeline.IncrementalDedup]]'s
    * two-run == batch equivalence, PropertySpec). This is dedup-on-ingest
    * for a corpus that arrives as a stream: per-trigger cost is O(batch +
    * index-probe), never O(corpus).
    *
    * Same at-least-once trade as [[aggStream]]: a crash between the index
    * append and the offset commit replays the batch against an index that
    * already holds its signatures — replayed docs then pair with
    * THEMSELVES (same id both sides). deltaRun's id_a < id_b
    * canonicalization drops self-pairs, and the pairs append is re-run, so
    * the only replay artifact is duplicate pair rows (dedupe on read);
    * index growth is idempotent per (id, band) by content.
    *
    * The index must exist ([[graft.pipeline.IncrementalDedup.initRun]] on
    * the initial corpus — possibly empty) before the stream starts.
    */
  def minhashDedupStream(docs: DataFrame, wh: graft.engine.Warehouse,
      indexName: String, pairsTable: String, n: Int, k: Int, bandSize: Int,
      threshold: Double, nBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$pairsTable")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = graft.pipeline.IncrementalDedup.deltaRun(
          wh, indexName, batch, n, k, bandSize, threshold, nBuckets)
        if (wh.exists(pairsTable)) wh.append(pairsTable, pairs)
        else wh.writeSwap(pairsTable, pairs)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming AGGREGATE-state bridge: each micro-batch rolls its raw rows
    * up to per-key partials and combines them into a stored rollup via
    * [[graft.engine.Incremental.mergeAggregates]] — a continuously-current
    * aggregate table at O(batch + state) per trigger, with no watermark
    * bound on how old a key may be updated (unlike an in-plan streaming
    * aggregation, whose state either grows forever or drops late keys).
    *
    * NOT exactly-once: writeSwap commits the whole state atomically, but a
    * crash AFTER the swap and BEFORE the offset commit replays the batch
    * and double-counts it (sum combiners are not idempotent, unlike
    * mergeStream's row upserts). The checkpoint makes that window small;
    * exactly-once needs a batch-id ledger (mergeStream's protocol) — the
    * trade is documented, not hidden.
    */
  def aggStream(events: DataFrame, wh: graft.engine.Warehouse, table: String,
      keys: Seq[String], combiners: Seq[(String, String)])(
      partials: DataFrame => DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val p = partials(batch)
        val merged = if (wh.exists(table))
          graft.engine.Incremental.mergeAggregates(wh.read(table), p, keys, combiners)
        else {
          // validate on the CREATION path too: a malformed first batch
          // would otherwise commit bad durable state + its offsets, and
          // every restart replays batch 2 against it — permanently wedged
          graft.engine.Incremental.validateAggSchema(p, keys, combiners, "batch partials")
          p
        }
        wh.writeSwap(table, merged)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming uniform-sample bridge: each micro-batch's per-group
    * bottom-k KMV registers ([[graft.functions.Sketches.kmvRegisters]])
    * merge into the stored sample by the exact re-take-k law — k-bounded
    * state per group BY CONSTRUCTION, and the terminal table equals the
    * batch build over everything ingested (the merge law is exact, so
    * stream == batch is an identity, not an approximation — the property
    * the oracle gates). Unlike [[aggStream]]'s sum combiners, re-take-k
    * is IDEMPOTENT (unioning rows already in the sample changes
    * nothing), so the crash-replay window double-counts nothing: this
    * bridge is effectively exactly-once without a batch-id ledger.
    */
  def kmvSampleStream(events: DataFrame, wh: graft.engine.Warehouse,
      table: String, groupCols: Seq[String], idCol: Column,
      k: Int): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val regs = graft.functions.Sketches.kmvRegisters(batch, groupCols, idCol, k)
        val merged = if (wh.exists(table))
          graft.functions.Sketches.kmvMerge(
            wh.read(table).unionByName(regs), groupCols, k)
        else regs
        wh.writeSwap(table, merged)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The WEIGHTED twin of [[kmvSampleStream]]
    * ([[graft.functions.Sketches.kmvWeightedRegisters]]): each
    * micro-batch's per-group weighted bottom-k registers merge into the
    * stored sample by the exact re-take-k law. Same effectively-
    * exactly-once story as the uniform bridge — re-take-k is idempotent
    * (sub-keys are deterministic functions of (id, weight)), so a crash
    * replay re-merging an already-absorbed batch changes nothing, with
    * no batch-id ledger. Weight must be a stable function of the id
    * (the [[graft.functions.Sketches.kmvWeightedMerge]] contract).
    */
  def kmvWeightedSampleStream(events: DataFrame, wh: graft.engine.Warehouse,
      table: String, groupCols: Seq[String], idCol: Column, wCol: Column,
      k: Int, maxWeight: Int = 4096): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val regs = graft.functions.Sketches.kmvWeightedRegisters(
          batch, groupCols, idCol, wCol, k, maxWeight)
        val merged = if (wh.exists(table))
          graft.functions.Sketches.kmvWeightedMerge(
            wh.read(table).unionByName(regs), groupCols, k)
        else regs
        wh.writeSwap(table, merged)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming heavy-hitter bridge: each micro-batch's Misra-Gries
    * summary merges into the stored register table by
    * [[graft.functions.Sketches.mgCompress]] (bag union + the
    * deterministic order-statistic cut — the guarantee-preserving merge
    * of Agarwal et al. 2012), and the represented row count rides along
    * in `<table>__n` as one additive register. Counter VALUES are
    * merge-tree-dependent (unlike the idempotent KMV bridge, a replayed
    * batch re-sheds mass), so consumers must read the summary through
    * its LAW, not its digits: every key above the
    * `(n_total - stored_mass) div (k+1)` residual is certainly present
    * (no false negatives under ANY tree) and stored counts never
    * overestimate — hot-key CERTIFICATION is therefore robust to batch
    * boundaries, which is exactly the planner-facing readout
    * ([[graft.engine.Skew.hotColdJoin]] routes on it). Same offset
    * semantics as [[aggStream]]: exactly-once per committed batch via
    * the checkpoint, at-least-once across an uncommitted-crash replay.
    */
  def mgStream(events: DataFrame, wh: graft.engine.Warehouse,
      table: String, v: Column,
      k: Int): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
        val regs = graft.functions.Sketches.mgRegisters(batch, Nil, v, k)
        val n = batch.agg(count(v).cast("long").as("n_total"))
        val (merged, total) = if (wh.exists(table))
          (graft.functions.Sketches.mgCompress(
            wh.read(table).unionByName(regs), Nil, k),
            wh.read(s"${table}__n").unionByName(n)
              .agg(coalesce(sum(col("n_total")), lit(0L)).cast("long")
                .as("n_total")))
        else (regs, n)
        // total FIRST: a crash between the writes leaves n_total >= the
        // summarized mass, which only WIDENS the residual bound — the
        // certificate stays sound (the reverse order could understate it)
        wh.writeSwap(s"${table}__n", total)
        wh.writeSwap(table, merged)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming distinct-count sketch: HLL registers as a WINDOWED streaming
    * aggregate — the register table (bucket -> max rho) is exactly the
    * mergeable state a stream can maintain incrementally; the estimate is a
    * cheap batch roll-up over the materialized registers
    * ([[graft.functions.Sketches.hllEstimate]]). COUNT(DISTINCT) itself is
    * not incrementally maintainable at bounded state; the sketch is.
    */
  def hourlyDistinctUsers(events: DataFrame): DataFrame =
    graft.functions.Sketches.hllRegistersBy(
      events.withWatermark("ts", "2 hours"),
      Seq(window(col("ts"), "1 hour")), col("user_id"))
      // hll_b rides along like the batch relation — the streamed register
      // table stays the SAME mergeable relation the batch path derives
      .select(col("window.start").as("hour_start"), col("hll_bucket"),
        col("hll_rho"), col("hll_b"))

  /** Streaming per-hour event-type frequency sketch: the Count-Min register
    * relation (row, col -> count) is maintained incrementally by the same
    * windowed groupBy+count a batch build uses
    * ([[graft.functions.Sketches.cmRegistersBy]] — ONE shared derivation),
    * so stream state is bounded at d*w rows per open window while point
    * lookups stay O(d) against the materialized registers. An exact
    * per-value count table is unbounded on a high-cardinality stream; the
    * sketch is not.
    */
  def hourlyEventTypeFreq(events: DataFrame): DataFrame =
    graft.functions.Sketches.cmRegistersBy(
      events.withWatermark("ts", "2 hours"),
      Seq(window(col("ts"), "1 hour")), col("event_type"))
      .select(col("window.start").as("hour_start"), col("cm_row"),
        col("cm_col"), col("cm_count"))

  /** Streaming per-hour value-quantile sketch: log2-histogram registers
    * ([[graft.functions.Sketches.histRegistersBy]], shared batch/stream
    * derivation) maintained by the windowed count — at most 64 bins of
    * state per open window where an exact quantile would buffer the full
    * value multiset. Roll quantile upper bounds up from the materialized
    * registers with [[graft.functions.Sketches.histQuantile]].
    */
  def hourlyValueHist(events: DataFrame): DataFrame =
    graft.functions.Sketches.histRegistersBy(
      events.withWatermark("ts", "2 hours"),
      Seq(window(col("ts"), "1 hour")),
      floor(col("value") * 100 + 0.5).cast("long"))
      .select(col("window.start").as("hour_start"), col("hist_bin"),
        col("hist_count"))

  /** Streaming per-hour mergeable quantile registers
    * ([[graft.functions.QuantileSketch.qsRegistersBy]], shared
    * batch/stream derivation): the windowed (value, count) rollup is the
    * associative aggregate a stream CAN maintain (state bounded by
    * per-window distinct quantized cents), and the materialized relation
    * is exactly the mergeable register table the batch path derives —
    * compress ([[graft.functions.QuantileSketch.qsCompress]]) and rank
    * cuts ([[graft.functions.QuantileSketch.qsQuantile]]) run over the
    * sink, the [[hourlyDistinctUsers]]/hllEstimate division of labor
    * (compaction needs a per-group sort, which no streaming aggregate
    * state can hold incrementally; the rollup needs only sum).
    */
  def hourlyValueQuantileRegisters(events: DataFrame): DataFrame =
    graft.functions.QuantileSketch.qsRegistersBy(
      events.withWatermark("ts", "2 hours"),
      Seq(window(col("ts"), "1 hour")),
      floor(col("value") * 100 + 0.5).cast("long"))
      .select(col("window.start").as("hour_start"), col("qs_value"),
        col("qs_weight"))

  /** Periodic register-table maintenance (the q251 OPTIMIZE pattern
    * applied to a quantile-register sink): rewrite the materialized
    * relation with every group's summary k-bounded via
    * [[graft.functions.QuantileSketch.qsCompress]] — a long-running
    * stream's register table otherwise grows with each group's distinct
    * value count. Run it on CLOSED groups (hours the stream has moved
    * past, the watermark discipline): a later bag-union merge into a
    * compacted group is still a valid register multiset, but each
    * compaction level adds its one-sided `ceil(W/k)` stride to that
    * group's rank envelope — compact-after-close keeps the envelope at
    * one level. The rewrite stages through the [[graft.engine.Warehouse
    * .writeSwap]] protocol (tmp + atomic rename — the plan may still
    * read the current generation while the replacement stages), and the
    * table stays mergeable for the next [[aggStream]] batch.
    */
  def compactRegisterTable(wh: graft.engine.Warehouse, table: String,
      groupCols: Seq[String], k: Int): Unit =
    wh.writeSwap(table,
      graft.functions.QuantileSketch.qsCompress(wh.read(table), groupCols, k))

  /** Streaming distribution-drift registers: per event-time hour, live
    * `value` counts binned against FIXED reference bin edges (integer
    * cents, ascending) — a windowed streaming aggregate whose state per
    * open window is at most |edges|+1 register rows (the
    * [[hourlyValueHist]] discipline), never raw values. The drift
    * statistic itself is NOT incrementally maintainable (its max runs over
    * the whole CDF); the registers are — maintain counts in the stream,
    * derive the statistic at read time with [[driftFromRegisters]].
    */
  def driftRegisters(events: DataFrame, binEdgesCents: Seq[Long]): DataFrame = {
    require(binEdgesCents.nonEmpty &&
      binEdgesCents == binEdgesCents.sorted &&
      binEdgesCents.distinct.size == binEdgesCents.size,
      s"bin edges must be ascending and distinct: $binEdgesCents")
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val bin = binEdgesCents.foldLeft(lit(0)) { (acc, e) =>
      acc + when(cents > e, 1).otherwise(0)
    }
    events.withWatermark("ts", "2 hours")
      .withColumn("__bin", bin)
      .groupBy(window(col("ts"), "1 hour"), col("__bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"),
        col("__bin").as("bin"), col("n"))
  }

  /** Per-hour drift statistic from stored [[driftRegisters]]: the binned
    * one-sample KS distance `d_ppm = max_bin |cum·1e6 div n − ref_cdf_ppm|`
    * against a reference CDF (cumulative ppm per bin, last must be 1e6 —
    * the fixed SLA distribution the fleet is monitored against). Bins the
    * hour never filled still contribute their gap: the live CDF is flat
    * across an empty bin while the reference ramps, and skipping it would
    * under-report exactly the starved-bin drift the monitor exists to
    * catch — the pivot's sum-when gives the empty bin a 0 count and its
    * cum/gap is evaluated like any other. All arithmetic exact integer,
    * fully parallel across hours. Output: (hour_start, n, d_ppm).
    */
  def driftFromRegisters(registers: DataFrame, refCdfPpm: Seq[Long]): DataFrame = {
    require(refCdfPpm.size >= 2 && refCdfPpm.last == 1000000L &&
      refCdfPpm == refCdfPpm.sorted,
      s"reference CDF must ascend to 1e6: $refCdfPpm")
    val k = refCdfPpm.size
    // bounded bin domain -> conditional-sum pivot: ONE narrow aggregate
    // per hour, no window, no join (a densify self-join on the register
    // relation also trips Spark's self-join dedup through a memory sink);
    // absent bins sum to 0 naturally
    val counts = (0 until k).map(i =>
      sum(when(col("bin") === i, col("n")).otherwise(0L)).as(s"__c$i"))
    val agg = registers.groupBy(col("hour_start")).agg(counts.head, counts.tail: _*)
    val n = (0 until k).map(i => col(s"__c$i")).reduce(_ + _)
    val gaps = (0 until k).map { i =>
      val cum = (0 to i).map(j => col(s"__c$j")).reduce(_ + _)
      abs(call_function("div", cum * 1000000L, col("__n")) - lit(refCdfPpm(i)))
    }
    agg.withColumn("__n", n)
      .filter(col("__n") > 0L)
      .select(col("hour_start"), col("__n").as("n"), greatest(gaps: _*).as("d_ppm"))
  }

  /** Watermarked SLIDING-window counts (1h window advancing every 30min):
    * each event lands in window/slide frames, state is bounded by the
    * watermark horizon x open windows. Same aggregate as the q122 batch
    * query — StreamingSpec pins stream == batch.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Run `body` with `spark.sql.shuffle.partitions` scoped to `n` — the
    * state-store parallelism knob for streaming queries started inside.
    *
    * Streaming state partition count is fixed at FIRST query start (it's
    * baked into the checkpoint), and each state-store instance pays a
    * fixed load/commit cost per micro-batch — so it should be sized to the
    * STATE volume, not inherited from the session's batch shuffle width.
    * A modest-state join at 32 batch partitions pays 64 store commits per
    * batch for nothing (measured 2.3x on the q159 attribution join);
    * conversely a 100 TB corpus stream wants hundreds. Batch queries
    * planned inside the scope also see `n`, so keep the body to the
    * streaming query.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    require(n >= 1, s"statePartitions: $n")
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }

  /** [[runToBatch]] for APPEND-mode graphs (joins, watermark-expired
    * aggregates): Complete mode is aggregate-only in Spark.
    */
  def runToBatchAppend(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Stream-STREAM inner join with an event-time range bound: match each
    * left event to right events for the same key within `withinSeconds`
    * AFTER it (click-through attribution, request/response pairing). Both
    * sides carry watermarks, and the time-range predicate is what lets
    * Spark bound the join state: left rows are dropped from state once the
    * right watermark passes their ts + withinSeconds, right rows once the
    * left watermark passes their ts — without the range bound the state
    * would grow forever. Inner join only here: outer stream-stream joins
    * emit NULL matches when the watermark closes, which changes semantics
    * vs the batch twin the spec pins against.
    *
    * The caller pre-projects each side to disjoint column names including
    * `l_key`/`l_ts` and `r_key`/`r_ts` (both sides usually share a source
    * schema, so prefixing is the caller's one obligation).
    */
  def timeBoundJoin(left: DataFrame, right: DataFrame,
      withinSeconds: Long, watermark: String): DataFrame = {
    require(withinSeconds >= 1, s"withinSeconds: $withinSeconds")
    Seq("l_key" -> left, "l_ts" -> left, "r_key" -> right, "r_ts" -> right)
      .foreach { case (c, df) => require(df.columns.contains(c), s"missing column $c") }
    left.withWatermark("l_ts", watermark)
      .join(right.withWatermark("r_ts", watermark),
        expr(s"l_key = r_key AND r_ts > l_ts AND r_ts <= l_ts + interval $withinSeconds seconds"))
  }

  /** LEFT OUTER [[timeBoundJoin]] — the attribution shape that also
    * reports the NON-converting side: a left row with no match inside its
    * window emits with NULL right columns, but only once the watermark
    * passes the last instant a match could still arrive
    * (`l_ts + withinSeconds`) — before that the row sits in state, because
    * emitting early would be wrong the moment a late match lands. The
    * event-time range bound is what makes the state bounded (same eviction
    * contract as the inner form).
    *
    * Terminal-state determinism under AvailableNow (the q191/q185
    * finalization rule): the closing no-data batch advances the watermark
    * to `min(max(l_ts), max(r_ts)) - delay` (ms-truncated, min across the
    * two watermark operators), so exactly the unmatched left rows whose
    * windows closed below it emit NULL — the property q250's oracle
    * re-derives.
    */
  def timeBoundJoinOuter(left: DataFrame, right: DataFrame,
      withinSeconds: Long, watermark: String): DataFrame = {
    require(withinSeconds >= 1, s"withinSeconds: $withinSeconds")
    Seq("l_key" -> left, "l_ts" -> left, "r_key" -> right, "r_ts" -> right)
      .foreach { case (c, df) => require(df.columns.contains(c), s"missing column $c") }
    left.withWatermark("l_ts", watermark)
      .join(right.withWatermark("r_ts", watermark),
        expr(s"l_key = r_key AND r_ts > l_ts AND r_ts <= l_ts + interval $withinSeconds seconds"),
        "leftOuter")
  }

  /** Stream-static enrichment: each micro-batch joins the (small) static
    * dimension, broadcast so no state and no shuffle of the stream side —
    * the canonical "attach dim attributes to a live fact feed" shape.
    * Left join: a fact with no dim row flows through with NULL attributes
    * rather than silently dropping (inner would stall late-arriving dim
    * backfills forever).
    *
    * The static side is a SNAPSHOT for file sources: Spark caches the file
    * listing at query start, so a dim overwritten in place is NOT picked up
    * (and in-place rewrites of the same dir fail the cached listing). To
    * follow a dim maintained through the Warehouse swap protocol, re-read
    * it inside a foreachBatch sink (the [[mergeStream]] pattern) or restart
    * the query on swap.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Streaming exact dedup (the training-pipeline "drop repeated documents"
    * op on a live feed): first occurrence of each key wins; duplicates
    * arriving within the watermark horizon are dropped and state older than
    * the watermark is evicted — bounded state, unlike a plain
    * dropDuplicates whose key set grows forever on an unbounded stream.
    */
  def dedupStream(events: DataFrame, keys: Seq[String], eventTimeCol: String,
      watermark: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  final case class Event(event_id: Long, user_id: Long, us: Long)
  final case class SessionState(sessionStartUs: Long, lastUs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long,
      duration_us: Long)

  /** Stateful sessionization: emit a session row when the 30-min gap
    * elapses — either because a LATER event from the same user arrives, or
    * because the event-time watermark passes the gap horizon
    * (EventTimeTimeout). Without the timeout an idle user's final session
    * would sit in state forever on a live stream, never emitted and never
    * evicted (a liveness leak the finite-input tests cannot see). State per
    * user is a single running session (mapGroupsWithState family, the
    * reference-free "custom state" capability from the brief).
    *
    * LATE-DATA TRADEOFF: the watermark this liveness fix requires also
    * DROPS events arriving more than `watermarkDelay` behind the max seen
    * event time — they never reach the stateful op. A replay-style caller
    * feeding historical data out of order must raise `watermarkDelay` to
    * cover the worst-case disorder (the timeout then just fires later);
    * the old NoTimeout form processed arbitrarily late events but leaked
    * state on live streams.
    */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000000,
      watermarkDelay: String = "2 hours")(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    // EventTimeTimeout requires a watermark upstream of the stateful op
    val marked = events
      .withColumn("__ts", timestamp_micros(col("us")))
      .withWatermark("__ts", watermarkDelay)
      .as[Event]
    marked.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // the watermark passed lastUs + gap with no new events: the
            // open session is complete — emit it and free the state
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, st.sessionStartUs, st.nEvents,
              st.lastUs - st.sessionStartUs))
          } else {
            // INTERVAL MERGE over (open-session state + batch events) in
            // event-time order: a cross-batch late event (inside the
            // watermark horizon) then lands exactly where the batch
            // sessionizer (q23) would put it — inside the open session,
            // extending it BACKWARDS when it precedes sessionStart by at
            // most the gap, or as its own earlier session when it precedes
            // by more. The old frontier-only comparison absorbed every
            // earlier event into the open session regardless of distance
            // and never regressed sessionStart. (Residual divergence,
            // inherent to append-mode streaming: a late event can no longer
            // merge sessions that were already EMITTED.)
            val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
            val intervals =
              (state.getOption.map(st => (st.sessionStartUs, st.lastUs, st.nEvents)) ++
                sorted.map(e => (e.us, e.us, 1L))).toSeq.sortBy(iv => (iv._1, iv._2))
            var cur: Option[(Long, Long, Long)] = None
            val out = Seq.newBuilder[SessionOut]
            intervals.foreach { iv =>
              cur match {
                case Some(a) if iv._1 - a._2 <= gapUs =>
                  // sorted by start, so iv never begins before a: merge
                  cur = Some((a._1, math.max(a._2, iv._2), a._3 + iv._3))
                case Some(a) =>
                  out += SessionOut(userId, a._1, a._3, a._2 - a._1)
                  cur = Some(iv)
                case None =>
                  cur = Some(iv)
              }
            }
            cur.map { case (s0, s1, n) => SessionState(s0, s1, n) }.foreach { st =>
              state.update(st)
              // fire once the watermark passes the gap horizon; clamp above
              // the current watermark (setting a timeout at-or-below it is
              // an error — the session then times out on the NEXT batch)
              state.setTimeoutTimestamp(math.max(st.lastUs / 1000 + gapUs / 1000,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Materialized streaming "trending now": the top-`k` event types per
    * sliding window, kept current in a warehouse table. Append-mode
    * window rows arrive exactly when the watermark FINALIZES them, so
    * each micro-batch unions the new windows into the table and re-ranks
    * — per-batch work is O(batch + table) and the table stays bounded at
    * k rows per finalized window. Crash-replay caveat shared with
    * [[minhashDedupStream]]: an at-least-once re-delivery of a finalized
    * window would double its rows before ranking; the checkpoint makes
    * that a crash-window event, not steady-state behavior.
    */
  def trendingStream(events: DataFrame, wh: graft.engine.Warehouse,
      table: String, k: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    require(k >= 1, s"k: $k")
    slidingCounts(events).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val all = if (wh.exists(table)) wh.read(table).unionByName(batch) else batch
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("win_start"))
          .orderBy(col("n_events").desc, col("event_type").asc)
        wh.writeSwap(table, all
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= k).drop("__rn"))
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming burst (rate-limit) alerts — the in-flight twin of
    * [[graft.operators.EventAnalytics.slidingBurst]] (q341): per-user
    * sliding-window event counts (1 h window, 15 min slide), and every
    * FINALIZED window at or above `threshold` lands as an alert row. The
    * batch op answers "what was the worst burst ever"; this one fires
    * while the bot is still running, at watermark latency. Append mode
    * emits a window only once the watermark passes its end, so alerts
    * are immutable facts and the sink is a pure APPEND — no rewrite, no
    * upsert (contrast [[trendingStream]], whose top-k must re-rank).
    *
    * Slide-aligned windows are the streaming-standard approximation of
    * the batch op's event-anchored exact max: a burst of `n` events
    * inside one hour is caught by some aligned window with count >= the
    * events falling in it — pigeonhole over the 4 slides guarantees a
    * window holding >= ceil(n/2) of them, so a threshold-T alert policy
    * here corresponds to exact bursts in [T, 2T); the trade is documented
    * the same way LSH recall is. State per (user, open window) is one
    * count — bounded by active users x 4 slides.
    */
  def burstAlertStream(events: DataFrame, wh: graft.engine.Warehouse,
      table: String, threshold: Long): org.apache.spark.sql.streaming.StreamingQuery = {
    require(threshold >= 1, s"threshold: $threshold")
    events
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= threshold)
      .select(col("window.start").as("win_start"), col("user_id"),
        col("n_events"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"${wh.root}/_checkpoints/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        wh.append(table, batch)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class PendingStep(us: Long, step: Int)
  final case class FunnelState(pending: Seq[PendingStep], reached: Int,
      lastUs: Long, finalizedUs: Long)
  final case class FunnelProgress(user_id: Long, reached: Int)

  /** Streaming ordered funnel — the stateful twin of
    * [[graft.operators.EventAnalytics.funnel]] (q104), with EVENT-TIME
    * correctness under out-of-order arrival: step events BUFFER in state
    * until the watermark passes them, then fold through the greedy state
    * machine in event-time order (batch tie-break parity included: equal
    * timestamps order by the type STRING, as `sort_array` does). A naive
    * incremental fold is wrong the moment a user's 'view' arrives after
    * their 'click' — the buffer-until-watermark design is what makes
    * stream == batch hold.
    *
    * Semantics and bounds:
    *  - emits (user_id, reached) in UPDATE mode — the latest row per user
    *    is the answer; rows re-emit on every invocation of that user;
    *  - non-step events flow through (un-buffered) so zero-progress users
    *    surface with reached 0, matching batch's distinct-user restore;
    *  - events at or below the already-finalized horizon are late beyond
    *    the watermark contract: dropped, like any watermarked operator;
    *  - state per user = reached + the within-watermark-lag buffer (the
    *    same bound as a sliding-window agg) plus one record that persists
    *    for the stream's lifetime — funnels have no natural expiry; a
    *    deployment that wants one composes a timeout policy on top.
    */
  def funnelStream(events: DataFrame, steps: Seq[String],
      watermarkDelay: String = "2 hours")(
      implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"repeated step types are ambiguous: $steps")
    val stepOf = map(steps.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(s), lit(i)) }: _*)
    // the watermark column must SURVIVE into the stateful operator's input
    // (a later projection that drops it silently discards the watermark
    // tag and EventTimeTimeout then fails analysis) — project first,
    // watermark last, carry __ts through the encoder
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        expr("unix_micros(ts)").as("us"),
        coalesce(element_at(stepOf, col("event_type")), lit(-1)).as("step"),
        col("ts").as("__ts"))
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, Long, Int, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Int, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          val st0 = state.getOption.getOrElse(
            FunnelState(Nil, 0, Long.MinValue, Long.MinValue))
          // getCurrentWatermarkMs() == 0 means NO watermark yet, not a
          // real epoch-1970 watermark: the guard keeps finalizedUs from
          // claiming the ts <= 0 region before any watermark has passed
          // it. (Events that far back never actually arrive — Spark's own
          // late-record filter compares against the initial watermark
          // value 0 upstream of every watermarked stateful operator — so
          // this is bookkeeping honesty, not a reachable fold path.)
          val wmMs = state.getCurrentWatermarkMs()
          val horizonUs = if (wmMs == 0) Long.MinValue else wmMs * 1000
          val fresh = rows.collect {
            case (_, us, s, _) if s >= 0 && us > st0.finalizedUs => PendingStep(us, s)
          }.toSeq
          val (ready, still) = (st0.pending ++ fresh).partition(_.us <= horizonUs)
          var reached = st0.reached
          var lastUs = st0.lastUs
          ready.sortBy(p => (p.us, steps(p.step))).foreach { p =>
            // the batch fold verbatim: next step in sequence, strictly
            // after the previous advance (first step exempt)
            if (reached < steps.size && p.step == reached &&
                (reached == 0 || p.us > lastUs)) {
              reached += 1
              lastUs = p.us
            }
          }
          // state persists even when complete: a later re-invocation must
          // re-emit the achieved level, never regress to a fresh 0
          state.update(FunnelState(still, reached, lastUs,
            math.max(st0.finalizedUs, horizonUs)))
          if (still.nonEmpty)
            state.setTimeoutTimestamp(math.max(still.map(_.us).min / 1000 + 1,
              state.getCurrentWatermarkMs() + 1))
          Iterator.single(FunnelProgress(userId, reached))
      }
  }
}
