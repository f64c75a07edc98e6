package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile summary — the deterministic KLL-lineage compactor
  * (Munro-Paterson 1980 merge-and-prune; Greenwald-Khanna 2001 summaries;
  * KLL, Karnin-Lang-Liberty 2016) in relational form, completing the
  * sketch family beside HLL / Count-Min / log2-histogram
  * ([[Sketches]]): percentile monitoring at 100 TB needs a register table
  * that COMBINES across partitions/days/shards the way HLL registers do,
  * where the exact path ([[graft.pipeline.Stats.exactQuantiles]]) must
  * roll up the full distinct-value multiset and the log2-histogram
  * ([[Sketches.histQuantile]]) is only factor-2 accurate.
  *
  * Register relation: `(group..., qs_value BIGINT, qs_weight BIGINT)`,
  * values distinct per group, `sum(qs_weight)` = the represented row
  * count, and CRUCIALLY the summary's cumulative weight at each kept
  * value equals that value's EXACT rank in the represented multiset
  * (compression keeps original cumulative ranks and re-derives weights by
  * telescoping — see [[qsCompress]]). Merging register tables is a bag
  * UNION (associative/commutative like HLL's max-regroup), optionally
  * followed by [[qsCompress]] to re-bound size; each compression level
  * adds at most its stride `s = ceil(W/k)` of one-sided rank error.
  *
  * Engine-portable determinism (the DuckDB-oracle property): there is NO
  * randomness at all — where classic KLL flips a coin per compaction to
  * unbias the surviving offset, this compactor always keeps the stride
  * boundary (rank `i*s`) plus the group maximum. The trade is a
  * deterministic one-sided bias bounded by the SAME `s`-rank guarantee
  * the error analysis already charges, in exchange for exact
  * replay on any engine: every step is integer windows and one
  * truncating division (non-negative operands, so Spark `div` == DuckDB
  * `//`). Quantize continuous metrics to fixed-point first (the cents
  * recipe), like every exact-quantile path in the engine.
  */
object QuantileSketch {

  /** Exact value-rollup registers (weight = count) per group: the finest
    * register table, from which [[qsCompress]] bounds size and
    * [[qsQuantile]] reads ranks. One shuffle, value-domain bounded — the
    * [[graft.pipeline.Stats.exactQuantiles]] phase-1 contract.
    */
  def qsRegisters(df: DataFrame, groupCols: Seq[String], v: Column): DataFrame =
    qsRegistersBy(df, groupCols.map(col), v)

  /** Column-keyed form — the ONE register derivation batch and streaming
    * share (a streaming caller groups by `window(...)`; the windowed
    * groupBy+count is an associative aggregate a stream maintains at
    * per-window-distinct-value state, the [[Sketches.histRegistersBy]]
    * convention).
    */
  def qsRegistersBy(df: DataFrame, groupCols: Seq[Column], v: Column): DataFrame =
    df.filter(v.isNotNull)
      .groupBy(groupCols :+ v.cast("long").as("qs_value"): _*)
      .agg(count(lit(1)).as("qs_weight"))

  /** Compress a register table to at most `k + 1` rows per group — the
    * deterministic compaction level. Input registers need NOT be
    * value-distinct (a bag union of summaries compresses in the same
    * call: `qsCompress(a.unionByName(b), g, k)` IS the merge); equal
    * values first roll up by weight sum so the kept-rank arithmetic sees
    * one row per value regardless of union order (the determinism
    * invariant).
    *
    * With per-group total weight `W` and stride `s = ceil(W/k)`, the kept
    * rows are those whose cumulative weight range covers a multiple of
    * `s`, plus the group maximum; each kept row's new weight telescopes
    * from the previous kept row's cumulative weight, so kept cumulative
    * ranks are UNCHANGED and weights still sum to `W`. Guarantee per
    * level: for any rank `t`, the summary holds a value whose true
    * represented rank lies in `[t, t + s)` — a one-sided `1/k` relative
    * rank error, adding over compression levels (merge depth), the
    * standard mergeable-summary bound.
    *
    * Scale shape: per-group windows over the register rollup only (raw
    * rows never enter; the input is value-domain or `units x k` bounded
    * by construction), then the bounded output flows to the next merge
    * level — the HLL regroup story with ranks.
    */
  def qsCompress(registers: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2 && k <= 1000000, s"k: $k")
    val gcols = groupCols.map(col)
    val rows = registers.groupBy(gcols :+ col("qs_value"): _*)
      .agg(sum(col("qs_weight")).cast("long").as("__w0"))
      // a negative weight would break the div-floor parity every rank
      // computation rests on — raise, never silently corrupt (the
      // histRegisters negative-value discipline)
      .withColumn("__w", when(col("__w0") < 0L, raise_error(concat(
        lit("qsCompress requires non-negative register weights, got "),
        col("__w0").cast("string")))).otherwise(col("__w0")))
      .drop("__w0")
      // zero-weight registers carry no mass but would poison the stride:
      // an all-zero group gets s = 0, the div-by-zero step test goes NULL
      // and cum === tot (0 === 0) keeps EVERY row — violating the k+1
      // bound and emitting weightless registers (ADVICE r12). Dropping
      // them changes no cumulative rank (they add 0) and an all-zero
      // group correctly compresses to the empty summary.
      .filter(col("__w") > 0L)
    val byV = Window.partitionBy(gcols: _*).orderBy(col("qs_value").asc)
    val whole = Window.partitionBy(gcols: _*)
    val kept = rows
      .withColumn("__cum", sum(col("__w")).over(byV))
      .withColumn("__tot", sum(col("__w")).over(whole))
      // all operands non-negative: truncating div == floor on both engines
      .withColumn("__s",
        call_function("div", col("__tot") + lit((k - 1).toLong), lit(k.toLong)))
      .filter(
        call_function("div", col("__cum"), col("__s")) >
          call_function("div", col("__cum") - col("__w"), col("__s")) ||
          col("__cum") === col("__tot"))
    kept
      .withColumn("qs_weight",
        col("__cum") - coalesce(lag(col("__cum"), 1).over(byV), lit(0L)))
      .select(gcols ++ Seq(col("qs_value"), col("qs_weight")): _*)
  }

  /** Per-mille rank cuts from a register table — the
    * [[graft.pipeline.Stats.exactQuantiles]] cut over summary weights:
    * the first value whose cumulative weight reaches `ceil(q*W/1000)`.
    * On uncompressed registers this IS exactQuantiles (spec-pinned); on a
    * summary the returned value is the exact data value at a rank in
    * `[t, t + sum-of-level-strides)` — one-sided, like
    * [[Sketches.histQuantile]]'s bound but in ranks, not value space.
    * Equal values across a bag union roll up first, so the cut is
    * well-defined on any mergeable-relation state.
    */
  /** Exact INTERPOLATED per-mille quantiles (`percentile_cont`
    * semantics, integer micro-units) from a register table — the
    * weighted twin of [[graft.pipeline.Stats.interpolatedQuantiles]],
    * chain mirrored verbatim: 0-based position `p = q*(n-1)/1000`
    * splits into `ip = q*(n-1) div 1000` and `rem`, lo/hi are the
    * represented multiset's elements at ip and ip+1 (hi = lo when the
    * position is exact), `value_micro = lo*1e6 + rem*(hi-lo)*1000` —
    * every step exact integer arithmetic. On uncompressed registers
    * this IS interpolatedQuantiles (spec-pinned); on a compressed
    * summary lo/hi carry the level's one-sided stride rank distortion.
    * Equal values across a bag union pre-roll like the other readers.
    */
  def qsQuantileInterp(registers: DataFrame, groupCols: Seq[String],
      qMilles: Seq[Int]): DataFrame = {
    require(qMilles.nonEmpty && qMilles.forall(q => q >= 0 && q <= 1000),
      s"qMilles must be in [0, 1000]: $qMilles")
    require(qMilles.distinct == qMilles, s"duplicate quantiles: $qMilles")
    val gcols = groupCols.map(col)
    val rows = registers.groupBy(gcols :+ col("qs_value"): _*)
      .agg(sum(col("qs_weight")).cast("long").as("__w"))
    val byVal = Window.partitionBy(gcols: _*).orderBy(col("qs_value").asc)
    val whole = Window.partitionBy(gcols: _*)
    val pos = rows
      .withColumn("cum", sum(col("__w")).over(byVal))
      .withColumn("tot", sum(col("__w")).over(whole))
      .select(gcols ++ Seq(col("qs_value").as("v"), col("__w"), col("cum"),
        col("tot"),
        explode(array(qMilles.map(q => lit(q)): _*)).as("q_mille")): _*)
      .withColumn("ip",
        call_function("div", col("q_mille").cast("long") * (col("tot") - 1),
          lit(1000L)))
      .withColumn("rem",
        col("q_mille").cast("long") * (col("tot") - 1) - col("ip") * 1000L)
      .withColumn("ip2", col("ip") + when(col("rem") > 0, 1L).otherwise(0L))
    def covers(i: Column) = (col("cum") - col("__w")) <= i && i < col("cum")
    pos
      .filter(covers(col("ip")) || covers(col("ip2")))
      .groupBy(gcols :+ col("q_mille"): _*)
      .agg(max(when(covers(col("ip")), col("v"))).as("lo"),
        max(when(covers(col("ip2")), col("v"))).as("hi"),
        max(col("rem")).as("r"), max(col("tot")).as("n_values"))
      .select(gcols ++ Seq(col("q_mille"), col("n_values"),
        (col("lo") * 1000000L + col("r") * (col("hi") - col("lo")) * 1000L)
          .as("value_micro")): _*)
  }

  def qsQuantile(registers: DataFrame, groupCols: Seq[String],
      qMilles: Seq[Int]): DataFrame = {
    require(qMilles.nonEmpty && qMilles.forall(q => q > 0 && q <= 1000),
      s"qMilles must be in (0, 1000]: $qMilles")
    require(qMilles.distinct == qMilles, s"duplicate quantiles: $qMilles")
    val gcols = groupCols.map(col)
    val rows = registers.groupBy(gcols :+ col("qs_value"): _*)
      .agg(sum(col("qs_weight")).cast("long").as("__w"))
    val byV = Window.partitionBy(gcols: _*).orderBy(col("qs_value").asc)
    val whole = Window.partitionBy(gcols: _*)
    rows
      .withColumn("__cum", sum(col("__w")).over(byV))
      .withColumn("__tot", sum(col("__w")).over(whole))
      .select(gcols ++ Seq(col("qs_value"), col("__w"), col("__cum"),
        col("__tot"),
        explode(array(qMilles.map(q => lit(q)): _*)).as("q_mille")): _*)
      .filter(col("__cum") * 1000L >= col("q_mille").cast("long") * col("__tot") &&
        (col("__cum") - col("__w")) * 1000L <
          col("q_mille").cast("long") * col("__tot"))
      .select(gcols ++ Seq(col("q_mille"), col("qs_value").as("value")): _*)
  }
}
