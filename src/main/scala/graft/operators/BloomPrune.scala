package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime join pruning: build a Bloom filter over the small
  * side's join keys, broadcast it as a LITERAL bitset, and filter the big
  * side BEFORE its shuffle — the hand-rolled form of the runtime filters
  * engines inject automatically (Spark's own runtime bloom,
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, only fires on
  * selective non-key filters; this operator is the explicit seat for when
  * the planner declines). At 100 TB the win is shuffle bytes: a semi join
  * whose probe side is 2% selective shuffles 2% of the fact table instead
  * of all of it, at the cost of one pass over the (tiny) build side.
  *
  * No false negatives by construction, so `semiJoinWithBloom` returns
  * EXACTLY the plain semi-join result — the bloom is a transparent
  * prefilter, which is what makes it oracle-checkable against a plain
  * `IN` subquery. False positives only cost wasted shuffle rows, bounded
  * by (1 - e^(-kn/m))^k — ~1.7% at the 16-bit default with 3 probes and
  * 5k keys.
  *
  * Implementation: k xxhash64 probes mod m bits; the driver packs the
  * build side's set bits into `m/64` longs carried as one array literal
  * (8 KiB at the default — plan-size trivial, no broadcast variable
  * machinery). The probe is pure codegen'd long arithmetic
  * (element_at + shiftright + mask): arithmetic-shift sign fill is
  * harmless because `(x >> b) & 1` reads bit b exactly regardless of
  * sign. The driver-side collect is the BIT POSITION set — bounded by
  * min(k·|build|, m) <= m rows, never by the data.
  */
object BloomPrune {

  /** Probe positions for one key value: k independent 64-bit hashes
    * folded to [0, mBits). xxhash64 is codegen'd and seed-parameterized;
    * pmod keeps the fold non-negative.
    */
  private def positions(key: Column, k: Int, mBits: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(mBits.toLong)))

  /** Build the packed bitset on the driver: distinct bit positions of the
    * build side's keys. Collect cardinality <= mBits by construction.
    */
  def buildBits(build: DataFrame, key: Column, k: Int, mBits: Int): Array[Long] = {
    require(k >= 1 && k <= 8, s"probe count k: $k")
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 24),
      s"mBits must be a multiple of 64 in [64, 2^24]: $mBits")
    val pos = build.select(explode(array(positions(key, k, mBits): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    pos.foreach { p =>
      words((p >>> 6).toInt) |= (1L << (p & 63L))
    }
    words
  }

  /** Membership test against a driver-built bitset, as a pure Column:
    * every probe bit must be set. `call_function("shiftright", ...)`
    * reaches the column-shift SQL form the Scala API hides behind an
    * Int-only signature.
    */
  def mightContain(key: Column, words: Array[Long], k: Int): Column = {
    val mBits = words.length * 64
    val arr = typedLit(words.toSeq)
    positions(key, k, mBits).map { p =>
      val word = element_at(arr, shiftright(p, 6).cast("int") + 1)
      call_function("shiftright", word, pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Exact semi join with a bloom prefilter on the probe side: identical
    * rows to `probe SEMI JOIN build`, but rows whose key cannot match die
    * before the shuffle. `bigKey`/`buildKey` name single key columns.
    */
  def semiJoinWithBloom(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      k: Int = 3, mBits: Int = 1 << 16): DataFrame = {
    val words = buildBits(build.select(col(buildKey)).distinct(), col(buildKey), k, mBits)
    probe.filter(mightContain(col(probeKey), words, k))
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }
}
