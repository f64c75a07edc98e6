package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: flag corpus
  * documents sharing at least `minShared` distinct word n-grams with any
  * benchmark document — the train/test-overlap check a training-data
  * pipeline runs before every data release. (Additive to the reference
  * surface, like the rest of `graft.pipeline`.)
  *
  * Scale shape: benchmark sets are SMALL by construction (a few thousand
  * prompts/documents), so the exploded benchmark shingle set broadcasts; the
  * corpus side explodes shingles map-side, hash-joins against the broadcast
  * and partially aggregates per (doc, bench) pair — the 100 TB corpus is
  * never shuffled by shingle, and rows with zero overlap never leave their
  * map task. The exchange carries only matched (doc, bench, shingle) hits,
  * which track true contamination volume.
  */
object Contamination {

  /** (doc_id, bench_id, n_shared) for every corpus x benchmark pair sharing
    * at least `minShared` distinct n-grams. Shingles are per-document
    * distinct ([[TextAnalysis.shinglesFromTokens]]), so the count is exactly
    * the intersection size.
    */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, n: Int, minShared: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 1 && minShared >= 1, s"n=$n minShared=$minShared")
    // two-projection shingle shape (see shinglesFromTokens: no CSE inside
    // higher-order lambdas — the token array must be an attribute)
    def shingled(df: DataFrame, outId: String) = df
      .select(col(idCol).cast("long").as(outId), col(textCol).as("__text"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(outId),
        explode(TextAnalysis.shinglesFromTokens(col("__text"), col("__toks"), n))
          .as("shingle"))
    shingled(corpus, "doc_id")
      .join(broadcast(shingled(bench, "bench_id")), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Engine-portable Bloom filter over md5-hex fingerprints: `m` bits packed
    * into longs, `k` probe positions per value by Kirsch-Mitzenmacher double
    * hashing — h1/h2 are the first/second 8 hex digits of the fingerprint
    * itself (no re-hash), pos_i = (h1 + i*(h2|1)) mod m. The identical
    * integer recipe runs driver-side (build) and as codegen'd Columns
    * (probe), so membership answers are bit-reproducible on any engine —
    * unlike an opaque library sketch.
    *
    * SIZING: ~10 bits per expected entry with k=3 gives ~1-2% false
    * positives; a saturated bitset (fill ratio near 1) stays CORRECT but
    * stops pruning — every row falls through to the exact confirm join.
    * Check [[bloomFillRatio]] when the benchmark cardinality is unknown.
    */
  def bloomBits(fps: Iterable[String], m: Int, k: Int): Array[Long] = {
    require(m >= 64 && m % 64 == 0, s"m must be a positive multiple of 64: $m")
    require(k >= 1 && k <= 16, s"k: $k")
    val bits = new Array[Long](m / 64)
    fps.foreach { fp =>
      require(fp != null && fp.length >= 16, s"not an md5 hex fingerprint: $fp")
      val h1 = java.lang.Long.parseLong(fp.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(fp.substring(8, 16), 16) | 1L
      var i = 0
      while (i < k) {
        val pos = ((h1 + i * h2) % m).toInt
        bits(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    bits
  }

  /** Fraction of set bits — the operational health signal of a bitset:
    * above ~0.5 the false-positive rate climbs steeply and the prune stops
    * paying for itself (resize m and rebuild).
    */
  def bloomFillRatio(bits: Array[Long]): Double =
    bits.map(java.lang.Long.bitCount).sum.toDouble / (bits.length * 64.0)

  /** Distributed build of the SAME bitset as [[bloomBits]]: each fingerprint
    * explodes to its k probe positions map-side, a bit_or aggregation packs
    * them into words, and the driver receives at most m/64 longs — the
    * benchmark set itself is never collected, so the build scales to
    * benchmark sets far beyond driver memory. Bit-identical to the
    * driver-side build (spec-pinned).
    */
  def bloomBitsOf(fps: DataFrame, fpCol: String, m: Int, k: Int): Array[Long] = {
    require(m >= 64 && m % 64 == 0, s"m must be a positive multiple of 64: $m")
    require(k >= 1 && k <= 16, s"k: $k")
    val h1 = conv(substring(col(fpCol), 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(col(fpCol), 9, 8), 16, 10).cast("long").bitwiseOR(lit(1L))
    val positions = array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % m): _*)
    val words = fps.filter(col(fpCol).isNotNull)
      .select(explode(positions).as("pos"))
      .groupBy((col("pos") / 64).cast("int").as("word"))
      .agg(bit_or(call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")))
        .as("bits"))
      .collect()
    val out = new Array[Long](m / 64)
    words.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Column-side probe of [[bloomBits]]: true when every probe bit is set
    * (possible false positive), false = DEFINITELY absent. Pure builtin
    * columns (conv/substring on the fingerprint, element_at + shiftright on
    * the packed words) — stays inside whole-stage codegen, no UDF.
    */
  def bloomMightContain(bits: Array[Long], m: Int, k: Int, fp: Column): Column = {
    require(bits.length == m / 64, s"bits length ${bits.length} != m/64 ${m / 64}")
    val h1 = conv(substring(fp, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(fp, 9, 8), 16, 10).cast("long").bitwiseOR(lit(1L))
    val words = typedLit(bits.toSeq)
    (0 until k).map { i =>
      val pos = (h1 + lit(i.toLong) * h2) % m
      val word = element_at(words, (pos / 64).cast("int") + 1)
      // dynamic shift width needs the SQL builtin (the Scala shiftright
      // overload only takes a static Int)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Exact-duplicate DECONTAMINATION at corpus scale: remove every corpus
    * doc whose normalized fingerprint appears in the benchmark set. Result
    * is exactly `corpus ANTI JOIN bench ON fingerprint` — the Bloom phase is
    * a pure optimization and never changes the answer.
    *
    * Scale shape: when the benchmark fingerprint set outgrows the broadcast
    * limit, a plain anti-join SHUFFLES THE ENTIRE CORPUS on fingerprint. The
    * Bloom bitset (m bits ~ KBs-MBs for millions of entries) ships inside
    * the plan instead; bloom-negative rows — virtually the whole corpus —
    * are proven clean map-side and never reach an exchange. Only
    * bloom-positive rows (true hits + the m/k-tunable false-positive sliver)
    * enter the exact confirming anti-join, whose shuffled volume now tracks
    * contamination rate, not corpus size. Same pattern as Spark's own
    * runtime bloom-pruned joins, in portable form.
    *
    * The bitset build is fully distributed ([[bloomBitsOf]]) — only m/64
    * packed words ever reach the driver, never the benchmark rows. NULL-text
    * corpus rows probe as "maybe" and fall to the exact join, which keeps
    * them (NULL matches nothing).
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, m: Int = 1 << 16,
      k: Int = 3, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(!corpus.columns.contains("__fp") && !corpus.columns.contains("__maybe"),
      "column names '__fp'/'__maybe' are reserved")
    // the fingerprint set feeds both the bitset build (an action) and the
    // confirm join; the join side recomputes the distinct — one extra
    // benchmark-sized scan, bounded and small next to the corpus. NOT
    // localCheckpoint'ed: the returned lazy plan would pin the checkpoint
    // blocks with no caller-visible way to free them (the leak class fixed
    // in Registry's schema-reshape append).
    val benchFps = bench.select(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .filter(col("__fp").isNotNull).distinct()
    val bits = bloomBitsOf(benchFps, "__fp", m, k)
    val probed = corpus.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__maybe",
        coalesce(bloomMightContain(bits, m, k, col("__fp")), lit(true)))
    val clean = probed.filter(!col("__maybe"))
    // deliberately NOT broadcast: the bloom already did the map-side prune;
    // at real scale this join sees only the positive sliver
    val confirmed = probed.filter(col("__maybe"))
      .join(benchFps, Seq("__fp"), "left_anti")
    // KNOWN TRADE: the union's two branches each scan the corpus (two
    // map-side passes, fingerprint + probes computed twice) — deliberately
    // cheaper than the single-pass alternative of shuffling the ENTIRE
    // corpus through the join, which is the exact cost this operator
    // exists to avoid. Callers that can afford materialization can persist
    // `corpus` before calling.
    clean.unionByName(confirmed).drop("__fp", "__maybe")
  }
}
