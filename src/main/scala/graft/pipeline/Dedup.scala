package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextAnalysis.wordShingles

/** Document deduplication family for training-data pipelines (builder brief):
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash. Embedding
  * near-dup lives in [[Similarity.nearDupPairs]].
  *
  * Scale notes: exact dedup is one shuffle on the content hash. Pairwise
  * Jaccard is only run inside blocking keys (never globally). MinHash/LSH is
  * the 100 TB path: signature computation is embarrassingly parallel, the
  * band bucket-join shuffles on (band, value) — candidate volume is tunable
  * via bands x rows-per-band, never O(N^2).
  */
object Dedup {

  /** Exact duplicates: group by normalized content hash.
    * Output: content_hash, canonical_id (min id), n_copies.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).cast("long").as("canonical_id"),
           count(lit(1)).as("n_copies"))

  /** Jaccard over distinct word-shingle sets: |A ∩ B| / |A u B|, exact
    * integer sizes -> one double division (engine-portable).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  /** Pairwise n-gram Jaccard within a blocking column. Output:
    * block, id_a, id_b (a<b), jaccard.
    */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String, n: Int, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(blockCol), col(idCol).cast("long").as("id"),
      wordShingles(col(textCol), n).as("sh"))
    val a = sh.select(col(blockCol), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col(blockCol), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col(blockCol), col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature: sig[i] = min over shingles s of md5(i ':' s).
    * md5-as-hash keeps the signature engine-portable (string min), and k
    * independent permutations come from the seed prefix.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingles, s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH band values: adjacent signature slots concatenated; identical band
    * value in any band -> candidate pair.
    */
  def lshBands(sig: Column, bandSize: Int, nBands: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)), b =>
      struct(b.as("band"),
        array_join(slice(sig, b * bandSize + 1, lit(bandSize)), "|").as("value")))

  /** MinHash+LSH candidate pairs verified with true Jaccard.
    * Output: id_a, id_b (a<b), jaccard (>= threshold).
    */
  def minhashPairs(docs: DataFrame, n: Int, k: Int, bandSize: Int, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nBands = k / bandSize
    val sh = docs.select(col(idCol).cast("long").as("id"),
        wordShingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sh.select(col("id"), col("sh"),
        explode(lshBands(col("sig"), bandSize, nBands)).as("b"))
      .select(col("id"), col("sh"), col("b.band").as("band"), col("b.value").as("value"))
      .filter(col("value").isNotNull)
    val a = banded.select(col("band"), col("value"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("value"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "value"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct() // same pair may collide in several bands
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 16-bit SimHash in pure integer arithmetic (engine-portable): token hash
    * = first 4 md5 hex digits as int; bit b of the sketch is set iff the
    * +1/-1 vote sum over tokens at bit b is positive.
    */
  def simhash16(tokens: Column): Column = {
    val hashes = transform(tokens, t =>
      conv(substring(md5(t), 1, 4), 16, 10).cast("int"))
    val bitCols = (0 until 16).map { b =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1 << b)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash sketches (bit-count of xor). */
  def hamming16(a: Column, b: Column): Column =
    (0 until 16).map(bit =>
      shiftright(a.bitwiseXOR(b), bit).bitwiseAND(1)).reduce(_ + _)

  /** SimHash near-dup pairs within a blocking column: hamming <= maxDist. */
  def simhashPairs(docs: DataFrame, blockCol: String, maxDist: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(blockCol), col(idCol).cast("long").as("id"),
      simhash16(TextAnalysis.tokens(col(textCol))).as("sketch"))
    val a = sh.select(col(blockCol), col("id").as("id_a"), col("sketch").as("sk_a"))
    val b = sh.select(col(blockCol), col("id").as("id_b"), col("sketch").as("sk_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming16(col("sk_a"), col("sk_b")))
      .filter(col("hamming") <= maxDist)
      .select(col(blockCol), col("id_a"), col("id_b"), col("hamming"))
  }
}
