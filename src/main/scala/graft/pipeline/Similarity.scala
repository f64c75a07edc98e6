package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search (builder brief): brute-force cosine top-k as
  * the correctness baseline, sign-bit LSH bucketing as the scale path.
  *
  * Determinism note: float summation order is engine-specific, so the
  * oracle-checked variants quantize components to integers (x1000), compute
  * dot/norms in EXACT integer arithmetic, and do a single IEEE double
  * divide+sqrt at the end — bit-identical on any engine. `cosineF` is the
  * production float path (same math, double accumulation in array order).
  *
  * Scale notes (100 TB): brute force is O(Q*N) — fine when the query set is
  * broadcastable; the LSH path turns it into a bucket-equi-join so both sides
  * shuffle-partition by bucket and each bucket scans locally. For real IVF,
  * raise `signBits` so bucket count ~ sqrt(N).
  */
object Similarity {

  /** Quantize a float vector to exact integers: round-half-up(e * scale). */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, e => floor(e.cast("double") * scale + lit(0.5)).cast("long"))

  /** Exact-integer dot product of two long vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Deterministic quantized cosine: exact int dot/norms, one double op. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Production float cosine (double accumulation in array order). */
  def cosineF(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Sign-bit LSH bucket over the first `bits` components: a cheap
    * random-hyperplane sketch (components of a trained embedding are
    * near-orthogonal directions).
    */
  def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(vec, i + 1) >= 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Brute-force top-k neighbors for `queries` (small, broadcast) against
    * `corpus`. Output: query_id, neighbor_id, score, rank.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosineQ(quantize(col("q_vec")), quantize(col("c_vec"))))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates restricted to the query's sign bucket —
    * the equi-join scale path (recall < 1 by design).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, signBits: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      signBucket(col(vecCol), signBits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      signBucket(col(vecCol), signBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosineQ(quantize(col("q_vec")), quantize(col("c_vec"))))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Near-duplicate pairs by embedding cosine within a blocking column
    * (label/cluster id): a < b, score >= threshold.
    */
  def nearDupPairs(emb: DataFrame, blockCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = emb.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", cosineQ(quantize(col("vec_a")), quantize(col("vec_b"))))
      .filter(col("score") >= threshold)
      .select(col(blockCol), col("id_a"), col("id_b"), col("score"))
  }
}
