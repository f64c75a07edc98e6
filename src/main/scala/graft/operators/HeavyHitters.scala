package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact frequent-item detection at scale via a Misra-Gries prefilter
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", 2012): one NARROW pass summarizes each partition with k
  * counters, the driver merges the bounded summaries (the merge preserves
  * the n/k error guarantee, so the merged candidate set is a SUPERSET of
  * every item with true frequency > n/k — no false negatives, like
  * [[BloomPrune]]), and one candidate-filtered aggregation computes EXACT
  * counts. The full-cardinality groupBy shuffle — the thing that hurts on
  * a 100 TB token stream with a billion-key vocabulary — never happens;
  * the only shuffle carries candidate rows alone.
  *
  * Driver state is `numPartitions * k` counters (the Clustering-seed
  * bounded-collect contract), raise-guarded. Output is exact and
  * hash-comparable: the prefilter is invisible to correctness, visible
  * only to shuffle bytes.
  */
object HeavyHitters {

  /** Misra-Gries summary of one iterator: at most k (item, count) pairs. */
  private[graft] def mgSummarize(it: Iterator[String], k: Int):
      scala.collection.mutable.HashMap[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val x = it.next()
      if (x != null) {
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // decrement-all: drop every counter by 1, evict zeros
            val dead = List.newBuilder[String]
            counters.foreach { case (key, c) =>
              if (c == 1) dead += key else counters.update(key, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
    }
    counters
  }

  /** Merge two summaries: add counts, then shrink back to k counters by
    * subtracting the (k+1)-largest count from all (the mergeable-summaries
    * rule — error stays <= n/k after any merge tree).
    */
  private[graft] def mgMerge(
      a: scala.collection.mutable.HashMap[String, Long],
      b: scala.collection.mutable.HashMap[String, Long],
      k: Int): scala.collection.mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = a.collect { case (key, c) if c - cut <= 0 => key }.toList
      a.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(a.remove)
    }
    a
  }

  /** All items of `itemCol` with exact count strictly greater than
    * `total/k` (the classic phi = 1/k support threshold), plus the exact
    * total, computed without ever shuffling the full key domain.
    *
    * @param maxPartitionsTimesK raise guard on driver summary state.
    */
  def frequentItems(df: DataFrame, itemCol: Column, k: Int,
      maxPartitionsTimesK: Long = 10000000L): DataFrame = {
    require(k >= 2, s"k: $k")
    val spark = df.sparkSession
    val items = df.select(itemCol.cast("string").as("item"))
    val nPart = items.rdd.getNumPartitions
    require(nPart.toLong * k <= maxPartitionsTimesK,
      s"MG driver state $nPart partitions x $k counters exceeds " +
        s"$maxPartitionsTimesK — raise the guard or coalesce first")
    val summaries = items.as(Encoders.STRING)
      .mapPartitions(it => Iterator.single(mgSummarize(it, k).toSeq))(
        Encoders.kryo[Seq[(String, Long)]])
      .collect()
    val merged = summaries.foldLeft(
      scala.collection.mutable.HashMap.empty[String, Long]) { (acc, s) =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      s.foreach { case (key, c) => m.update(key, c) }
      mgMerge(acc, m, k)
    }
    val candidates = merged.keys.toSeq
    // exact pass: scan filtered to candidates (a plan literal — at most k
    // survivors after merge), tiny shuffle, threshold on the exact total
    val total = items.agg(count(lit(1)).as("total"))
    items.filter(col("item").isin(candidates: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("total"))
      .select(col("item"), col("cnt"), col("total"))
  }
}
