package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
