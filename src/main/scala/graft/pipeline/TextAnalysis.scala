package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines (builder
  * brief; additive to the reference surface, designed stateless/partitionable
  * so they scale linearly with input splits — no shuffles except final aggs).
  *
  * Everything is a pure `Column` combinator over Spark's codegen'd
  * higher-order array functions: no UDFs, whole-stage codegen keeps these in
  * one pass over the text.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the corpus is space-separated; a BPE-ish regex
    * variant is `tokensRegex`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: word pieces, numbers, or single non-space
    * symbols — the shape GPT-style pre-tokenizers use.
    */
  def tokensRegex(text: Column): Column =
    // drop empty leading match artifacts
    filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9 ])"), t => length(trim(t)) > 0)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Fraction of tokens in `stopwords`; exact int/int -> double division. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
      size(toks).cast("double")
  }

  /** Deterministic quality score: length saturation x (1 - stopword load).
    * Matches the "length/punct/stopword ratios" heuristic family.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    least(lit(1.0), tokenCount(text).cast("double") / lit(100.0)) *
      (lit(1.0) - stopwordRatio(text, stopwords))

  /** Marker-stopword language ID: score each language by marker-token hits,
    * argmax with deterministic tie-break on declaration order; 'und' when no
    * marker hits.
    */
  def langGuess(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(text)
    // each per-language score is evaluated exactly ONCE (inside the array
    // literal); the argmax is a fold over that array — the greatest+when
    // chain shape would re-evaluate every score per comparison branch
    val entries = markers.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isInCollection(words))).as("s"),
        lit(lang).as("lang"))
    }
    // strict > keeps the FIRST maximal language (declaration-order tie-break);
    // the zero seed means a language needs s > 0 to beat 'und'
    val best = aggregate(array(entries: _*),
      struct(lit(0).as("s"), lit("und").as("lang")),
      (acc, e) => when(e("s") > acc("s"), e).otherwise(acc))
    best("lang")
  }

  /** Normalized content fingerprint (exact-dup key): md5 of lowercased,
    * space-collapsed text.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, " +", " ")))

  /** Corpus vocabulary: per-token term frequency + document frequency.
    * Shaped as two NARROW shuffles — (token, doc) pre-aggregation rolls up
    * to (token) — instead of a countDistinct whose distinct-expand would
    * re-shuffle every occurrence row (the q12 lesson at corpus scale).
    */
  def vocabulary(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("token"))
      .agg(sum(col("n")).as("tf"), count(lit(1)).as("df"))

  /** Word n-gram shingles, distinct (the unit for Jaccard/minhash dedup).
    *
    * PERFORMANCE: `toks` must be a MATERIALIZED column (an attribute), not a
    * raw `split(...)` expression — Spark does no common-subexpression
    * elimination inside higher-order-function lambdas, so an inline split
    * would be recomputed per shingle position (O(tokens^2) per document).
    * Callers: `.select(tokens(col).as("toks"))` first, then shingle from
    * `col("toks")` in a SECOND projection (the multi-reference of a non-cheap
    * alias keeps CollapseProject from merging the two).
    */
  def shinglesFromTokens(text: Column, toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array(text)))

  /** Convenience single-expression form — ONLY for tiny inputs/tests; see
    * shinglesFromTokens for the production two-projection shape.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(text, tokens(text), n)

  /** PII scrubbing patterns, deliberately engine-portable (plain character
    * classes + \b, identical under java.util.regex and RE2-family engines).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Redact email- and phone-shaped spans with typed placeholders — the
    * pre-training PII scrub. Pure codegen'd regexp columns, one pass per
    * pattern, embarrassingly parallel.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Fixed-size token chunking with overlap (the context-window packing
    * primitive): consecutive `chunkTokens`-token windows advancing by
    * `stride` tokens; the tail window may be shorter. Returns an array of
    * (chunk_id, chunk, n_tokens) structs — `explode` it for one row per
    * chunk. All arithmetic is exact integers, so chunk boundaries reproduce
    * identically on any engine.
    *
    * `toks` must be a materialized attribute (same no-CSE-in-lambdas rule as
    * [[shinglesFromTokens]]).
    */
  def chunksFromTokens(toks: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      s"chunkTokens=$chunkTokens stride=$stride")
    // nChunks = 1 for n <= chunk, else 1 + ceil((n - chunk) / stride) —
    // integer ceil-div keeps both engines bit-identical
    val n = size(toks)
    // ceil-div on exact small ints via double floor (IEEE-exact below 2^53)
    val nChunks = when(n <= chunkTokens, lit(1))
      .otherwise(lit(1) +
        floor((n - chunkTokens + stride - 1).cast("double") / lit(stride)).cast("int"))
    transform(sequence(lit(0), nChunks - 1), i => struct(
      i.cast("long").as("chunk_id"),
      concat_ws(" ", slice(toks, i * stride + 1, lit(chunkTokens))).as("chunk"),
      least(lit(chunkTokens), n - i * stride).cast("long").as("n_tokens")))
  }
}
