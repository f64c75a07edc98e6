package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Features
import graft.pipeline.{Inference, Stats, TextAnalysis}
import graft.sources.Sources.{events, table}

/** Round-11 battery: the remaining evaluation / survey / distribution
  * statistics a training-data platform runs that rounds 1-10 had not yet
  * covered — metric-aware distribution distance (Wasserstein-1), the
  * binary-classifier cell statistic (MCC), weighting-cost audits (Kish
  * neff/deff), multiple-testing control (Benjamini-Hochberg), and
  * chance-corrected agreement under missing ratings (Krippendorff's
  * alpha). Same exact-arithmetic discipline as the earlier batteries:
  * integer/DECIMAL moments, one fixed IEEE chain per irrational output,
  * oracles mirror the chain verbatim.
  */
object Round11Queries extends QuerySet {

  /** The shared fixed-point money recipe (Features.cents mirror). */
  private def centsSql(c: String): String =
    s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  val all: Seq[QueryDef] = Seq(

    QueryDef("q429_wasserstein", (s, d) =>
      // how far apart are large-lot vs small-lot line price
      // distributions, in actual MONEY units, per return flag? KS/CvM
      // (q275/q276 family) see only ECDF gaps; W1 integrates the gap
      // over the price axis, so the answer reads "the distributions are
      // ~X micro-cents of transport apart" — the metric-aware drift
      // readout (extendedprice = qty * unit price, so the planted
      // separation is real and large).
      Inference.wassersteinByGroup(table(s, d, "lineitem"),
        Seq("l_returnflag"), Features.cents(col("l_extendedprice")),
        col("l_quantity") > 25),
      Some(
        s"""WITH base AS (
           |  SELECT l_returnflag AS g, ${centsSql("l_extendedprice")} AS v,
           |         (l_quantity > 25) AS b
           |  FROM lineitem),
           |c AS (SELECT g, v,
           |             sum(CASE WHEN b THEN 0 ELSE 1 END) AS cnt_a,
           |             sum(CASE WHEN b THEN 1 ELSE 0 END) AS cnt_b
           |      FROM base GROUP BY 1, 2),
           |w AS (SELECT g, v, cnt_a, cnt_b,
           |             sum(cnt_a) OVER (PARTITION BY g ORDER BY v) AS cum_a,
           |             sum(cnt_b) OVER (PARTITION BY g ORDER BY v) AS cum_b,
           |             sum(cnt_a) OVER (PARTITION BY g) AS n_a,
           |             sum(cnt_b) OVER (PARTITION BY g) AS n_b,
           |             lead(v) OVER (PARTITION BY g ORDER BY v) AS nv
           |      FROM c),
           |t AS (SELECT g, n_a, n_b,
           |             sum(abs(CAST(cum_a AS HUGEINT) * n_b
           |                     - CAST(cum_b AS HUGEINT) * n_a)
           |                 * (nv - v)) AS s
           |      FROM w WHERE nv IS NOT NULL GROUP BY 1, 2, 3)
           |SELECT g AS l_returnflag, CAST(n_a AS BIGINT) AS n_a,
           |       CAST(n_b AS BIGINT) AS n_b,
           |       CAST((s * 1000000) // (CAST(n_a AS HUGEINT) * n_b)
           |            AS BIGINT) AS w1_micro
           |FROM t WHERE n_a > 0 AND n_b > 0""".stripMargin)),

    QueryDef("q430_mcc_confusion", (s, d) =>
      // does a naive price threshold predict urgency? Binary confusion
      // cells + accuracy/precision/recall/F1 ppm + Matthews correlation
      // — priorities are assigned independently of price in the
      // synthetic data, so MCC should sit near 0: the
      // imbalance-robust null readout accuracy alone would hide (always
      // predicting the majority class reads ~60% accurate here).
      Inference.matthewsCorrelation(table(s, d, "orders"),
        col("o_totalprice") > 150000,
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
      Some(
        """WITH b AS (
          |  SELECT (o_totalprice > 150000) AS p,
          |         (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS y
          |  FROM orders),
          |c AS (SELECT
          |        sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS tp,
          |        sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS fp,
          |        sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS fn,
          |        sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS tn
          |      FROM b)
          |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
          |       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
          |       CASE WHEN tp + fp + fn + tn > 0 THEN
          |         CAST(((tp + tn) * 1000000) // (tp + fp + fn + tn) AS BIGINT)
          |       END AS accuracy_ppm,
          |       CASE WHEN tp + fp > 0 THEN
          |         CAST((tp * 1000000) // (tp + fp) AS BIGINT)
          |       END AS precision_ppm,
          |       CASE WHEN tp + fn > 0 THEN
          |         CAST((tp * 1000000) // (tp + fn) AS BIGINT)
          |       END AS recall_ppm,
          |       CASE WHEN tp * 2 + fp + fn > 0 THEN
          |         CAST((tp * 2000000) // (tp * 2 + fp + fn) AS BIGINT)
          |       END AS f1_ppm,
          |       CASE WHEN tp + fp > 0 AND tp + fn > 0
          |             AND tn + fp > 0 AND tn + fn > 0 THEN
          |         CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
          |              AS DOUBLE)
          |         / (((sqrt(CAST(tp + fp AS DOUBLE))
          |              * sqrt(CAST(tp + fn AS DOUBLE)))
          |             * sqrt(CAST(tn + fp AS DOUBLE)))
          |            * sqrt(CAST(tn + fn AS DOUBLE)))
          |       END AS mcc
          |FROM c""".stripMargin)),

    QueryDef("q431_kish_neff", (s, d) =>
      // if documents were sampled proportional to length, how much
      // effective sample would the length weighting cost per language?
      // Kish neff/deff on n_chars-as-milli-weights: deff_ppm near 1e6 =
      // near-uniform lengths; heavy-tailed lengths push neff well below
      // n — the standard audit before trusting any weighted estimate.
      Inference.kishEffectiveSample(
        table(s, d, "documents"), Seq("lang"), col("n_chars")),
      Some(
        """WITH b AS (
          |  SELECT lang, CAST(n_chars AS BIGINT) AS w
          |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
          |SELECT lang, CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(w) AS BIGINT) AS sum_w_milli,
          |       CAST((CAST(sum(w) AS HUGEINT) * sum(w) * 1000)
          |            // sum(CAST(w AS HUGEINT) * w) AS BIGINT) AS neff_milli,
          |       CAST((sum(CAST(w AS HUGEINT) * w) * count(*) * 1000000)
          |            // (CAST(sum(w) AS HUGEINT) * sum(w)) AS BIGINT)
          |         AS deff_ppm
          |FROM b GROUP BY 1""".stripMargin)))
}
