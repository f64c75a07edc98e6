package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Features
import graft.sources.Sources.{events, table}

/** Round-9 feature-engineering battery: RFM segmentation, leak-free target
  * encoding, exact-arithmetic correlation profiling, and OLS trend fitting —
  * the mart-layer features a model-training pipeline derives from the same
  * star schema the reference reports on. Every value is either an exact
  * integer or ONE IEEE expression over exact integer operands, so the
  * DuckDB oracles hash-match bit-for-bit.
  */
object FeatureQueries extends QuerySet {

  private val centsSql = (c: String) => s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  val all: Seq[QueryDef] = Seq(

    QueryDef("q206_rfm_segments", (s, d) =>
      // RFM quintile segmentation via quantile BOUNDARIES (not ntile — no
      // global total order at scale, and ties never straddle buckets);
      // monetary boundaries on whole dollars to bound the quantile domain
      Features.rfm(table(s, d, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice"),
      Some(
        s"""WITH pc AS (
           |  SELECT o_custkey AS custkey,
           |         max(CAST(o_orderdate AS DATE)) AS last_order,
           |         count(*) AS frequency,
           |         sum(${centsSql("o_totalprice")}) AS monetary_cents
           |  FROM orders GROUP BY 1),
           |ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_date FROM orders),
           |m AS (
           |  SELECT custkey, CAST(ref_date - last_order AS BIGINT) AS recency_days,
           |         CAST(frequency AS BIGINT) AS frequency,
           |         CAST(monetary_cents AS BIGINT) AS monetary_cents
           |  FROM pc, ref),
           |b AS (
           |  SELECT quantile_disc(-recency_days, 0.2) AS r_q200,
           |         quantile_disc(-recency_days, 0.4) AS r_q400,
           |         quantile_disc(-recency_days, 0.6) AS r_q600,
           |         quantile_disc(-recency_days, 0.8) AS r_q800,
           |         quantile_disc(frequency, 0.2) AS f_q200,
           |         quantile_disc(frequency, 0.4) AS f_q400,
           |         quantile_disc(frequency, 0.6) AS f_q600,
           |         quantile_disc(frequency, 0.8) AS f_q800,
           |         quantile_disc(monetary_cents // 100, 0.2) AS m_q200,
           |         quantile_disc(monetary_cents // 100, 0.4) AS m_q400,
           |         quantile_disc(monetary_cents // 100, 0.6) AS m_q600,
           |         quantile_disc(monetary_cents // 100, 0.8) AS m_q800
           |  FROM m),
           |sc AS (
           |  SELECT m.*,
           |         CAST(1 + (-recency_days > r_q200)::INT + (-recency_days > r_q400)::INT
           |                + (-recency_days > r_q600)::INT + (-recency_days > r_q800)::INT
           |              AS INTEGER) AS r_score,
           |         CAST(1 + (frequency > f_q200)::INT + (frequency > f_q400)::INT
           |                + (frequency > f_q600)::INT + (frequency > f_q800)::INT
           |              AS INTEGER) AS f_score,
           |         CAST(1 + (monetary_cents // 100 > m_q200)::INT
           |                + (monetary_cents // 100 > m_q400)::INT
           |                + (monetary_cents // 100 > m_q600)::INT
           |                + (monetary_cents // 100 > m_q800)::INT
           |              AS INTEGER) AS m_score
           |  FROM m, b)
           |SELECT custkey, recency_days, frequency, monetary_cents,
           |       r_score, f_score, m_score,
           |       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
           |            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
           |            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
           |            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
           |            ELSE 'core' END AS segment
           |FROM sc""".stripMargin)),

    QueryDef("q207_target_encoding", (s, d) =>
      // leak-free leave-one-out + smoothed (m=10) target encoding of the
      // customer nation by order value: each order's own target is
      // excluded from its encoding; singleton categories -> NULL LOO.
      // Exact integer division end to end.
      Features.targetEncode(
        table(s, d, "orders").join(table(s, d, "customer"),
          col("o_custkey") === col("c_custkey")),
        keyCol = col("o_orderkey").cast("long"),
        categoryCol = col("c_nationkey").cast("int"),
        targetCents = Features.cents(col("o_totalprice")), m = 10)
        .select(col("key").as("o_orderkey"), col("category").as("nation"),
          col("enc_loo"), col("enc_smooth")),
      Some(
        s"""WITH r AS (
           |  SELECT o_orderkey AS key, CAST(c_nationkey AS INTEGER) AS category,
           |         ${centsSql("o_totalprice")} AS t
           |  FROM orders JOIN customer ON o_custkey = c_custkey),
           |pc AS (SELECT category, sum(t) AS cat_sum, count(*) AS cat_cnt
           |       FROM r GROUP BY 1),
           |g AS (SELECT sum(t) // count(*) AS global_mean FROM r)
           |SELECT key AS o_orderkey, category AS nation,
           |       CASE WHEN cat_cnt > 1
           |            THEN CAST((cat_sum - t) // (cat_cnt - 1) AS BIGINT) END AS enc_loo,
           |       CAST((cat_sum + 10 * global_mean) // (cat_cnt + 10) AS BIGINT)
           |         AS enc_smooth
           |FROM r JOIN pc USING (category), g""".stripMargin)),

    QueryDef("q208_corr_matrix", (s, d) =>
      // pairwise Pearson correlation of the lineitem measures in ONE scan:
      // DECIMAL(38,0)-exact moment sums, one IEEE expression per pair —
      // unlike the builtin corr, identical on any engine and partitioning
      Features.corrMatrix(table(s, d, "lineitem"), Seq(
        "qty" -> Features.cents(col("l_quantity")),
        "ext" -> Features.cents(col("l_extendedprice")),
        "disc" -> Features.cents(col("l_discount")),
        "tax" -> Features.cents(col("l_tax")))),
      Some {
        val pairs = Seq("qty" -> "ext", "qty" -> "disc", "qty" -> "tax",
          "ext" -> "disc", "ext" -> "tax", "disc" -> "tax")
        val selects = pairs.map { case (x, y) =>
          s"""SELECT '$x' AS x_col, '$y' AS y_col, CAST(n AS BIGINT) AS n_rows,
             |       CAST(n*sp_${x}_$y - s_$x*s_$y AS DOUBLE)
             |         / (sqrt(CAST(n*ss_$x - s_$x*s_$x AS DOUBLE))
             |            * sqrt(CAST(n*ss_$y - s_$y*s_$y AS DOUBLE))) AS corr
             |FROM a""".stripMargin
        }
        s"""WITH q AS (
           |  SELECT ${centsSql("l_quantity")} AS qty,
           |         ${centsSql("l_extendedprice")} AS ext,
           |         ${centsSql("l_discount")} AS disc,
           |         ${centsSql("l_tax")} AS tax
           |  FROM lineitem),
           |a AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS n,
           |         sum(CAST(qty AS HUGEINT)) AS s_qty,
           |         sum(CAST(ext AS HUGEINT)) AS s_ext,
           |         sum(CAST(disc AS HUGEINT)) AS s_disc,
           |         sum(CAST(tax AS HUGEINT)) AS s_tax,
           |         sum(CAST(qty*qty AS HUGEINT)) AS ss_qty,
           |         sum(CAST(ext*ext AS HUGEINT)) AS ss_ext,
           |         sum(CAST(disc*disc AS HUGEINT)) AS ss_disc,
           |         sum(CAST(tax*tax AS HUGEINT)) AS ss_tax,
           |         sum(CAST(qty*ext AS HUGEINT)) AS sp_qty_ext,
           |         sum(CAST(qty*disc AS HUGEINT)) AS sp_qty_disc,
           |         sum(CAST(qty*tax AS HUGEINT)) AS sp_qty_tax,
           |         sum(CAST(ext*disc AS HUGEINT)) AS sp_ext_disc,
           |         sum(CAST(ext*tax AS HUGEINT)) AS sp_ext_tax,
           |         sum(CAST(disc*tax AS HUGEINT)) AS sp_disc_tax
           |  FROM q)
           |${selects.mkString("\nUNION ALL\n")}""".stripMargin
      }),

    QueryDef("q209_ols_trend", (s, d) =>
      // per-event-type OLS trend over daily counts: closed-form slope and
      // intercept from exact BIGINT moment sums, each ONE IEEE division —
      // the daily-volume drift detector next to q179's CUSUM
      Features.olsTrend(
        events(s, d).groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("x"))
          .agg(count(lit(1)).as("y")),
        groupCols = Seq("event_type"), xCol = col("x"), yCol = col("y")),
      Some(
        """WITH dc AS (
          |  SELECT event_type,
          |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
          |         CAST(count(*) AS BIGINT) AS y
          |  FROM events GROUP BY 1, 2),
          |a AS (
          |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
          |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          |         sum(CAST(x*x AS HUGEINT)) AS sxx, sum(CAST(x*y AS HUGEINT)) AS sxy
          |  FROM dc GROUP BY 1)
          |SELECT event_type, CAST(n AS BIGINT) AS n_points,
          |       CASE WHEN n*sxx - sx*sx <> 0
          |            THEN CAST(n*sxy - sx*sy AS DOUBLE)
          |                 / CAST(n*sxx - sx*sx AS DOUBLE) END AS slope,
          |       CASE WHEN n*sxx - sx*sx <> 0
          |            THEN CAST(sy*sxx - sx*sxy AS DOUBLE)
          |                 / CAST(n*sxx - sx*sx AS DOUBLE) END AS intercept
          |FROM a""".stripMargin))
  )
}
