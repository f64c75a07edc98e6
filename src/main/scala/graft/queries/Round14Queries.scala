package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources.{events, table}

/** Round-14 battery (VERDICT r13 next-round list): the weighted
  * mergeable sample (weighted KMV registers composed with the period
  * layout), the five-law drift panel over ONE k-compressed stored
  * baseline with declared distortion envelopes, and the manifest-aware
  * Registry ref. Exact integer arithmetic and verbatim oracle replay
  * throughout (the Round12/13Queries discipline).
  */
object Round14Queries extends QuerySet {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q471_weighted_kmv_sample", (s, d) => {
      // the WEIGHTED rolling sample (Sketches.kmvWeightedRegisters —
      // VERDICT r13 #2): proportional-to-weight corpus sampling as a
      // register table the period layout can maintain. Each day's
      // partition stores the day's bottom-16 over the weight-replicated
      // multiset (id of integer weight w owns w deterministic md5
      // sub-keys — P(id owns the smallest key) = w/sum(w) EXACTLY, no
      // u^(1/w) floats, so the DuckDB oracle replays the order statistic
      // digit for digit); "a weight-proportional sample of the trailing
      // week" is kmvWeightedMerge over readPeriodRange — out-of-window
      // dirs never listed, and the merge law makes the result exactly
      // the bottom-16 of the window's replicated multiset, so the
      // whole-window replay IS the oracle. The same registers feed the
      // (k-1)/U(k) estimator, which here reads the window's TOTAL
      // WEIGHT (distinct sub-items = sum of weights over distinct ids):
      // observed at sf0.01 est 4465 vs exact 5875 (weights id%4+1) —
      // -24%, just inside the 1/sqrt(k-2) ~ 27% one-sigma envelope at
      // k=16 (the deterministic md5 draw landed deep; k=256 callers get
      // 6%); sampled weights lean heavy as proportional sampling must
      // (avg 2.94 vs corpus 2.5), value-inspected.
      import graft.functions.Sketches
      val wh = Scratch.warehouse("q471", d, s, Seq("day_wsample"))
      val ev = events(s, d)
        .select(col("ts").cast("date").cast("string").as("p"),
          col("event_id").cast("long").as("id"))
      wh.writeSwap("day_wsample",
        Sketches.kmvWeightedRegisters(ev, Seq("p"), col("id"),
          col("id") % 4L + 1L, 16),
        partitionBy = Seq("p"))
      val win = Sketches.kmvWeightedMerge(
        wh.readPeriodRange("day_wsample", "2024-01-16", "2024-01-22"),
        Nil, 16)
        .localCheckpoint(false) // feeds the sample rows AND the estimator
      val est = Sketches.kmvDistinctEstimate(win.drop("kmv_w"), Nil, 16)
        .select(col("n_regs"), col("est_distinct").as("est_total_weight"))
      val exact = ev
        .filter(col("p") >= "2024-01-16" && col("p") <= "2024-01-22")
        .select(col("id")).distinct()
        .agg(sum(col("id") % 4L + 1L).cast("long").as("exact_total_weight"))
      win.crossJoin(est).crossJoin(exact)
    }, Some(
      """WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |                  CAST(event_id AS BIGINT) AS id FROM events),
        |d AS (SELECT DISTINCT id FROM e
        |      WHERE day >= DATE '2024-01-16' AND day <= DATE '2024-01-22'),
        |w AS (SELECT id, id % 4 + 1 AS wt FROM d),
        |s AS (SELECT md5(CAST(id AS VARCHAR) || '#' || CAST(j AS VARCHAR))
        |               AS kmv_key,
        |             CAST(id AS VARCHAR) AS kmv_id,
        |             CAST(wt AS BIGINT) AS kmv_w
        |      FROM (SELECT id, wt, unnest(range(0, CAST(wt AS BIGINT))) AS j
        |            FROM w) t),
        |r AS (SELECT kmv_key, kmv_id, kmv_w,
        |             row_number() OVER (ORDER BY kmv_key, kmv_id) AS rn
        |      FROM s),
        |k AS (SELECT kmv_key, kmv_id, kmv_w FROM r WHERE rn <= 16),
        |est AS (SELECT CAST(count(*) AS BIGINT) AS n_regs,
        |               max(kmv_key) AS kth FROM k),
        |e2 AS (SELECT n_regs,
        |              CASE WHEN n_regs < 16 THEN n_regs
        |                   ELSE CAST((CAST(15 AS HUGEINT) * 1152921504606846976)
        |                             // CAST(concat('0x', substr(kth, 1, 15))
        |                                  AS BIGINT) AS BIGINT)
        |              END AS est_total_weight
        |       FROM est),
        |x AS (SELECT CAST(sum(wt) AS BIGINT) AS exact_total_weight FROM w)
        |SELECT k.kmv_key, k.kmv_id, k.kmv_w, e2.n_regs,
        |       e2.est_total_weight, x.exact_total_weight
        |FROM k, e2, x""".stripMargin)),

    QueryDef("q472_compressed_panel", (s, d) => {
      // the FIVE-LAW panel over ONE k-compressed stored baseline
      // (VERDICT r13 #3): q450 proved the compressed-baseline envelope
      // for KS only; W1/TVD/chi2/TD read exact registers today. At 100 TB
      // the stored baseline is the k=256 qsCompress summary — this query
      // states and observes the distortion envelope PER LAW against that
      // one summary. The laws split by what compression preserves:
      //  - KS/W1 read the summary's CDF, whose kept cumulative ranks are
      //    EXACT and whose between-kept-points gap mass is < stride
      //    s = ceil(W/k) — so |F_comp - F_exact| < s/W pointwise, giving
      //    |d_ppm| within ceil(s*1e6/W)+1 (the q450 bound) and
      //    |w1_micro| within ceil(s*span*1e6/W)+1 (the sup-norm bound
      //    integrated over the union support span).
      //  - the categorical trio is scored on the BUCKETING the summary
      //    defines (live value -> smallest kept value >= it; above-max
      //    overflow = its own fresh category): each compressed register's
      //    telescoped weight IS the exact baseline mass of its bucket, so
      //    the bucketed statistics are EXACT statistics of the coarsened
      //    pair, and coarsening can only lose distance — TVD is an L1
      //    coarsening (monotone outright), TD is an f-divergence
      //    (monotone), chi2 is monotone by Cauchy-Schwarz on the
      //    (D_j = ca*n_b - cb*n_a) cell identity — so each bucketed score
      //    must sit at or under its exact sibling (+ n_cats slack for the
      //    per-term truncating divisions chi2/TD sum). Observed at
      //    sf0.01 (value-inspected, W=6682, s=27, all five flags 1):
      //    KS 58048 exact vs 60388 compressed (gap 2340 <= bound 4042);
      //    W1 332.7M vs 387.4M micro (gap 54.7M <= bound 149.8M =
      //    s*span/W with span 37070 cents); TVD 968422 raw-value-grain
      //    (5165 near-distinct categories vs n_b=345 — value-grain TVD
      //    saturates by construction) vs 341920 on the 248-bucket grid;
      //    chi2 5188545 -> 219093 milli; TD 1880432 -> 378498 ppm. Every
      //    flag is computed in-plan from exact integers and replayed by
      //    the oracle.
      import graft.functions.QuantileSketch
      import graft.pipeline.Inference
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val ev = events(s, d)
        .filter(col("value").isNotNull)
        .select(col("ts").cast("date").as("day"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val base = QuantileSketch.qsRegisters(
        ev.filter(col("day") < lit("2024-01-21").cast("date")),
        Nil, col("cents"))
        .localCheckpoint(false) // feeds 6 scorers + the compressor + spans
      val comp = QuantileSketch.qsCompress(base, Nil, k = 256)
        .localCheckpoint(false) // feeds 5 scorers + the bucket grid
      val night = QuantileSketch.qsRegisters(
        ev.filter(col("day") === lit("2024-01-25").cast("date")),
        Nil, col("cents"))
        .localCheckpoint(false) // feeds every scorer + the bucketing
      // live values onto the summary's grid: smallest kept value >= v,
      // overflow past the kept max becomes its own fresh category (the
      // baseline holds zero mass there — full-mass signal preserved)
      val grid = comp.select(col("qs_value").as("gv"))
      val gmax = comp.agg(max(col("qs_value")).as("gmax"))
      val nb = night
        .join(broadcast(grid), col("gv") >= col("qs_value"), "left")
        .groupBy(col("qs_value"), col("qs_weight"))
        .agg(min(col("gv")).as("b"))
        .crossJoin(broadcast(gmax))
        .select(coalesce(col("b"), col("gmax") + 1L).as("qs_value"),
          col("qs_weight"))
        .groupBy(col("qs_value"))
        .agg(sum(col("qs_weight")).as("qs_weight"))
      val ksE = Inference.ksFromRegisters(base, night)
        .select(col("n_a"), col("n_b"), col("d_ppm").as("d_ppm_exact"))
      val ksC = Inference.ksFromRegisters(comp, night)
        .select(col("d_ppm").as("d_ppm_comp"))
      val w1E = Inference.w1FromRegisters(base, night)
        .select(col("w1_micro").as("w1_exact"))
      val w1C = Inference.w1FromRegisters(comp, night)
        .select(col("w1_micro").as("w1_comp"))
      val tvE = Inference.tvdFromRegisters(base, night)
        .select(col("n_cats").as("n_cats_exact"), col("tv_ppm").as("tv_exact"))
      val tvB = Inference.tvdFromRegisters(comp, nb)
        .select(col("n_cats").as("n_cats_bucketed"),
          col("tv_ppm").as("tv_bucketed"))
      val c2E = Inference.chi2FromRegisters(base, night)
        .select(col("chi2_milli").as("chi2_exact"))
      val c2B = Inference.chi2FromRegisters(comp, nb)
        .select(col("chi2_milli").as("chi2_bucketed"))
      val tdE = Inference.tdFromRegisters(base, night)
        .select(col("td_ppm").as("td_exact"))
      val tdB = Inference.tdFromRegisters(comp, nb)
        .select(col("td_ppm").as("td_bucketed"))
      val spanDf = base.select(col("qs_value"))
        .unionByName(night.select(col("qs_value")))
        .agg((max(col("qs_value")) - min(col("qs_value"))).as("span"))
      ksE.crossJoin(ksC).crossJoin(w1E).crossJoin(w1C)
        .crossJoin(tvE).crossJoin(tvB).crossJoin(c2E).crossJoin(c2B)
        .crossJoin(tdE).crossJoin(tdB).crossJoin(spanDf)
        .withColumn("stride_s",
          call_function("div", col("n_a") + 255L, lit(256L)))
        .withColumn("ks_bound_ppm",
          call_function("div",
            col("stride_s") * 1000000L + col("n_a") - 1L, col("n_a")) + 1L)
        .withColumn("ks_within",
          (abs(col("d_ppm_comp") - col("d_ppm_exact")) <= col("ks_bound_ppm"))
            .cast("long"))
        .withColumn("w1_bound_micro",
          call_function("div",
            dec(col("stride_s")) * col("span") * lit(1000000L)
              + col("n_a") - 1L, dec(col("n_a"))).cast("long") + 1L)
        .withColumn("w1_within",
          (abs(col("w1_comp") - col("w1_exact")) <= col("w1_bound_micro"))
            .cast("long"))
        .withColumn("tv_mono",
          (col("tv_bucketed") <= col("tv_exact")).cast("long"))
        // chi2 sums TWO truncating divisions per category (the a-side and
        // b-side terms), so the floor-vs-real slack is 2*n_cats millis;
        // TD sums one per category — n_cats ppm
        .withColumn("chi2_mono",
          (col("chi2_bucketed") <= col("chi2_exact") + col("n_cats_exact") * 2L)
            .cast("long"))
        .withColumn("td_mono",
          (col("td_bucketed") <= col("td_exact") + col("n_cats_exact"))
            .cast("long"))
    }, Some(
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT c AS v, CAST(count(*) AS BIGINT) AS w
        |      FROM e WHERE day < DATE '2024-01-21' GROUP BY 1),
        |ngt AS (SELECT c AS v, CAST(count(*) AS BIGINT) AS w
        |        FROM e WHERE day = DATE '2024-01-25' GROUP BY 1),
        |cb AS (SELECT v, w, sum(w) OVER (ORDER BY v) AS cum,
        |              sum(w) OVER () AS tot FROM a),
        |kb AS (SELECT v, cum - coalesce(lag(cum) OVER (ORDER BY v), 0) AS w
        |       FROM (SELECT v, cum
        |             FROM cb
        |             WHERE (cum // ((tot + 255) // 256))
        |                     > ((cum - w) // ((tot + 255) // 256))
        |                OR cum = tot) t),
        |mx AS (SELECT max(v) AS gmax FROM kb),
        |nbm AS (SELECT n.v AS v0, n.w, min(k.v) AS b
        |        FROM ngt n LEFT JOIN kb k ON k.v >= n.v GROUP BY 1, 2),
        |nb AS (SELECT coalesce(b, mx.gmax + 1) AS v,
        |              CAST(sum(w) AS BIGINT) AS w
        |       FROM nbm, mx GROUP BY 1),
        |uE AS (SELECT v, CAST(sum(ca) AS BIGINT) AS ca,
        |              CAST(sum(cb2) AS BIGINT) AS cb2
        |       FROM (SELECT v, w AS ca, 0 AS cb2 FROM a
        |             UNION ALL SELECT v, 0, w FROM ngt) t
        |       GROUP BY 1 HAVING sum(ca) + sum(cb2) > 0),
        |uC AS (SELECT v, CAST(sum(ca) AS BIGINT) AS ca,
        |              CAST(sum(cb2) AS BIGINT) AS cb2
        |       FROM (SELECT v, w AS ca, 0 AS cb2 FROM kb
        |             UNION ALL SELECT v, 0, w FROM ngt) t
        |       GROUP BY 1 HAVING sum(ca) + sum(cb2) > 0),
        |uB AS (SELECT v, CAST(sum(ca) AS BIGINT) AS ca,
        |              CAST(sum(cb2) AS BIGINT) AS cb2
        |       FROM (SELECT v, w AS ca, 0 AS cb2 FROM kb
        |             UNION ALL SELECT v, 0, w FROM nb) t
        |       GROUP BY 1 HAVING sum(ca) + sum(cb2) > 0),
        |sE AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cum_a,
        |              sum(cb2) OVER (ORDER BY v) AS cum_b,
        |              lead(v) OVER (ORDER BY v) AS nv,
        |              sum(ca) OVER () AS n_a, sum(cb2) OVER () AS n_b
        |       FROM uE),
        |sC AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cum_a,
        |              sum(cb2) OVER (ORDER BY v) AS cum_b,
        |              lead(v) OVER (ORDER BY v) AS nv,
        |              sum(ca) OVER () AS n_a, sum(cb2) OVER () AS n_b
        |       FROM uC),
        |dE AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |              CAST((CAST(max(abs(CAST(cum_a AS HUGEINT) * n_b
        |                                - CAST(cum_b AS HUGEINT) * n_a))
        |                         AS HUGEINT) * 1000000)
        |                   // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
        |                AS d_ppm_exact
        |       FROM sE GROUP BY n_a, n_b),
        |dC AS (SELECT CAST((CAST(max(abs(CAST(cum_a AS HUGEINT) * n_b
        |                                - CAST(cum_b AS HUGEINT) * n_a))
        |                         AS HUGEINT) * 1000000)
        |                   // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
        |                AS d_ppm_comp
        |       FROM sC GROUP BY n_a, n_b),
        |wE AS (SELECT CAST((coalesce(sum(abs(CAST(cum_a AS HUGEINT) * n_b
        |                                     - CAST(cum_b AS HUGEINT) * n_a)
        |                                 * (nv - v)), 0) * 1000000)
        |                   // (CAST(max(n_a) AS HUGEINT) * max(n_b))
        |                   AS BIGINT) AS w1_exact
        |       FROM sE WHERE nv IS NOT NULL),
        |wC AS (SELECT CAST((coalesce(sum(abs(CAST(cum_a AS HUGEINT) * n_b
        |                                     - CAST(cum_b AS HUGEINT) * n_a)
        |                                 * (nv - v)), 0) * 1000000)
        |                   // (CAST(max(n_a) AS HUGEINT) * max(n_b))
        |                   AS BIGINT) AS w1_comp
        |       FROM sC WHERE nv IS NOT NULL),
        |tE AS (SELECT CAST(count(*) AS BIGINT) AS n_cats_exact,
        |              CAST(sum(ca) AS BIGINT) AS na,
        |              CAST(sum(cb2) AS BIGINT) AS nb2 FROM uE),
        |tB AS (SELECT CAST(count(*) AS BIGINT) AS n_cats_bucketed,
        |              CAST(sum(ca) AS BIGINT) AS na,
        |              CAST(sum(cb2) AS BIGINT) AS nb2 FROM uB),
        |tvE AS (SELECT CAST((sum(abs(CAST(ca AS HUGEINT) * tE.nb2
        |                             - CAST(cb2 AS HUGEINT) * tE.na))
        |                     * 1000000)
        |                    // (2 * CAST(tE.na AS HUGEINT) * tE.nb2)
        |                    AS BIGINT) AS tv_exact
        |        FROM uE, tE GROUP BY tE.na, tE.nb2),
        |tvB AS (SELECT CAST((sum(abs(CAST(ca AS HUGEINT) * tB.nb2
        |                             - CAST(cb2 AS HUGEINT) * tB.na))
        |                     * 1000000)
        |                    // (2 * CAST(tB.na AS HUGEINT) * tB.nb2)
        |                    AS BIGINT) AS tv_bucketed
        |        FROM uB, tB GROUP BY tB.na, tB.nb2),
        |c2E AS (SELECT CAST(sum(
        |                 ((CAST(ca AS HUGEINT)*(na+nb2) - CAST(na AS HUGEINT)*(ca+cb2))
        |                  *(CAST(ca AS HUGEINT)*(na+nb2) - CAST(na AS HUGEINT)*(ca+cb2)) * 1000)
        |                 // (CAST(na+nb2 AS HUGEINT) * na * (ca+cb2))
        |               + ((CAST(cb2 AS HUGEINT)*(na+nb2) - CAST(nb2 AS HUGEINT)*(ca+cb2))
        |                  *(CAST(cb2 AS HUGEINT)*(na+nb2) - CAST(nb2 AS HUGEINT)*(ca+cb2)) * 1000)
        |                 // (CAST(na+nb2 AS HUGEINT) * nb2 * (ca+cb2))) AS BIGINT)
        |                 AS chi2_exact
        |        FROM uE, tE GROUP BY tE.na, tE.nb2),
        |c2B AS (SELECT CAST(sum(
        |                 ((CAST(ca AS HUGEINT)*(na+nb2) - CAST(na AS HUGEINT)*(ca+cb2))
        |                  *(CAST(ca AS HUGEINT)*(na+nb2) - CAST(na AS HUGEINT)*(ca+cb2)) * 1000)
        |                 // (CAST(na+nb2 AS HUGEINT) * na * (ca+cb2))
        |               + ((CAST(cb2 AS HUGEINT)*(na+nb2) - CAST(nb2 AS HUGEINT)*(ca+cb2))
        |                  *(CAST(cb2 AS HUGEINT)*(na+nb2) - CAST(nb2 AS HUGEINT)*(ca+cb2)) * 1000)
        |                 // (CAST(na+nb2 AS HUGEINT) * nb2 * (ca+cb2))) AS BIGINT)
        |                 AS chi2_bucketed
        |        FROM uB, tB GROUP BY tB.na, tB.nb2),
        |tdE AS (SELECT CAST(sum(
        |                 ((CAST(ca AS HUGEINT) * nb2 - CAST(cb2 AS HUGEINT) * na)
        |                  * (CAST(ca AS HUGEINT) * nb2 - CAST(cb2 AS HUGEINT) * na)
        |                  * 1000000)
        |                 // (CAST(na AS HUGEINT) * nb2
        |                    * (CAST(ca AS HUGEINT) * nb2
        |                       + CAST(cb2 AS HUGEINT) * na))) AS BIGINT)
        |                 AS td_exact
        |        FROM uE, tE GROUP BY tE.na, tE.nb2),
        |tdB AS (SELECT CAST(sum(
        |                 ((CAST(ca AS HUGEINT) * nb2 - CAST(cb2 AS HUGEINT) * na)
        |                  * (CAST(ca AS HUGEINT) * nb2 - CAST(cb2 AS HUGEINT) * na)
        |                  * 1000000)
        |                 // (CAST(na AS HUGEINT) * nb2
        |                    * (CAST(ca AS HUGEINT) * nb2
        |                       + CAST(cb2 AS HUGEINT) * na))) AS BIGINT)
        |                 AS td_bucketed
        |        FROM uB, tB GROUP BY tB.na, tB.nb2),
        |sp AS (SELECT CAST(max(v) - min(v) AS BIGINT) AS span
        |       FROM (SELECT v FROM a UNION SELECT v FROM ngt) t),
        |bd AS (SELECT dE.n_a, dE.n_b, sp.span,
        |              (dE.n_a + 255) // 256 AS stride_s
        |       FROM dE, sp)
        |SELECT dE.n_a, dE.n_b, dE.d_ppm_exact, dC.d_ppm_comp,
        |       wE.w1_exact, wC.w1_comp,
        |       tE.n_cats_exact, tvE.tv_exact, tvB.tv_bucketed,
        |       tB.n_cats_bucketed,
        |       c2E.chi2_exact, c2B.chi2_bucketed, tdE.td_exact,
        |       tdB.td_bucketed, bd.span, bd.stride_s,
        |       CAST((bd.stride_s * 1000000 + bd.n_a - 1) // bd.n_a + 1
        |            AS BIGINT) AS ks_bound_ppm,
        |       CAST(abs(dC.d_ppm_comp - dE.d_ppm_exact)
        |            <= (bd.stride_s * 1000000 + bd.n_a - 1) // bd.n_a + 1
        |            AS BIGINT) AS ks_within,
        |       CAST((CAST(bd.stride_s AS HUGEINT) * bd.span * 1000000
        |             + bd.n_a - 1) // bd.n_a + 1 AS BIGINT) AS w1_bound_micro,
        |       CAST(abs(wC.w1_comp - wE.w1_exact)
        |            <= (CAST(bd.stride_s AS HUGEINT) * bd.span * 1000000
        |                + bd.n_a - 1) // bd.n_a + 1
        |            AS BIGINT) AS w1_within,
        |       CAST(tvB.tv_bucketed <= tvE.tv_exact AS BIGINT) AS tv_mono,
        |       CAST(c2B.chi2_bucketed <= c2E.chi2_exact + 2 * tE.n_cats_exact
        |            AS BIGINT) AS chi2_mono,
        |       CAST(tdB.td_bucketed <= tdE.td_exact + tE.n_cats_exact
        |            AS BIGINT) AS td_mono
        |FROM dE, dC, wE, wC, tE, tB, tvE, tvB, c2E, c2B, tdE, tdB, sp, bd"""
        .stripMargin)),

    QueryDef("q473_stream_weighted_kmv", (s, d) => {
      // the STREAMING weighted sample (EventsStream.kmvWeightedSampleStream
      // — q467's uniform bridge with proportional-to-weight draw): each
      // micro-batch's per-event-type weighted bottom-8 merges into the
      // stored sample by the exact re-take-k law, k-bounded state by
      // construction, and stream == batch is an IDENTITY (sub-keys are
      // deterministic functions of (id, weight), re-take-k idempotent —
      // effectively exactly-once with no batch-id ledger), so the
      // whole-table replay IS the oracle. Weight = user_id % 4 + 1, a
      // stable function of the id (the merge contract).
      import graft.streaming.EventsStream
      val wh = Scratch.warehouse("q473", d, s, Seq("type_wsample"))
      Scratch.resetCheckpoint(wh, "type_wsample")
      EventsStream.kmvWeightedSampleStream(
        EventsStream.readEvents(s, d).filter(col("user_id").isNotNull),
        wh, "type_wsample", Seq("event_type"),
        col("user_id").cast("long"), col("user_id").cast("long") % 4L + 1L, 8)
        .awaitTermination()
      wh.read("type_wsample")
    }, Some(
      """WITH d AS (SELECT DISTINCT event_type,
        |                  CAST(user_id AS BIGINT) AS id FROM events
        |           WHERE user_id IS NOT NULL),
        |w AS (SELECT event_type, id, id % 4 + 1 AS wt FROM d),
        |s AS (SELECT event_type,
        |             md5(CAST(id AS VARCHAR) || '#' || CAST(j AS VARCHAR))
        |               AS kmv_key,
        |             CAST(id AS VARCHAR) AS kmv_id,
        |             CAST(wt AS BIGINT) AS kmv_w
        |      FROM (SELECT event_type, id, wt,
        |                   unnest(range(0, CAST(wt AS BIGINT))) AS j
        |            FROM w) t),
        |r AS (SELECT event_type, kmv_key, kmv_id, kmv_w,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY kmv_key, kmv_id) AS rn
        |      FROM s)
        |SELECT event_type, kmv_key, kmv_id, kmv_w
        |FROM r WHERE rn <= 8""".stripMargin)),

    QueryDef("q474_ref_point_lookup", (s, d) => {
      // the declared-predicate ref's POINT-LOOKUP face (VERDICT r13 #5
      // beside q464's window+range): the consumer model declares
      // `ref("li_keys", RefIn(okey, keys))` and the materializer routes
      // through readPrunedIn — bloom membership INTERSECTED with min/max
      // bounds decides the file set before Spark lists anything, the
      // "fetch these N keys" batch shape at 100 TB. Semantics identical
      // to ref().filter(isin); the plain IN aggregate is the oracle
      // (RegistrySpec pins the routed file skipping itself).
      import graft.engine.{Model, RefIn, Registry, ViewMat}
      val wh = Scratch.warehouse("q474", d, s, Seq("li_keys"))
      wh.writeSwap("li_keys", table(s, d, "lineitem").select(
        col("l_orderkey").cast("long").as("okey"),
        col("l_quantity").cast("long").as("qty"),
        col("l_returnflag").as("flag"))
        .repartitionByRange(16, col("okey"))
        .sortWithinPartitions("okey"),
        statsCols = Seq("okey"), bloomCols = Seq("okey"))
      val reg = new Registry(s, wh)
      reg.register(Model("picked", Seq("li_keys"), ViewMat, ctx =>
        ctx.ref("li_keys", Seq(RefIn("okey",
            Seq(1L, 7L, 4000L, 29988L, 59999L))))
          .groupBy(col("flag"))
          .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"),
            countDistinct(col("okey")).as("n_keys"))))
      reg.run()
      reg.relation("picked")
    }, Some(
      """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys
        |FROM lineitem
        |WHERE CAST(l_orderkey AS BIGINT) IN (1, 7, 4000, 29988, 59999)
        |GROUP BY 1""".stripMargin)),

    QueryDef("q475_weighted_kmv_jaccard", (s, d) => {
      // WEIGHTED Jaccard from two weighted register tables — the
      // replicated-multiset identity does all the work: with per-side
      // integer weights w_A(id), w_B(id) and SHARED sub-keys
      // md5(id#j), the sub-item sets satisfy |A' n B'| = sum min(w_A,
      // w_B) and |A' u B'| = sum max — so the plain kmvJaccard over the
      // two weighted register tables estimates the canonical weighted
      // Jaccard sum(min)/sum(max), no new estimator needed. Urgent vs
      // low-priority buyers weighted by per-customer order count
      // (capped at 8): the overlap measure now weighs REPEAT buyers,
      // not mere membership. Exact sum(min)/sum(max) joined alongside
      // from one full-outer rollup: observed at sf0.01 est 441406 ppm
      // (113 of the 256-key union sample in both) vs exact 450813
      // (sum_min 1856, sum_max 4117) — -2.1%, inside the binomial
      // envelope, value-inspected.
      import graft.functions.Sketches
      val o = table(s, d, "orders").select(
        col("o_orderpriority").as("pr"), col("o_custkey").cast("long").as("ck"))
      def wside(p: String) = o.filter(col("pr") === p)
        .groupBy(col("ck")).agg(least(count(lit(1)), lit(8L)).as("w"))
      val wa = wside("1-URGENT").localCheckpoint(false) // regs + exact
      val wb = wside("5-LOW").localCheckpoint(false)
      def regs(side: org.apache.spark.sql.DataFrame) =
        Sketches.kmvWeightedRegisters(side, Nil, col("ck"), col("w"),
          256, maxWeight = 8).drop("kmv_w")
      val est = Sketches.kmvJaccard(regs(wa), regs(wb), 256)
      val ex = wa.withColumnRenamed("w", "w_a")
        .join(wb.withColumnRenamed("w", "w_b"), Seq("ck"), "full_outer")
        .agg(
          sum(least(coalesce(col("w_a"), lit(0L)),
            coalesce(col("w_b"), lit(0L)))).cast("long").as("sum_min"),
          sum(greatest(coalesce(col("w_a"), lit(0L)),
            coalesce(col("w_b"), lit(0L)))).cast("long").as("sum_max"))
        .withColumn("exact_jw_ppm", call_function("div",
          col("sum_min").cast("decimal(38,0)") * lit(1000000L),
          col("sum_max").cast("decimal(38,0)")).cast("long"))
      est.crossJoin(ex)
    }, Some(
      """WITH o AS (SELECT o_orderpriority AS pr,
        |                  CAST(o_custkey AS BIGINT) AS ck FROM orders),
        |wa AS (SELECT ck, least(CAST(count(*) AS BIGINT), 8) AS w
        |       FROM o WHERE pr = '1-URGENT' GROUP BY 1),
        |wb AS (SELECT ck, least(CAST(count(*) AS BIGINT), 8) AS w
        |       FROM o WHERE pr = '5-LOW' GROUP BY 1),
        |sa AS (SELECT md5(CAST(ck AS VARCHAR) || '#' || CAST(j AS VARCHAR))
        |               AS key
        |       FROM (SELECT ck, unnest(range(0, w)) AS j FROM wa) t),
        |sb AS (SELECT md5(CAST(ck AS VARCHAR) || '#' || CAST(j AS VARCHAR))
        |               AS key
        |       FROM (SELECT ck, unnest(range(0, w)) AS j FROM wb) t),
        |ra AS (SELECT key FROM (
        |         SELECT key, row_number() OVER (ORDER BY key) AS rn FROM sa) t
        |       WHERE rn <= 256),
        |rb AS (SELECT key FROM (
        |         SELECT key, row_number() OVER (ORDER BY key) AS rn FROM sb) t
        |       WHERE rn <= 256),
        |uk AS (SELECT DISTINCT key FROM (SELECT key FROM ra
        |                                 UNION ALL SELECT key FROM rb) t),
        |us AS (SELECT key FROM (
        |         SELECT key, row_number() OVER (ORDER BY key) AS rn FROM uk) t
        |       WHERE rn <= 256),
        |ov AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap
        |       FROM us JOIN ra USING (key) JOIN rb USING (key)),
        |un AS (SELECT CAST(count(*) AS BIGINT) AS n_union FROM us),
        |ex AS (SELECT CAST(sum(least(coalesce(wa.w, 0), coalesce(wb.w, 0)))
        |                   AS BIGINT) AS sum_min,
        |              CAST(sum(greatest(coalesce(wa.w, 0), coalesce(wb.w, 0)))
        |                   AS BIGINT) AS sum_max
        |       FROM wa FULL OUTER JOIN wb ON wa.ck = wb.ck)
        |SELECT un.n_union, ov.n_overlap,
        |       CAST((CAST(ov.n_overlap AS HUGEINT) * 1000000)
        |            // un.n_union AS BIGINT) AS j_ppm,
        |       ex.sum_min, ex.sum_max,
        |       CAST((CAST(ex.sum_min AS HUGEINT) * 1000000)
        |            // ex.sum_max AS BIGINT) AS exact_jw_ppm
        |FROM un, ov, ex""".stripMargin)),

    QueryDef("q476_mixture_weighted_sample", (s, d) => {
      // the MIXTURE-weighted corpus sample — the pretraining-mix use the
      // weighted registers exist for: declared per-language upweights
      // (en=1, de=4, es=6, fr=8, zh=10 — boost the rare languages) turn
      // "sample 32 documents mixture-proportionally" into ONE weighted
      // bottom-k register table; at 100 TB this is a single bounded
      // aggregate, where the q365 mixture-rebalance planner materializes
      // per-source allocations. Output: the sample's per-language
      // composition beside each language's exact weighted-mass share —
      // observed at sf0.01 (total mass 2198 over ~500 docs): zh 13/32 =
      // 406250 sample-ppm vs 341219 mass-ppm, en 2/32 = 62500 vs 99181
      // — the upweighted tails dominate the draw as declared while en
      // (weight 1, most documents) recedes, value-inspected. The sample
      // is of weighted SUB-ITEMS (an id can hold two slots), matching
      // the replicated-multiset law the oracle replays.
      import graft.functions.Sketches
      val langW = when(col("lang") === "en", 1L)
        .when(col("lang") === "de", 4L).when(col("lang") === "es", 6L)
        .when(col("lang") === "fr", 8L).otherwise(10L)
      val docs = table(s, d, "documents")
        .select(col("doc_id").cast("long").as("id"), col("lang"))
        .withColumn("w", langW)
        .localCheckpoint(false) // feeds the registers, the join-back, the mass
      val sample = Sketches.kmvWeightedRegisters(docs, Nil, col("id"),
        col("w"), 32, maxWeight = 16)
      val comp = sample
        .join(docs.withColumn("kmv_id", col("id").cast("string")),
          Seq("kmv_id"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
      val mass = docs.groupBy(col("lang"))
        .agg(sum(col("w")).cast("long").as("w_mass"))
      val total = docs.agg(sum(col("w")).cast("long").as("w_total"))
      mass.join(comp, Seq("lang"), "left")
        .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
        .crossJoin(broadcast(total))
        .withColumn("mass_ppm", call_function("div",
          col("w_mass").cast("decimal(38,0)") * lit(1000000L),
          col("w_total").cast("decimal(38,0)")).cast("long"))
        .withColumn("sample_ppm", call_function("div",
          col("n_sampled").cast("decimal(38,0)") * lit(1000000L),
          lit(32L).cast("decimal(38,0)")).cast("long"))
    }, Some(
      """WITH dcs AS (SELECT CAST(doc_id AS BIGINT) AS id, lang,
        |                  CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 4
        |                       WHEN 'es' THEN 6 WHEN 'fr' THEN 8
        |                       ELSE 10 END AS w
        |           FROM documents),
        |s AS (SELECT id, lang,
        |             md5(CAST(id AS VARCHAR) || '#' || CAST(j AS VARCHAR))
        |               AS key
        |      FROM (SELECT id, lang, unnest(range(0, CAST(w AS BIGINT))) AS j
        |            FROM dcs) t),
        |r AS (SELECT id, lang,
        |             row_number() OVER (ORDER BY key, CAST(id AS VARCHAR)) AS rn
        |      FROM s),
        |k AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
        |      FROM r WHERE rn <= 32 GROUP BY 1),
        |m AS (SELECT lang, CAST(sum(w) AS BIGINT) AS w_mass FROM dcs GROUP BY 1),
        |tt AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM dcs)
        |SELECT m.lang, m.w_mass, coalesce(k.n_sampled, 0) AS n_sampled,
        |       tt.w_total,
        |       CAST((CAST(m.w_mass AS HUGEINT) * 1000000)
        |            // tt.w_total AS BIGINT) AS mass_ppm,
        |       CAST((CAST(coalesce(k.n_sampled, 0) AS HUGEINT) * 1000000)
        |            // 32 AS BIGINT) AS sample_ppm
        |FROM m LEFT JOIN k ON m.lang = k.lang, tt""".stripMargin))
  )
}
