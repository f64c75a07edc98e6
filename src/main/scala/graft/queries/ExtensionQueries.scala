package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, EventAnalytics, GenericTests}
import graft.sources.Sources
import graft.sources.Sources.{events, table}

/** Round-9 late additions: format interchange (ORC), runtime bloom join
  * pruning, multi-touch attribution, session path mining, Benford DQ
  * profiling, join-skew diagnosis, and contrastive negative mining — each
  * with a value-exact DuckDB oracle (integer `div` arithmetic and string
  * digit extraction everywhere a float could drift).
  */
object ExtensionQueries extends QuerySet {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q192_orc_roundtrip", (s, d) => {
      // ORC interchange: parquet -> ORC (zstd) -> read back -> roll-up.
      // The oracle computes the same roll-up from the SOURCE parquet, so a
      // hash match proves the ORC write/read preserved every row, the
      // microsecond timestamps, and the float payloads bit-exactly.
      val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_scratch_q192_${Integer.toHexString(d.hashCode)}" +
          s"_p${ProcessHandle.current().pid()}").toString
      val src = events(s, d).select(col("event_id").cast("long").as("event_id"),
        col("ts"), col("user_id").cast("long").as("user_id"),
        col("event_type"), col("value"))
      Sources.writeOrc(src, s"$root/events_orc")
      Sources.orc(s, s"$root/events_orc")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("event_id")).as("sum_event_id"),
          sum(col("user_id")).as("sum_user_id"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          max(col("ts")).as("max_ts"))
    }, Some(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(event_id) AS BIGINT) AS sum_event_id,
        |       CAST(sum(user_id) AS BIGINT) AS sum_user_id,
        |       min("value") AS min_value, max("value") AS max_value,
        |       max(ts) AS max_ts
        |FROM events GROUP BY 1""".stripMargin)),

    QueryDef("q193_bloom_semi_join", (s, d) => {
      // bloom-prefiltered semi join: high-value orders (~4% of keys) prune
      // the lineitem scan BEFORE its shuffle. The bloom has no false
      // negatives, so the result is EXACTLY the plain semi join the oracle
      // runs — the prefilter is invisible to correctness, visible only to
      // shuffle bytes (ExtensionsSpec pins the superset/pruning behavior).
      val hot = table(s, d, "orders")
        .filter(col("o_totalprice") > 480000.0)
        .select(col("o_orderkey"))
      BloomPrune.semiJoinWithBloom(
        table(s, d, "lineitem"), hot, "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    }, Some(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000)
        |GROUP BY 1""".stripMargin)),

    QueryDef("q194_attribution", (s, d) =>
      // multi-touch attribution: purchases credit the view/click/signup
      // touches of the prior 3 days — first-touch, last-touch, and exact
      // integer-milli linear credit per touch type
      EventAnalytics.attribution(events(s, d), conversionType = "purchase",
        touchTypes = Seq("view", "click", "signup"), lookbackDays = 3),
      Some(
        """WITH convs AS (
          |  SELECT user_id, event_id AS conv_id, ts AS conv_ts
          |  FROM events WHERE event_type = 'purchase'),
          |t AS (
          |  SELECT e.event_type AS touch, e.ts, e.event_id, c.conv_id
          |  FROM events e JOIN convs c ON e.user_id = c.user_id
          |   AND e.ts < c.conv_ts AND e.ts >= c.conv_ts - INTERVAL 3 DAY
          |  WHERE e.event_type IN ('view', 'click', 'signup')),
          |w AS (
          |  SELECT touch, conv_id,
          |         row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS rf,
          |         row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, event_id DESC) AS rl,
          |         count(*) OVER (PARTITION BY conv_id) AS total
          |  FROM t),
          |c AS (
          |  SELECT conv_id, touch, count(*) AS cnt, max(total) AS tot,
          |         max(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS isf,
          |         max(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS isl
          |  FROM w GROUP BY 1, 2)
          |SELECT touch AS event_type, CAST(sum(isf) AS BIGINT) AS first_touch,
          |       CAST(sum(isl) AS BIGINT) AS last_touch,
          |       CAST(sum(cnt * 1000 // tot) AS BIGINT) AS linear_milli
          |FROM c GROUP BY 1""".stripMargin)),

    QueryDef("q195_session_paths", (s, d) =>
      // top-20 frequent session paths: 30-min inactivity sessionization,
      // first 5 event types as the path string, deterministic
      // (count desc, path) ordering -> TakeOrdered, no global sort
      EventAnalytics.sessionPaths(events(s, d), gapMinutes = 30,
        maxSteps = 5, topK = 20),
      Some(
        """WITH g AS (
          |  SELECT user_id, event_id, event_type, ts,
          |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
          |                (PARTITION BY user_id ORDER BY ts, event_id)
          |              > 30 * 60000000 THEN 1
          |              WHEN lag(ts) OVER
          |                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
          |              ELSE 0 END AS new_sess
          |  FROM events),
          |se AS (
          |  SELECT *, sum(new_sess) OVER
          |           (PARTITION BY user_id ORDER BY ts, event_id
          |            ROWS UNBOUNDED PRECEDING) AS sess
          |  FROM g),
          |st AS (
          |  SELECT *, row_number() OVER
          |           (PARTITION BY user_id, sess ORDER BY ts, event_id) AS step
          |  FROM se),
          |p AS (
          |  SELECT user_id, sess,
          |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          |  FROM st WHERE step <= 5 GROUP BY 1, 2)
          |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
          |FROM p GROUP BY 1
          |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),

    QueryDef("q196_benford_profile", (s, d) =>
      // Benford first-digit DQ profile over order totals: digit from the
      // DECIMAL cent count's string form, frequencies as integer-div ppm,
      // expectation from fixed public constants — no libm in the hash path
      GenericTests.benfordProfile(table(s, d, "orders"), col("o_totalprice")),
      Some(
        """WITH cents AS (
          |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(20,0)) AS c
          |  FROM orders),
          |g AS (
          |  SELECT substr(CAST(c AS VARCHAR), 1, 1) AS digit, count(*) AS n
          |  FROM cents WHERE c > 0 GROUP BY 1)
          |SELECT digit, CAST(n AS BIGINT) AS n,
          |       CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS observed_ppm,
          |       CAST(CASE digit WHEN '1' THEN 301029 WHEN '2' THEN 176091
          |                       WHEN '3' THEN 124938 WHEN '4' THEN 96910
          |                       WHEN '5' THEN 79181  WHEN '6' THEN 66946
          |                       WHEN '7' THEN 57991  WHEN '8' THEN 51152
          |                       WHEN '9' THEN 45757  ELSE 0 END AS BIGINT)
          |         AS expected_ppm
          |FROM g""".stripMargin)),

    QueryDef("q197_skew_diagnose", (s, d) =>
      // join-key skew report for lineitem.l_orderkey: the pre-flight check
      // for saltedJoin/AQE decisions — one row of exact integers from the
      // count HISTOGRAM (single-partition window over distinct count
      // values only, raise-guarded)
      graft.engine.Skew.diagnose(table(s, d, "lineitem"), Seq("l_orderkey")),
      Some(
        """WITH c AS (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1),
          |h AS (SELECT cnt, count(*) AS k FROM c GROUP BY 1),
          |w AS (
          |  SELECT cnt, k,
          |         COALESCE(sum(k) OVER (ORDER BY cnt DESC
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS kb,
          |         sum(k) OVER () AS nk, sum(cnt * k) OVER () AS nr,
          |         max(cnt) OVER () AS mx
          |  FROM h)
          |SELECT CAST(max(nr) AS BIGINT) AS n_rows, CAST(max(nk) AS BIGINT) AS n_keys,
          |       CAST(max(mx) AS BIGINT) AS max_key_rows,
          |       CAST(sum(GREATEST(0, LEAST(k, (nk + 99) // 100 - kb)) * cnt) AS BIGINT)
          |         AS top1pct_rows,
          |       CAST((max(mx) * max(nk) + max(nr) - 1) // max(nr) AS BIGINT)
          |         AS recommended_salt
          |FROM w""".stripMargin)),

    QueryDef("q198_negative_pairs", (s, d) => {
      // contrastive negative mining: 2 deterministic hash-chosen negatives
      // per document, excluding exact-duplicate positives — bucket-join
      // bounded (never N^2), rerun- and engine-identical
      val docs = table(s, d, "documents")
      val fp = docs.select(col("doc_id").cast("long").as("id"),
        graft.pipeline.TextAnalysis.fingerprint(col("text")).as("f"))
      val pos = fp.as("a").join(fp.as("b"),
        col("a.f") === col("b.f") && col("a.id") < col("b.id"))
        .select(col("a.id").as("pa"), col("b.id").as("pb"))
      graft.pipeline.Sampling.negativePairs(docs, "doc_id", pos, "pa", "pb",
        kNeg = 2, nBuckets = 8, salt = "n9")
        .withColumnRenamed("rank", "neg_rank")
    }, Some(
      """WITH fp AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id,
        |         md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS f
        |  FROM documents),
        |pos AS (
        |  SELECT a.id AS pa, b.id AS pb
        |  FROM fp a JOIN fp b ON a.f = b.f AND a.id < b.id),
        |c AS (
        |  SELECT id AS negative_id,
        |         ('0x' || substr(md5(CAST(id AS VARCHAR) || '|' || 'n9'), 1, 8))::BIGINT
        |           % 1000000 % 8 AS b
        |  FROM fp),
        |a AS (
        |  SELECT id AS anchor_id,
        |         ('0x' || substr(md5(CAST(id AS VARCHAR) || '|' || 'n9p'), 1, 8))::BIGINT
        |           % 1000000 % 8 AS b
        |  FROM fp),
        |p AS (
        |  SELECT anchor_id, negative_id,
        |         ('0x' || substr(md5(CAST(anchor_id AS VARCHAR) || '~' ||
        |            CAST(negative_id AS VARCHAR) || '|' || 'n9'), 1, 8))::BIGINT
        |           % 1000000 AS h
        |  FROM a JOIN c USING (b)
        |  WHERE anchor_id <> negative_id
        |    AND NOT EXISTS (SELECT 1 FROM pos
        |          WHERE pos.pa = LEAST(anchor_id, negative_id)
        |            AND pos.pb = GREATEST(anchor_id, negative_id))),
        |r AS (
        |  SELECT anchor_id, negative_id,
        |         row_number() OVER (PARTITION BY anchor_id ORDER BY h, negative_id) AS rk
        |  FROM p)
        |SELECT anchor_id, negative_id, CAST(rk AS BIGINT) AS neg_rank
        |FROM r WHERE rk <= 2""".stripMargin))
  )
}
