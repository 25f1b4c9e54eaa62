package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Statistics + sampling wave: exact percentiles, correlation/covariance,
  * histogram binning, deterministic train/test splitting, stratified
  * sampling, and PII redaction — the dataset-curation operations a
  * training-data pipeline layers on top of the relational core.
  *
  * Sampling is hash-deterministic (md5 prefix thresholds), NOT seeded
  * RNG: the same row always lands in the same split on any cluster size,
  * re-run, or engine — the property that makes splits reproducible and
  * joins across pipeline stages consistent, and what lets DuckDB oracle
  * every sampling query exactly. All operators are single-scan,
  * aggregation-only shapes (no extra shuffles beyond the final group-by).
  */
object StatQueries {

  // deterministic hash fraction: first 4 hex chars of md5 compare against
  // a hex threshold ('cccd' ≈ 0.80, '1999' ≈ 0.10, '8000' = 0.50)
  private def hashPrefix(c: org.apache.spark.sql.Column) =
    substring(md5(c.cast("string").cast("binary")), 1, 4)

  val queries: Map[String, Q] = Map(
    // exact percentiles with linear interpolation, per group (single
    // shuffle on the 4-value group key; percentile state is per-group
    // sorted buffer — for 100 TB use approx_percentile, kept exact here
    // for oracle parity)
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75_price"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))
        .orderBy(col("l_returnflag"))
    }),

    // correlation / covariance / dispersion (all single-pass commutative
    // aggregates with map-side partial combine)
    "q_corr_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
          round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
          round(avg(col("l_extendedprice")), 2).as("price_mean"))
        .orderBy(col("l_returnflag"))
    }),

    // fixed-width histogram: bucket arithmetic is portable (no engine
    // width_bucket dependency), one aggregation on the bucket id
    "q_histogram" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // deterministic 80/20 train/test split: md5(doc_id) prefix < 'cccd'.
    // Narrow per-row hash + one tiny aggregation; at 100 TB the split is
    // a filter pushed into every downstream stage, never a materialized
    // shuffle.
    "q_train_test_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("split",
          when(hashPrefix(col("doc_id")) < "cccd", "train").otherwise("test"))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("split"))
    }),

    // stratified sampling with per-stratum rates (en 10%, others 50%),
    // hash-deterministic — the reproducible analog of df.stat.sampleBy
    "q_stratified_sample" -> ((s, dir) => {
      val h = hashPrefix(col("doc_id"))
      t(s, dir, "documents")
        .where(
          (col("lang") === "en" && h < "1999") ||
            (col("lang") =!= "en" && h < "8000"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("lang"))
    }),

    // sequence packing (concat-and-chunk): per language, documents in a
    // canonical order are concatenated and cut into fixed-size budgets —
    // chunk id = floor(exclusive-running-size / budget), the standard
    // pretraining batch-prep shape. One sort-shuffle per stream (lang);
    // at 100 TB the per-lang streams pack independently per partition
    // range, so the window never concentrates on one executor beyond a
    // language's own volume.
    "q_pack_chunks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents")
        .withColumn("cum_excl", coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .withColumn("chunk_id", floor(col("cum_excl") / 16384).cast("long"))
        .groupBy(col("lang"), col("chunk_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chunk_chars"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("chunk_id"))
    }),

    // deterministic weighted sampling: P(keep) ∝ document length —
    // hash-threshold per row (reproducible across runs/engines, narrow,
    // pushed to the scan; the sampling analog of the md5 split)
    "q_weighted_sample" -> ((s, dir) => {
      val hashFrac = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int").cast("double") / 65536.0
      t(s, dir, "documents")
        .where(hashFrac < col("n_chars").cast("double") / 600.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // deterministic pseudo-shuffle: the training-data ordering pass —
    // global order by a hash of the key (reproducible epoch order, range
    // exchange like any global sort; seed change = different hash salt)
    "q_shuffle_order" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val shuffled = Window.orderBy(md5(concat(lit("epoch1:"), col("doc_id").cast("string"))))
      t(s, dir, "documents")
        .select(col("doc_id"), row_number().over(shuffled).cast("long").as("shuffle_pos"))
        .where(col("shuffle_pos") <= 50)
        .orderBy(col("shuffle_pos"))
    }),

    // per-domain quota (cap docs per source, hash-random survivors):
    // the domain-balancing pass of public curation pipelines — one
    // window shuffle on the domain key; WindowGroupLimit keeps only each
    // partition's first `cap` rows per key ahead of the exchange
    "q_domain_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= 30)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    }),

    // consistent (join-compatible) sampling: both tables sampled by the
    // SAME key-hash threshold, so sample(orders) ⋈ sample(lineitem) ==
    // sample(orders ⋈ lineitem) — the technique that makes dev-scale
    // pipeline replicas referentially intact (no dangling foreign keys),
    // unlike independent Bernoulli samples whose join keeps ~p² of rows
    "q_consistent_sample" -> ((s, dir) => {
      def keep(c: org.apache.spark.sql.Column) =
        substring(md5(c.cast("string")), 1, 2) < "2a" // ~16% of key space
      val o = t(s, dir, "orders").where(keep(col("o_orderkey")))
      val li = t(s, dir, "lineitem").where(keep(col("l_orderkey")))
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // PII redaction: email + dashed-phone + IPv4 shapes → placeholders
    // (synthetic contact strings built from customer columns so the input
    // provably contains every PII shape). Rides the PiiScan char-scan
    // kernels — bit-compatible with the nested regexp_replace chain the
    // oracle runs, but parallel-scalable (java.util.regex serializes
    // across threads on this VM class — SCALE.md round 10).
    "q_pii_redact" -> ((s, dir) => {
      val text = concat(
        col("c_name"), lit(" reachable at "),
        lower(regexp_replace(col("c_name"), "#", "")), lit("@corp.example.org or +1-555-"),
        lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
        lit(" via 10."), pmod(col("c_custkey"), lit(256)).cast("string"),
        lit("."), pmod(col("c_custkey"), lit(100)).cast("string"), lit(".7"))
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          graft.functions.TextFunctions.piiRedact(text).as("redacted"))
        .orderBy(col("c_custkey"))
    }),

    // PII audit stats: independent per-class match counts over synthetic
    // contact-bearing text, rolled up per source — the "how much PII is
    // in this corpus" report that precedes any redaction pass. One fused
    // scan per row (PiiCounts), one group-by shuffle.
    "q_pii_stats" -> ((s, dir) => {
      val txt = concat(
        col("text"), lit(" u"), col("doc_id").cast("string"), lit("@ex.com"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" +"), (pmod(col("doc_id"), lit(90)) + 1).cast("string"), lit("-555-1234")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit(" 192.168.0."), pmod(col("doc_id"), lit(256)).cast("string")))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .select(col("source"), graft.functions.TextFunctions.piiCounts(txt).as("pii"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("pii.n_emails")).as("n_emails"),
          sum(col("pii.n_phones")).as("n_phones"),
          sum(col("pii.n_ips")).as("n_ips"))
        .orderBy(col("source"))
    }),

    // HTML → text extraction: synthetic markup wrapped around each doc
    // (script/style/comment branches + entities + an unclosed-script
    // shape) stripped by the fused HtmlScan chain — the web-corpus
    // ingestion step before any quality/dedup/tokenize pass; n_tags is
    // the markup-density audit on the RAW markup
    "q_html_extract" -> ((s, dir) => {
      val markup = concat(
        lit("<html><head><title>t</title><style>p {color: red}</style></head><body onload=\"go()\">"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("<script type=\"text/javascript\">var x = 1 < 2; // "),
            col("doc_id").cast("string"), lit("</script>")))
          .otherwise(lit("<!-- hidden <b>comment</b> -->")),
        lit("<p>"), col("text"),
        lit("</p><div>tail &amp; &lt;raw&gt; &nbsp;&amp;lt;</div>"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("<script>unclosed"))
          .otherwise(lit("")),
        lit("</body></html>"))
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.functions.TextFunctions.htmlToText(markup).as("clean"),
          graft.functions.TextFunctions.htmlTagCount(markup).cast("long").as("n_tags"))
        .orderBy(col("doc_id"))
    }),

    // ingestion-rate anomaly detection: per-type hourly counts z-scored
    // against each type's own history — exact integer Σn/Σn² feeding a
    // fixed-order float tail (sqrt only — portable), so even the z
    // doubles hash-match the oracle
    "q_rate_anomaly" -> ((s, dir) => {
      graft.operators.Anomaly.rateZ(t(s, dir, "events"), "event_type", "ts",
          bucket = "hour", zThreshold = 2.5)
        .orderBy(col("event_type"), col("bucket"))
    }),

    // robust rate anomaly: median/MAD scoring — a spike can't mask
    // itself by inflating its own baseline (daily buckets so the two
    // anomaly lanes exercise different bucketing too)
    "q_rate_anomaly_robust" -> ((s, dir) => {
      graft.operators.Anomaly.robustRateZ(t(s, dir, "events"), "event_type", "ts",
          bucket = "day", zThreshold = 3.5)
        .orderBy(col("event_type"), col("bucket"))
    }),

    // one-row-per-type ingestion health composite: volume, worst spike,
    // anomaly count, drift slope — one shared count aggregation
    "q_ingest_health" -> ((s, dir) => {
      graft.operators.Anomaly.healthReport(t(s, dir, "events"), "event_type", "ts",
          bucket = "hour", zThreshold = 2.5)
        .orderBy(col("event_type"))
    }),

    // seasonal anomaly: hourly buckets scored against the SAME-hour-of-
    // day history per type (diurnal traffic needs a diurnal baseline)
    "q_rate_anomaly_seasonal" -> ((s, dir) => {
      graft.operators.Anomaly.rateZSeasonal(t(s, dir, "events"), "event_type", "ts",
          zThreshold = 2.5)
        .orderBy(col("event_type"), col("bucket"))
    }),

    // robust drift: Theil–Sen slope (median of pairwise slopes) —
    // tolerant of corrupted buckets that drag least squares
    "q_rate_trend_robust" -> ((s, dir) => {
      graft.operators.Anomaly.rateTrendRobust(t(s, dir, "events"), "event_type", "ts",
          bucket = "hour")
        .orderBy(col("event_type"))
    }),

    // rate drift: least-squares slope of hourly counts per type — the
    // trend companion to the spike lanes (exact integer Σx/Σy/Σxy/Σx²,
    // one fixed-order closed-form division)
    "q_rate_trend" -> ((s, dir) => {
      graft.operators.Anomaly.rateTrend(t(s, dir, "events"), "event_type", "ts",
          bucket = "hour")
        .orderBy(col("event_type"))
    }),

    // URL canonicalization: the crawl-dedup key normalization (case,
    // fragments, tracking params, default ports — Urls.canonicalize's
    // pinned 6-step chain) + host extraction, over synthetic URLs
    // exercising every step
    "q_url_canonicalize" -> ((s, dir) => {
      val raw = concat(
        when(pmod(col("doc_id"), lit(4)) === 0, lit("HTTP://Example.COM:80"))
          .when(pmod(col("doc_id"), lit(4)) === 1, lit("https://CDN.Example.org:443"))
          .when(pmod(col("doc_id"), lit(4)) === 2, lit("http://mirror.example.net:8080"))
          .otherwise(lit("https://Example.com")),
        lit("/Path/"), col("doc_id").cast("string"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("?utm_source=feed&id=7&utm_campaign=x"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("?id=9&fbclid=abc"))
          .otherwise(lit("")),
        lit("#Section-"), col("doc_id").cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"), graft.text.Urls.canonicalize(raw).as("canonical"))
        .select(col("doc_id"), col("canonical"),
          graft.text.Urls.host(col("canonical")).as("host"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_weighted_sample" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) / 65536.0
        |      < n_chars / 600.0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_shuffle_order" ->
      """SELECT doc_id, shuffle_pos FROM (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY md5('epoch1:' || CAST(doc_id AS VARCHAR))) AS BIGINT) AS shuffle_pos
        |  FROM documents)
        |WHERE shuffle_pos <= 50 ORDER BY shuffle_pos""".stripMargin,
    "q_consistent_sample" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  round(sum(l_quantity), 2) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '2a'
        |  AND substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '2a'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_domain_cap" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 30
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_corr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |  round(avg(l_extendedprice), 2) AS price_mean
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_train_test_split" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |  THEN 'train' ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled FROM documents
        |WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999')
        |   OR (lang <> 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_pack_chunks" ->
      """WITH c AS (
        |  SELECT lang, doc_id, n_chars,
        |    coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
        |  FROM documents
        |)
        |SELECT lang, CAST(floor(cum_excl / 16384) AS BIGINT) AS chunk_id,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chunk_chars,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY lang, chunk_id""".stripMargin,
    "q_pii_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    c_name || ' reachable at ' || lower(replace(c_name, '#', '')) ||
        |      '@corp.example.org or +1-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        |      ' via 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
        |      CAST(c_custkey % 100 AS VARCHAR) || '.7',
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g') AS redacted
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_pii_stats" ->
      """WITH p AS (
        |  SELECT source,
        |    text || ' u' || CAST(doc_id AS VARCHAR) || '@ex.com' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' +' || CAST(doc_id % 90 + 1 AS VARCHAR) || '-555-1234' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0
        |      THEN ' 192.168.0.' || CAST(doc_id % 256 AS VARCHAR) ELSE '' END AS t
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT) AS n_emails,
        |  CAST(sum(len(regexp_extract_all(t, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}'))) AS BIGINT) AS n_phones,
        |  CAST(sum(len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))) AS BIGINT) AS n_ips
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    // the exact 5-step chain HtmlScan pins (RE2 replays the same
    // patterns; entity decodes are literal replace()s, amp last)
    "q_html_extract" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    '<html><head><title>t</title><style>p {color: red}</style></head><body onload="go()">' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN '<script type="text/javascript">var x = 1 < 2; // ' || CAST(doc_id AS VARCHAR) || '</script>'
        |      ELSE '<!-- hidden <b>comment</b> -->' END ||
        |    '<p>' || text || '</p><div>tail &amp; &lt;raw&gt; &nbsp;&amp;lt;</div>' ||
        |    CASE WHEN doc_id % 5 = 0 THEN '<script>unclosed' ELSE '' END ||
        |    '</body></html>' AS h
        |  FROM documents)
        |SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(h,
        |      '(?is)<script\b[^>]*>.*?</script>', '', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style>', '', 'g'),
        |      '(?s)<!--.*?-->', '', 'g'),
        |      '<[^>]*>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
        |    '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS clean,
        |  CAST(len(regexp_extract_all(h, '<[^>]*>')) AS BIGINT) AS n_tags
        |FROM m ORDER BY doc_id""".stripMargin,
    // the exact-integer rate-z replay: identical expression tree (casts,
    // op order, degenerate-lane pins) over Σn / Σn²
    "q_rate_anomaly" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(n) AS BIGINT) AS s1,
        |    CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM c GROUP BY event_type),
        |j AS (
        |  SELECT c.event_type, c.bucket, c.n, st.m,
        |    CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE) AS mu,
        |    CASE WHEN m < 2 THEN 0.0 ELSE
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |        / CAST(m - 1 AS DOUBLE) END AS v
        |  FROM c JOIN st USING (event_type)),
        |z AS (
        |  SELECT event_type, bucket, n,
        |    CASE WHEN (CASE WHEN m < 2 OR v <= 0.0 THEN 0.0 ELSE sqrt(v) END) = 0.0
        |      THEN 0.0
        |      ELSE (CAST(n AS DOUBLE) - mu)
        |        / (CASE WHEN m < 2 OR v <= 0.0 THEN 0.0 ELSE sqrt(v) END) END AS z
        |  FROM j)
        |SELECT event_type, bucket, n, z, abs(z) > 2.5 AS is_anomaly
        |FROM z ORDER BY event_type, bucket""".stripMargin,
    // robust lane: exact interpolated medians (quantile_cont = R-7, the
    // same rule Spark's percentile applies; integer inputs make every
    // interpolation a representable half) + the pinned 1.4826·MAD tail
    "q_rate_anomaly_robust" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('day', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |md AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM c GROUP BY event_type),
        |dv AS (
        |  SELECT c.event_type, c.bucket, c.n, md.med,
        |    abs(CAST(c.n AS DOUBLE) - md.med) AS dev
        |  FROM c JOIN md USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dv GROUP BY event_type)
        |SELECT dv.event_type, dv.bucket, dv.n, dv.med,
        |  CASE WHEN mad.mad = 0.0 THEN 0.0
        |    ELSE (CAST(dv.n AS DOUBLE) - dv.med) / (1.4826 * mad.mad) END AS z_robust,
        |  abs(CASE WHEN mad.mad = 0.0 THEN 0.0
        |    ELSE (CAST(dv.n AS DOUBLE) - dv.med) / (1.4826 * mad.mad) END) > 3.5 AS is_anomaly
        |FROM dv JOIN mad USING (event_type)
        |ORDER BY dv.event_type, dv.bucket""".stripMargin,
    // health composite: the z tree rolled up per key + the regression tree
    "q_ingest_health" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(n) AS BIGINT) AS s1,
        |    CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM c GROUP BY event_type),
        |j AS (
        |  SELECT c.event_type, c.n, st.m,
        |    CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE) AS mu,
        |    CASE WHEN m < 2 THEN 0.0 ELSE
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |        / CAST(m - 1 AS DOUBLE) END AS v
        |  FROM c JOIN st USING (event_type)),
        |z AS (
        |  SELECT event_type,
        |    CASE WHEN (CASE WHEN m < 2 OR v <= 0.0 THEN 0.0 ELSE sqrt(v) END) = 0.0
        |      THEN 0.0
        |      ELSE (CAST(n AS DOUBLE) - mu)
        |        / (CASE WHEN m < 2 OR v <= 0.0 THEN 0.0 ELSE sqrt(v) END) END AS z
        |  FROM j),
        |sp AS (
        |  SELECT event_type, max(abs(z)) AS max_abs_z,
        |    CAST(sum(CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |  FROM z GROUP BY event_type),
        |ix AS (
        |  SELECT event_type, n,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) - 1 AS x
        |  FROM c),
        |ag AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sy,
        |    CAST(sum(x * n) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM ix GROUP BY event_type)
        |SELECT ag.event_type, ag.m AS n_buckets, ag.sy AS total,
        |  sp.max_abs_z, sp.n_anomalies,
        |  CASE WHEN ag.m < 2 THEN 0.0 ELSE
        |    (CAST(ag.m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(ag.m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    END AS slope
        |FROM ag JOIN sp USING (event_type)
        |ORDER BY ag.event_type""".stripMargin,
    // seasonal lane: same exact-stats tree grouped by (type, hour-of-day)
    "q_rate_anomaly_seasonal" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |cs AS (SELECT event_type, bucket, CAST(hour(bucket) AS BIGINT) AS season, n FROM c),
        |st AS (
        |  SELECT event_type, season,
        |    CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(n) AS BIGINT) AS s1,
        |    CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM cs GROUP BY event_type, season),
        |j AS (
        |  SELECT cs.event_type, cs.bucket, cs.season, cs.n, st.m,
        |    CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE) AS mu,
        |    CASE WHEN m < 2 THEN 0.0 ELSE
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |        / CAST(m - 1 AS DOUBLE) END AS v
        |  FROM cs JOIN st USING (event_type, season)),
        |z AS (
        |  SELECT event_type, bucket, season, n,
        |    CASE WHEN (CASE WHEN m < 2 OR v <= 0.0 THEN 0.0 ELSE sqrt(v) END) = 0.0
        |      THEN 0.0
        |      ELSE (CAST(n AS DOUBLE) - mu)
        |        / (CASE WHEN m < 2 OR v <= 0.0 THEN 0.0 ELSE sqrt(v) END) END AS z
        |  FROM j)
        |SELECT event_type, bucket, season, n, z, abs(z) > 2.5 AS is_anomaly
        |FROM z ORDER BY event_type, bucket""".stripMargin,
    // Theil–Sen replay: pairwise-slope self-join + quantile_cont median
    // (interpolation of bit-identical slope doubles is one add + halve)
    "q_rate_trend_robust" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |ix AS (
        |  SELECT event_type, n,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) - 1 AS x
        |  FROM c),
        |sl AS (
        |  SELECT a.event_type,
        |    CAST(b.n - a.n AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
        |  FROM ix a JOIN ix b ON a.event_type = b.event_type AND a.x < b.x),
        |md AS (SELECT event_type, quantile_cont(s, 0.5) AS slope_ts FROM sl GROUP BY event_type)
        |SELECT ix2.event_type, ix2.m, ix2.total, coalesce(md.slope_ts, 0.0) AS slope_ts
        |FROM (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS m, CAST(sum(n) AS BIGINT) AS total
        |  FROM ix GROUP BY event_type) ix2
        |LEFT JOIN md USING (event_type)
        |ORDER BY ix2.event_type""".stripMargin,
    // exact-integer regression replay: same sums, same cast/op order
    "q_rate_trend" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |ix AS (
        |  SELECT event_type, bucket, n,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) - 1 AS x
        |  FROM c),
        |ag AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS m,
        |    min(bucket) AS first_bucket, max(bucket) AS last_bucket,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sy,
        |    CAST(sum(x * n) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM ix GROUP BY event_type)
        |SELECT event_type, m, first_bucket, last_bucket, sy AS total,
        |  CASE WHEN m < 2 THEN 0.0 ELSE
        |    (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    END AS slope
        |FROM ag ORDER BY event_type""".stripMargin,
    // the Urls.canonicalize 6-step chain replayed step for step (DuckDB
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // always-global replaceAll; capture refs are \1 here vs $1 there)
    "q_url_canonicalize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 'HTTP://Example.COM:80'
        |      WHEN 1 THEN 'https://CDN.Example.org:443'
        |      WHEN 2 THEN 'http://mirror.example.net:8080'
        |      ELSE 'https://Example.com' END ||
        |    '/Path/' || CAST(doc_id AS VARCHAR) ||
        |    CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&id=7&utm_campaign=x'
        |      WHEN 1 THEN '?id=9&fbclid=abc' ELSE '' END ||
        |    '#Section-' || CAST(doc_id AS VARCHAR) AS u
        |  FROM documents),
        |s2 AS (
        |  SELECT doc_id, trim(u) AS t,
        |    regexp_extract(trim(u), '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) AS p
        |  FROM r),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(
        |                regexp_replace(
        |                  lower(p) || substr(t, length(p) + 1),
        |                  '(?s)#.*', '', 'g'),
        |                '(?i)&(utm_[a-z0-9_]+|fbclid|gclid)=[^&#]*', '', 'g'),
        |              '(?i)\?(utm_[a-z0-9_]+|fbclid|gclid)=[^&#]*&', '?', 'g'),
        |            '(?i)\?(utm_[a-z0-9_]+|fbclid|gclid)=[^&#]*$', '', 'g'),
        |          '^(http://[^/:?#]+):80(/|\?|$)', '\1\2', 'g'),
        |        '^(https://[^/:?#]+):443(/|\?|$)', '\1\2', 'g'),
        |      '[?&]+$', '', 'g') AS canonical
        |  FROM s2)
        |SELECT doc_id, canonical,
        |  regexp_extract(canonical, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host
        |FROM c ORDER BY doc_id""".stripMargin
  )
}
