package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SttmOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator of SURVEY.md §2 exercised on the
  * driver-generated testdata; [[oracleSql]] holds the DuckDB-equivalent SQL.
  * Column names and types are aligned between both sides (the driver sorts
  * columns by name and hash-compares values). Timestamps are exported as
  * `unix_micros` BIGINT / DATE to sidestep tz-naive-vs-instant mismatches.
  */
object SparkEntry {

  /** Flagship: the 3-stage reference pipeline (view parse -> XREF latest-by-key
    * -> FGAC masked enrichment join) on sf0.001. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_fgac_enrich")(spark, "/root/testdata/sf0.001")

  // ---- shared fragments -------------------------------------------------

  /** A1 ranking order used by every XREF query: event time desc, seq desc
    * (sttm-requirements.md:115-134). */
  private def xrefLatest(ev: DataFrame): DataFrame =
    SttmOps.latestByKey(ev, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P1+P3+F1+P10 — typed JSON view: demux filter on the discriminator column,
    // JSON_VALUE-equivalent extraction, trim/cast normalization.
    // (final-output.sql:3-11; sttm_to_flink_v22.py:121-147)
    "q_view_parse_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"),
          col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          trim(col("event_type")).cast("string").as("event_type"),
          col("value"))
        .orderBy("event_id")
    }),

    // P2 — CSV positional extraction (SPLIT_INDEX): payload synthesized from
    // typed cols so the oracle sees identical strings (decimal(10,2) to pin
    // double formatting). (history-queries.sql:4-44; v22:137-142)
    "q_view_parse_csv" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("payload",
          concat_ws("|",
            col("event_id").cast("string"),
            col("event_type"),
            col("value").cast("decimal(10,2)").cast("string")))
        .select(
          col("event_id"),
          split(col("payload"), "\\|").getItem(0).as("f0"),
          split(col("payload"), "\\|").getItem(1).as("f1"),
          split(col("payload"), "\\|").getItem(2).as("f2"),
          split(col("payload"), "\\|").getItem(0).cast("bigint").as("f0_id"))
        .orderBy("event_id")
    }),

    // A1+A2 — XREF latest-by-key snapshot (row_number over pk, rn=1).
    "q_xref_latest" -> ((s, dir) => {
      xrefLatest(Tables.events(s, dir))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("ts_us"))
        .orderBy("user_id")
    }),

    // F6+A1 — delete-flag exclusion before ranking ('error' plays the
    // delete_flag role; sttm-requirements.md:77-84).
    "q_xref_delete_flag" -> ((s, dir) => {
      xrefLatest(SttmOps.excludeDeleted(Tables.events(s, dir), "event_type", Seq("error")))
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy("user_id")
    }),

    // J5+P8 — FGAC enrichment: XREF LEFT JOIN dimension + PII masking CASE.
    // Customer side is dimension-sized -> broadcast-able at any scale.
    "q_fgac_enrich" -> ((s, dir) => {
      val x = xrefLatest(Tables.events(s, dir))
      val c = broadcast(Tables.customer(s, dir))
      x.join(c, x("user_id") === c("c_custkey"), "left")
        .select(
          col("user_id"), col("event_id"),
          SttmOps.maskUnless(col("c_acctbal") >= 0, col("c_name")).as("c_name_masked"),
          col("c_mktsegment"), col("value"))
        .orderBy("user_id")
    }),

    // J4+F5 — bidirectional quarantine: keys on one side only, tagged with a
    // reason literal, UNION ALL (final-output.sql:131-144).
    "q_quarantine_bidir" -> ((s, dir) => {
      val evKeys = Tables.events(s, dir).select(col("user_id")).distinct()
      SttmOps.quarantineBidirectional(
        evKeys, "user_id", "customer: none",
        Tables.customer(s, dir), "c_custkey", "events: none")
        .orderBy("reason", "key")
    }),

    // O1+F4 — UNION ALL arms of one target, each arm = (filter, projection).
    "q_union_arms" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val arm1 = ev.filter(col("event_type") === "purchase" && col("value") > 100)
        .select(col("event_id"), col("user_id"), lit("purchase_big").as("arm"), col("value"))
      val arm2 = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), lit("signup").as("arm"), col("value"))
      arm1.unionByName(arm2).orderBy("event_id")
    }),

    // J2 — ordered multi-join chain (driving table -> fact -> detail).
    "q_multi_join_chain" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      val l = Tables.lineitem(s, dir)
      broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("c_custkey"),
          col("c_mktsegment"), col("o_orderstatus"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        // (l_orderkey, l_linenumber) is NOT unique in the generated lineitem;
        // revenue disambiguates (remaining cols are functions of o_orderkey).
        .orderBy("o_orderkey", "l_linenumber", "revenue")
    }),

    // P5+P6 — multi-format date/timestamp parsing CASE (final-output.sql:87-102):
    // mixed yyyyMMdd / yyyy-MM-dd strings, plus 10-digit epoch seconds.
    "q_date_multiformat" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("raw",
          when(col("o_orderkey") % 2 === 0, date_format(col("o_orderdate"), "yyyyMMdd"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
        // o_orderdate is parquet TIMESTAMP(MILLIS, ntz) -> TIMESTAMP_NTZ;
        // unix_seconds wants LTZ, so cast (session tz pinned UTC).
        .withColumn("es", unix_seconds(col("o_orderdate").cast("timestamp")).cast("string"))
      o.select(
          col("o_orderkey"),
          when(length(col("raw")) === 8 && col("raw").rlike("^\\d{8}$"),
            to_date(col("raw"), "yyyyMMdd"))
            .when(col("raw").rlike("^\\d{4}-\\d{2}-\\d{2}$"),
              to_date(col("raw"), "yyyy-MM-dd"))
            .otherwise(lit(null).cast("date")).cast("string").as("d_parsed"),
          unix_micros(
            when(col("es").rlike("^\\d{10}$"),
              timestamp_seconds(col("es").cast("bigint")))).as("ts_us"))
        .orderBy("o_orderkey")
    }),

    // Training-data ops ---------------------------------------------------

    // Exact dedup: hash group-by on full text, keep lowest doc_id.
    "q_dedup_exact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .select(col("keeper_id"), col("n_copies"))
        .orderBy("keeper_id")
    }),

    // Token counting (whitespace tokenizer).
    "q_token_count" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"),
          length(col("text")).as("n_chars_m"))
        .orderBy("doc_id")
    }),

    // Quality scoring: stopword ratio + avg word length (pure arithmetic so
    // the oracle matches bit-for-bit).
    "q_quality_score" -> ((s, dir) => {
      val stop = Seq("the", "a", "and", "of", "to", "in")
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .withColumn("n_tok", size(toks))
        .withColumn("n_stop", size(filter(toks, t => t.isin(stop.map(lit): _*))))
        .select(col("doc_id"), col("n_tok"), col("n_stop"),
          (floor(col("n_stop").cast("double") / col("n_tok") * 10000) / 10000.0)
            .as("stop_ratio"),
          (floor((length(col("text")) - (col("n_tok") - 1)).cast("double")
            / col("n_tok") * 10000) / 10000.0).as("avg_wlen"))
        .orderBy("doc_id")
    }),

    // Document fingerprinting (content hash; md5 matches DuckDB exactly).
    "q_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_view_parse_json" ->
      """SELECT event_id, user_id,
         CAST(json_extract_string(props, '$.k') AS INT) AS k,
         trim(event_type) AS event_type, value
         FROM events WHERE event_type = 'purchase' ORDER BY event_id""",
    "q_view_parse_csv" ->
      """WITH p AS (SELECT event_id,
           concat_ws('|', CAST(event_id AS VARCHAR), event_type,
                     CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)) AS payload
         FROM events)
         SELECT event_id,
           split_part(payload, '|', 1) AS f0,
           split_part(payload, '|', 2) AS f1,
           split_part(payload, '|', 3) AS f2,
           CAST(split_part(payload, '|', 1) AS BIGINT) AS f0_id
         FROM p ORDER BY event_id""",
    "q_xref_latest" ->
      """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q_xref_delete_flag" ->
      """SELECT user_id, event_id, event_type
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events WHERE event_type IS NULL OR event_type <> 'error')
         WHERE rn = 1 ORDER BY user_id""",
    "q_fgac_enrich" ->
      """WITH x AS (SELECT * FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1)
         SELECT x.user_id, x.event_id,
           CASE WHEN c.c_acctbal >= 0 THEN c.c_name ELSE '***' END AS c_name_masked,
           c.c_mktsegment, x.value
         FROM x LEFT JOIN customer c ON x.user_id = c.c_custkey
         ORDER BY x.user_id""",
    "q_quarantine_bidir" ->
      """SELECT * FROM (
           SELECT CAST(e.user_id AS BIGINT) AS key, 'customer: none' AS reason
           FROM (SELECT DISTINCT user_id FROM events) e
           WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
           UNION ALL
           SELECT CAST(c.c_custkey AS BIGINT) AS key, 'events: none' AS reason
           FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey))
         ORDER BY reason, key""",
    "q_union_arms" ->
      """SELECT * FROM (
           SELECT event_id, user_id, 'purchase_big' AS arm, value
           FROM events WHERE event_type = 'purchase' AND value > 100
           UNION ALL
           SELECT event_id, user_id, 'signup' AS arm, value
           FROM events WHERE event_type = 'signup')
         ORDER BY event_id""",
    "q_multi_join_chain" ->
      """SELECT o_orderkey, l_linenumber, c_custkey, c_mktsegment, o_orderstatus,
           l_extendedprice * (1.0 - l_discount) AS revenue
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'F'
         ORDER BY o_orderkey, l_linenumber, revenue""",
    "q_date_multiformat" ->
      """WITH r AS (SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y%m%d')
                ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw,
           CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR) AS es
         FROM orders)
         SELECT o_orderkey,
           CASE WHEN length(raw) = 8 AND regexp_matches(raw, '^\d{8}$')
                  THEN CAST(CAST(strptime(raw, '%Y%m%d') AS DATE) AS VARCHAR)
                WHEN regexp_matches(raw, '^\d{4}-\d{2}-\d{2}$')
                  THEN CAST(CAST(strptime(raw, '%Y-%m-%d') AS DATE) AS VARCHAR)
                ELSE NULL END AS d_parsed,
           CASE WHEN regexp_matches(es, '^\d{10}$')
                  THEN CAST(es AS BIGINT) * 1000000
                ELSE NULL END AS ts_us
         FROM r ORDER BY o_orderkey""",
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY text ORDER BY keeper_id""",
    "q_token_count" ->
      """SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_m
         FROM documents ORDER BY doc_id""",
    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, text,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
           CAST(len(list_filter(string_split(text, ' '),
                t -> t IN ('the','a','and','of','to','in'))) AS INT) AS n_stop
         FROM documents)
         SELECT doc_id, n_tok, n_stop,
           floor(CAST(n_stop AS DOUBLE) / n_tok * 10000) / 10000 AS stop_ratio,
           floor(CAST(length(text) - (n_tok - 1) AS DOUBLE) / n_tok * 10000) / 10000 AS avg_wlen
         FROM t ORDER BY doc_id""",
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"""
  )
}
