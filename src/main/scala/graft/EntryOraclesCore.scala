package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Ops, Sinks}
import graft.sources.{Sources, Tables}
import graft.functions.Text
import graft.dedup.Dedup
import graft.similarity.{Ann, Search}
import graft.json.{MtlParser, TreeWalk}
import graft.multimodal.Multimodal
import graft.Caching.TrackedSyntax

/** DuckDB oracles: sources through config families (SparkEntry registry — see [[EntryFixtures]]). */
object EntryOraclesCore {
  import EntryFixtures._
  import OracleFixtures._
  private[graft] val m: Map[String, String] = Map(
    "q_counter" -> "SELECT r.range AS n FROM range(0, 1000) r",
    "q_sequence" -> "SELECT r.range AS seq_no, unnest(['a', 'b', 'c']) AS value FROM range(0, 2) r",
    "q_constant" -> "SELECT r.range AS _emit_id, 'v' AS k FROM range(0, 3) r",

    "q_insert_data" ->
      "SELECT n_nationkey, n_name, n_regionkey, 'graft' AS source, CAST(1 AS BIGINT) AS version FROM nation",
    "q_regex" ->
      "SELECT p_partkey, p_name, regexp_replace(p_name, ' ', '_', 'g') AS p_name_u FROM part",
    "q_remap" ->
      "SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment FROM customer",
    "q_explode" ->
      "SELECT doc_id, token FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) WHERE token <> ''",
    "q_json" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events",
    "q_json_schema" -> {
      val (viol, valid) =
        graft.schema.JsonSchemaGate.oracleChecksSql(jsonSchemaDemo, "raw")
      s"""WITH j AS (SELECT event_id, $jsonSynthSql AS raw FROM events)
         |SELECT event_id, $valid AS is_valid, $viol AS violations FROM j""".stripMargin
    },
    // stateless projection: any batch split appends the same rows
    "q_stream_jsonschema" -> {
      val (viol, valid) =
        graft.schema.JsonSchemaGate.oracleChecksSql(jsonSchemaDemo, "raw")
      s"""WITH j AS (SELECT event_id, $jsonSynthSql AS raw FROM events)
         |SELECT event_id, $valid AS is_valid, $viol AS violations FROM j""".stripMargin
    },
    "q_filter" ->
      "SELECT event_id, user_id, value FROM events WHERE value IS NOT NULL AND event_type = 'purchase'",
    "q_sample" -> "SELECT * FROM documents WHERE doc_id % 10 = 0",
    "q_apply" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS margin
        |FROM lineitem""".stripMargin,

    "q_collect" ->
      "SELECT lang, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids FROM documents GROUP BY lang",
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS n_rows,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_batch" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CEIL(CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS DOUBLE) / 100) AS BIGINT) AS batch_id
        |FROM lineitem""".stripMargin,
    "q_window" ->
      """SELECT epoch_us(ts) // 60000000 AS minute_bucket, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_window_sliding" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events),
        |w AS (SELECT event_type, value,
        |      ((ts_us // 300000000) - k) * 300000000 AS win_us
        |      FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k))
        |SELECT win_us, event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q_join_window" ->
      """SELECT p.event_id AS p_id, e.event_id AS e_id, p.user_id AS user_id,
        | epoch_us(e.ts) - epoch_us(p.ts) AS dt_us
        |FROM events p JOIN events e ON p.user_id = e.user_id
        | AND p.event_type = 'purchase' AND e.event_type = 'error'
        | AND epoch_us(e.ts) >= epoch_us(p.ts) - 300000000
        | AND epoch_us(e.ts) <= epoch_us(p.ts) + 300000000""".stripMargin,
    "q_asof" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS r_us, MAX(value) AS r_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS l_us
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT l.event_id, l.user_id, l.l_us, r.r_us, r.r_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.l_us >= r.r_us""".stripMargin,
    "q_asof_bucketed" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS r_us, MAX(value) AS r_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS l_us
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT l.event_id, l.user_id, l.l_us, r.r_us, r.r_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.l_us >= r.r_us""".stripMargin,
    "q_asof_nulls" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS r_us,
        |    CASE WHEN MAX(value) >= 10.0 THEN MAX(value) END AS r_value,
        |    COUNT(*) AS r_n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS l_us
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT l.event_id, l.user_id, l.l_us, r.r_us, r.r_value, r.r_n
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.l_us >= r.r_us""".stripMargin,
    "q_schema_infer" ->
      """SELECT c_custkey AS custkey, c_name AS name, c_nationkey AS nationkey,
        | c_acctbal AS acctbal, (c_custkey % 2 = 0) AS vip,
        | CAST(DATE '2020-01-01' + CAST(c_custkey % 365 AS INTEGER) - DATE '1970-01-01' AS BIGINT) AS signup_days,
        | epoch_us(TIMESTAMP '2020-01-01 00:00:00' + c_custkey * INTERVAL 1 MINUTE) AS seen_us
        |FROM customer""".stripMargin,
    "q_rowstats" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .map(c => s"""SELECT '$c' AS "column", COUNT(*) AS n_rows, COUNT(*) - COUNT($c) AS n_nulls, COUNT(DISTINCT $c) AS n_distinct FROM customer""")
      .mkString(" UNION ALL "),
    // the layout is transparent to results: plain join replay
    "q_bucketed_join" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,
    "q_join" ->
      """SELECT n_name, r_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name""".stripMargin,
    "q_topk" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_window_rank" ->
      """SELECT * FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        | RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |FROM customer) WHERE rnk <= 3""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_quality_checks" ->
      """WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) FILTER (WHERE NOT COALESCE(value >= 0, FALSE)) AS BIGINT) AS v1,
        |  CAST(COUNT(*) FILTER (WHERE NOT COALESCE(event_type IN
        |    ('click','view','purchase','error','signup'), FALSE)) AS BIGINT) AS v2,
        |  CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT) AS v3,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS d FROM events)
        |SELECT 'value_nonneg' AS "check", n AS n_rows, v1 AS n_violations FROM s
        |UNION ALL SELECT 'etype_known', n, v2 FROM s
        |UNION ALL SELECT 'user_present', n, v3 FROM s
        |UNION ALL SELECT 'unique:event_id', n, n - d FROM s""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup
        |FROM events GROUP BY user_id""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (SELECT user_id,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        | FROM events GROUP BY user_id)
        |SELECT user_id, 'click' AS event_type, click AS n FROM wide
        |UNION ALL
        |SELECT user_id, 'view' AS event_type, view AS n FROM wide""".stripMargin,
    "q_rolling" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
        | CAST(COUNT(*) OVER w AS BIGINT) AS roll_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        | ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_union_evolved" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal FROM customer
        |UNION ALL
        |SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_acctbal FROM customer""".stripMargin,
    "q_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)",
    "q_semi_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')",

    "q_treewalk" ->
      """SELECT o_orderkey, l_linenumber AS item_l_linenumber, l_quantity AS item_l_quantity
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,

    "q_treewalk_up" ->
      """SELECT o_orderkey, l_quantity AS qty, l_partkey AS part_key, c_name AS cust_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "q_treewalk_cond" ->
      """SELECT o_orderkey, l_quantity AS qty, l_linenumber AS line_no
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_quantity >= 25""".stripMargin,
    "q_dedup_exact" ->
      "SELECT md5(text) AS hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM documents GROUP BY md5(text)",
    "q_dedup_best" ->
      """WITH n AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS key
        |  FROM documents),
        |r AS (SELECT key, doc_id, len,
        |  ROW_NUMBER() OVER (PARTITION BY key ORDER BY len DESC, doc_id DESC) AS rn,
        |  COUNT(*) OVER (PARTITION BY key) AS n_copies FROM n)
        |SELECT key, doc_id AS keep_id, len AS keep_score, n_copies
        |FROM r WHERE rn = 1""".stripMargin,
    "q_dedup_norm" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT md5(norm) AS hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM n GROUP BY md5(norm)""".stripMargin,
    "q_jaccard" -> jaccardOracle("0.5"),
    "q_jaccard_prefix" -> jaccardOracle("0.8"), // prefix filter is lossless
    "q_kb_infer" ->
      """WITH RECURSIVE nxt AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS src_id,
        |    CAST(lead(o_orderkey) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS dst_id
        |  FROM orders),
        |edges AS (SELECT src_id, dst_id FROM nxt WHERE dst_id IS NOT NULL),
        |reach(src_id, dst_id) AS (
        |  SELECT src_id, dst_id FROM edges
        |  UNION
        |  SELECT r.src_id, e.dst_id FROM reach r JOIN edges e ON r.dst_id = e.src_id)
        |SELECT src_id, dst_id, 'before' AS rel FROM reach""".stripMargin,
    // integer PageRank unrolled 3 iterations — `//` is DuckDB BIGINT floor
    // division ≡ Spark `div` on the all-positive ranks
    "q_pagerank" ->
      """WITH nxt AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS src,
        |    CAST(lead(o_orderkey) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS dst
        |  FROM orders),
        |e AS (SELECT src, dst FROM nxt WHERE dst IS NOT NULL),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
        |eo AS (SELECT e.src, e.dst, od.od FROM e JOIN od USING (src)),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |c1 AS (SELECT dst, SUM(rank // od) AS cs FROM eo JOIN r0 ON r0.id = eo.src GROUP BY dst),
        |r1 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(cs, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c1 ON c1.dst = n.id),
        |c2 AS (SELECT dst, SUM(rank // od) AS cs FROM eo JOIN r1 ON r1.id = eo.src GROUP BY dst),
        |r2 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(cs, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c2 ON c2.dst = n.id),
        |c3 AS (SELECT dst, SUM(rank // od) AS cs FROM eo JOIN r2 ON r2.id = eo.src GROUP BY dst),
        |r3 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(cs, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c3 ON c3.dst = n.id)
        |SELECT id, rank FROM r3""".stripMargin,
    // dangling redistribution unrolled the same way: dm_i = the dangling
    // nodes' summed rank, share = dm // n, added to every contribution
    // BEFORE damping — same floor divisions, exact BIGINT on both engines
    "q_pagerank_dangling" ->
      """WITH nxt AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS src,
        |    CAST(lead(o_orderkey) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS dst
        |  FROM orders),
        |e AS (SELECT src, dst FROM nxt WHERE dst IS NOT NULL),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |dang AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),
        |od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
        |eo AS (SELECT e.src, e.dst, od.od FROM e JOIN od USING (src)),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |d1 AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM r0 JOIN dang USING (id)),
        |c1 AS (SELECT dst, SUM(rank // od) AS cs FROM eo JOIN r0 ON r0.id = eo.src GROUP BY dst),
        |r1 AS (SELECT n.id, CAST(150000 + (85 * (COALESCE(cs, 0) + dm // nn.n)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c1 ON c1.dst = n.id CROSS JOIN d1 CROSS JOIN nn),
        |d2 AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM r1 JOIN dang USING (id)),
        |c2 AS (SELECT dst, SUM(rank // od) AS cs FROM eo JOIN r1 ON r1.id = eo.src GROUP BY dst),
        |r2 AS (SELECT n.id, CAST(150000 + (85 * (COALESCE(cs, 0) + dm // nn.n)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c2 ON c2.dst = n.id CROSS JOIN d2 CROSS JOIN nn),
        |d3 AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM r2 JOIN dang USING (id)),
        |c3 AS (SELECT dst, SUM(rank // od) AS cs FROM eo JOIN r2 ON r2.id = eo.src GROUP BY dst),
        |r3 AS (SELECT n.id, CAST(150000 + (85 * (COALESCE(cs, 0) + dm // nn.n)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c3 ON c3.dst = n.id CROSS JOIN d3 CROSS JOIN nn)
        |SELECT id, rank FROM r3""".stripMargin,
    "q_degrees" ->
      """WITH e AS (SELECT CAST(o_custkey AS VARCHAR) AS src_id,
        |  CAST(l_partkey AS VARCHAR) AS dst_id
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |o AS (SELECT src_id AS id, COUNT(*) AS out_deg FROM e GROUP BY src_id),
        |i AS (SELECT dst_id AS id, COUNT(*) AS in_deg FROM e GROUP BY dst_id)
        |SELECT COALESCE(o.id, i.id) AS id,
        | CAST(COALESCE(out_deg, 0) AS BIGINT) AS out_deg,
        | CAST(COALESCE(in_deg, 0) AS BIGINT) AS in_deg,
        | CAST(COALESCE(out_deg, 0) + COALESCE(in_deg, 0) AS BIGINT) AS deg
        |FROM o FULL OUTER JOIN i ON o.id = i.id""".stripMargin,
    "q_inverted_index" ->
      """WITH tok AS (SELECT DISTINCT doc_id, token FROM (
        |    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |      unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token <> '')
        |SELECT token, array_to_string(list_sort(list(doc_id)), ' ') AS postings,
        | CAST(COUNT(*) AS BIGINT) AS df
        |FROM tok GROUP BY token HAVING COUNT(*) <= 1000""".stripMargin,
    "q_kb_rule" ->
      """WITH nxt AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS src_id,
        |    CAST(lead(o_orderkey) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS dst_id
        |  FROM orders),
        |edges AS (SELECT src_id, dst_id FROM nxt WHERE dst_id IS NOT NULL)
        |SELECT DISTINCT a.src_id, b.dst_id, 'skip2' AS rel
        |FROM edges a JOIN edges b ON a.dst_id = b.src_id""".stripMargin,
    "q_curation_pipeline" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |g AS (SELECT doc_id,
         |      unnest(list_transform(range(0, len(tk) - 1),
         |             i -> array_to_string(list_slice(tk, i + 1, i + 2), ' '))) AS gram
         |      FROM toks WHERE len(tk) >= 2),
         |c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
         |rep AS (SELECT doc_id,
         |        CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac
         |        FROM c GROUP BY doc_id),
         |clean AS (SELECT d.doc_id, d.lang, COALESCE(rep.dup_frac, 0.0) AS dup_frac
         |          FROM documents d LEFT JOIN rep USING (doc_id)
         |          WHERE COALESCE(rep.dup_frac, 0.0) <= 0.6),
         |cnt AS (SELECT lang AS gr, COUNT(*) AS c FROM clean GROUP BY 1),
         |w AS (SELECT * FROM (VALUES ('en', 50), ('zh', 30), ('es', 20)) AS t(gr, w)),
         |j AS (SELECT cnt.gr, c, w FROM cnt JOIN w USING (gr) WHERE c > 0),
         |m AS (SELECT c AS cm, w AS wm FROM j ORDER BY CAST(c AS DOUBLE) / w, gr LIMIT 1),
         |r AS (SELECT j.gr, LEAST(1000, (1000 * j.w * m.cm) // (m.wm * j.c)) AS permille
         |      FROM j CROSS JOIN m),
         |mixed AS (SELECT clean.doc_id, clean.lang, clean.dup_frac
         |          FROM clean JOIN r ON r.gr = clean.lang
         |          WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
         |                < permille)
         |SELECT doc_id, lang, dup_frac,
         | CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
         |      THEN 'train' ELSE 'val' END AS split
         |FROM mixed""".stripMargin,
    "q_mixture" ->
      """WITH cnt AS (SELECT lang AS g, COUNT(*) AS c FROM documents GROUP BY 1),
        |w AS (SELECT * FROM (VALUES ('en', 50), ('zh', 30), ('es', 20)) AS t(g, w)),
        |j AS (SELECT cnt.g, c, w FROM cnt JOIN w USING (g) WHERE c > 0),
        |m AS (SELECT c AS cm, w AS wm FROM j ORDER BY CAST(c AS DOUBLE) / w, g LIMIT 1),
        |r AS (SELECT j.g, LEAST(1000, (1000 * j.w * m.cm) // (m.wm * j.c)) AS permille
        |      FROM j CROSS JOIN m)
        |SELECT doc_id, lang FROM documents d JOIN r ON r.g = d.lang
        |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
        |      < permille""".stripMargin,
    "q_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 <
        |  CASE WHEN lang = 'zh' THEN 1000 WHEN lang = 'en' THEN 100 ELSE 500 END""".stripMargin,
    // α=0.5 so the per-group weight is sqrt(n) — IEEE-correctly-rounded in
    // both engines (pow is not); the k-term z sum is ordered by grp on both
    // sides, so every double matches bit-for-bit
    "q_temperature_sample" ->
      """WITH c AS (SELECT lang AS grp, COUNT(*) AS n FROM documents GROUP BY 1),
        |z AS (SELECT SUM(sqrt(n) ORDER BY grp) AS z FROM c),
        |q AS (SELECT grp, LEAST(n, CAST(ROUND(300 * sqrt(n) / z) AS BIGINT)) AS quota
        |      FROM c, z),
        |r AS (SELECT doc_id AS id, lang AS grp,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |      FROM documents)
        |SELECT r.id, r.grp FROM r JOIN q USING (grp) WHERE rk <= quota""".stripMargin,
    "q_token_budget" ->
      s"""WITH c AS (SELECT doc_id AS id, lang AS grp,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS ord
         |  FROM documents WHERE lang IN ('en', 'zh', 'es')),
         |w AS (SELECT id, grp, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY grp ORDER BY ord, id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior FROM c)
         |SELECT id, grp, n_tokens FROM w WHERE prior <
         |  CASE grp WHEN 'en' THEN 6000 WHEN 'zh' THEN 2000 ELSE 1500 END""".stripMargin,
    "q_snapshot_diff" ->
      """WITH old AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 3),
        |nw AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 5),
        |o AS (SELECT doc_id AS id, md5(text) AS old_hash FROM old),
        |n AS (SELECT doc_id AS id, md5(text) AS new_hash FROM nw)
        |SELECT COALESCE(o.id, n.id) AS id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  old_hash, new_hash
        |FROM o FULL OUTER JOIN n ON o.id = n.id""".stripMargin,
    "q_distribution_drift" ->
      s"""WITH old AS (SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
         |  FROM documents WHERE doc_id % 11 <> 3),
         |nw AS (SELECT text FROM documents WHERE doc_id % 13 <> 5),
         |tok AS (SELECT FALSE AS isnew, unnest($toksSql) AS tok FROM old
         |        UNION ALL
         |        SELECT TRUE AS isnew, unnest($toksSql) AS tok FROM nw),
         |voc AS (SELECT tok,
         |        CAST(SUM(CASE WHEN isnew THEN 0 ELSE 1 END) AS BIGINT) AS c_o,
         |        CAST(SUM(CASE WHEN isnew THEN 1 ELSE 0 END) AS BIGINT) AS c_n
         |        FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c_o) AS BIGINT) AS n_o,
         |        CAST(SUM(c_n) AS BIGINT) AS n_n, COUNT(*) AS v FROM voc),
         |terms AS (SELECT c_n, n_o, n_n, v,
         |      CAST(ln(CAST((c_n + 1) * (n_o + v) AS DOUBLE) /
         |              CAST((c_o + 1) * (n_n + v) AS DOUBLE)) AS DECIMAL(18,6)) AS lr
         |      FROM voc CROSS JOIN tot)
         |SELECT v, n_o AS n_old, n_n AS n_new,
         |  CASE WHEN n_n > 0 THEN CAST(CAST(SUM(lr * c_n) AS DECIMAL(18,6)) AS DOUBLE) /
         |       CAST(n_n AS DOUBLE) END AS drift
         |FROM terms GROUP BY v, n_o, n_n""".stripMargin,
    "q_substring_dedup" -> substringDedupOracle,
    // the stream must converge on the batch ownership answer exactly
    "q_stream_substringdedup" -> substringDedupOracle,
    "q_winnow" -> winnowOracle,
    // the stream must converge on the batch ownership answer exactly
    "q_stream_winnow" -> winnowOracle,
    // the winnow-print replay split into index (% 10 <> 0) and delta
    // (% 10 = 0) sides; hits = DISTINCT shared prints per delta doc
    "q_winnow_probe" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(range(0, len(tk) - 8 + 1),
         |      i -> ('0x' || substring(md5(array_to_string(list_slice(tk, CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' ')), 1, 15))::BIGINT) AS hs
         |      FROM toks WHERE len(tk) >= 8),
         |sel AS (SELECT doc_id, hs,
         |      list_distinct(list_transform(range(0, greatest(len(hs) - 4, 0) + 1),
         |        j -> j + least(4, len(hs)) - list_position(
         |               list_reverse(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT))),
         |               list_min(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT)))))) AS pos
         |      FROM h),
         |pr0 AS (SELECT doc_id, hs, unnest(pos) AS p FROM sel),
         |pr AS (SELECT doc_id, hs[CAST(p + 1 AS INT)] AS print FROM pr0),
         |ipr AS (SELECT DISTINCT print FROM pr WHERE doc_id % 10 <> 0),
         |hits AS (SELECT doc_id, COUNT(DISTINCT print) AS n_hits
         |         FROM pr JOIN ipr USING (print) WHERE doc_id % 10 = 0 GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       COALESCE(h.n_hits, 0) >= 1 AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id % 10 = 0""".stripMargin,
    // maintenance identity: retiring changed ids from the gen-A prints and
    // the STREAMING maintain loop converges to the winnowed prints of the
    // final membership ((stored − retired) ∪ admitted — retire idempotent,
    // admits disjoint), re-derived from scratch here
    "q_stream_winnowmaintain" ->
      s"""WITH m AS (SELECT doc_id, text FROM documents
         |           WHERE doc_id % 13 <> 0 OR doc_id % 10 = 0),
         |toks AS (SELECT doc_id, $toksSql AS tk FROM m),
         |h AS (SELECT doc_id, list_transform(range(0, len(tk) - 8 + 1),
         |      i -> ('0x' || substring(md5(array_to_string(list_slice(tk, CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' ')), 1, 15))::BIGINT) AS hs
         |      FROM toks WHERE len(tk) >= 8),
         |sel AS (SELECT doc_id, hs,
         |      list_distinct(list_transform(range(0, greatest(len(hs) - 4, 0) + 1),
         |        j -> j + least(4, len(hs)) - list_position(
         |               list_reverse(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT))),
         |               list_min(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT)))))) AS pos
         |      FROM h),
         |pr0 AS (SELECT doc_id, hs, unnest(pos) AS p FROM sel)
         |SELECT doc_id, CAST(p AS BIGINT) AS pos, hs[CAST(p + 1 AS INT)] AS print
         |FROM pr0""".stripMargin,
    // appending added ∪ changed docs' prints must equal the from-scratch
    // gen-B (= current documents) prints, row for row
    "q_winnow_index_delta" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(range(0, len(tk) - 8 + 1),
         |      i -> ('0x' || substring(md5(array_to_string(list_slice(tk, CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' ')), 1, 15))::BIGINT) AS hs
         |      FROM toks WHERE len(tk) >= 8),
         |sel AS (SELECT doc_id, hs,
         |      list_distinct(list_transform(range(0, greatest(len(hs) - 4, 0) + 1),
         |        j -> j + least(4, len(hs)) - list_position(
         |               list_reverse(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT))),
         |               list_min(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT)))))) AS pos
         |      FROM h),
         |pr0 AS (SELECT doc_id, hs, unnest(pos) AS p FROM sel)
         |SELECT doc_id, CAST(p AS BIGINT) AS pos, hs[CAST(p + 1 AS INT)] AS print
         |FROM pr0""".stripMargin,
    // winnowed decontamination: the q_winnow print replay on both sides —
    // bench = doc_id % 97 docs' distinct prints, hits = DISTINCT shared
    // prints per corpus doc
    "q_decontaminate_winnow" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |h AS (SELECT doc_id, list_transform(range(0, len(tk) - 8 + 1),
         |      i -> ('0x' || substring(md5(array_to_string(list_slice(tk, CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' ')), 1, 15))::BIGINT) AS hs
         |      FROM toks WHERE len(tk) >= 8),
         |sel AS (SELECT doc_id, hs,
         |      list_distinct(list_transform(range(0, greatest(len(hs) - 4, 0) + 1),
         |        j -> j + least(4, len(hs)) - list_position(
         |               list_reverse(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT))),
         |               list_min(list_slice(hs, CAST(j + 1 AS INT), CAST(j + least(4, len(hs)) AS INT)))))) AS pos
         |      FROM h),
         |pr0 AS (SELECT doc_id, hs, unnest(pos) AS p FROM sel),
         |pr AS (SELECT doc_id, hs[CAST(p + 1 AS INT)] AS print FROM pr0),
         |bpr AS (SELECT DISTINCT print FROM pr WHERE doc_id % 97 = 0),
         |hits AS (SELECT doc_id, COUNT(DISTINCT print) AS n_hits
         |         FROM pr JOIN bpr USING (print) GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       COALESCE(h.n_hits, 0) >= 1 AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)""".stripMargin,
    "q_substring_dedup_clean" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |base AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks),
         |wins0 AS (SELECT doc_id, tk, unnest(range(0, len(tk) - 15)) AS start
         |       FROM base WHERE n_tokens >= 16),
         |wins AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
         |       md5(array_to_string(list_slice(tk, CAST(start + 1 AS INT), CAST(start + 16 AS INT)), ' ')) AS h
         |       FROM wins0),
         |o AS (SELECT doc_id, start,
         |      row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn FROM wins),
         |d AS (SELECT doc_id, start, start + 16 AS e FROM o WHERE rn > 1),
         |isl AS (SELECT doc_id, start, e,
         |        max(e) OVER (PARTITION BY doc_id ORDER BY start
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM d),
         |g AS (SELECT doc_id, start, e,
         |      SUM(CASE WHEN pmax IS NULL OR start > pmax THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY doc_id ORDER BY start
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isle FROM isl),
         |sp AS (SELECT doc_id, isle, MIN(start) AS s, MAX(e) AS e FROM g GROUP BY 1, 2),
         |spl AS (SELECT doc_id, list({'s': s, 'e': e}) AS spans,
         |        CAST(SUM(e - s) AS BIGINT) AS dup_tokens FROM sp GROUP BY 1)
         |SELECT b.doc_id, b.n_tokens,
         |  CAST(COALESCE(l.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CASE WHEN l.spans IS NULL THEN array_to_string(b.tk, ' ')
         |       ELSE COALESCE(array_to_string(list_transform(
         |         list_filter(range(0, len(b.tk)),
         |           i -> len(list_filter(l.spans, x -> i >= x.s AND i < x.e)) = 0),
         |         i -> b.tk[CAST(i + 1 AS INT)]), ' '), '') END AS clean_text
         |FROM base b LEFT JOIN spl l USING (doc_id)""".stripMargin,
    "q_heavy_hitters" -> heavyHittersOracle,
    // running streaming counts compact to the same exact answer
    "q_stream_heavyhitters" -> heavyHittersOracle,
    "q_kmv" ->
      """WITH u AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM lineitem WHERE l_partkey IS NOT NULL),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM u)
        |SELECT l_returnflag, COUNT(*) AS n_kept,
        |  CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
        |       ELSE CAST(63 AS DOUBLE) / (CAST(MAX(h) AS DOUBLE) / 1152921504606846976)
        |  END AS distinct_est
        |FROM r WHERE rn <= 64 GROUP BY 1""".stripMargin,
    "q_redact" ->
      """WITH t AS (SELECT c_custkey,
        |  c_name || ' email ' || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g')) ||
        |  '@mail.example.com phone 415-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        |  ' ssn ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
        |  lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
        |  lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        |  ' ip ' || CAST(c_custkey % 256 AS VARCHAR) || '.10.0.1' AS contact
        |  FROM customer)
        |SELECT c_custkey,
        | regexp_replace(regexp_replace(regexp_replace(regexp_replace(contact,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
        |   '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted
        |FROM t""".stripMargin,
    // NFC normalization is defined by the Unicode standard — DuckDB's
    // nfc_normalize reproduces the JDK Normalizer bit-for-bit
    "q_nfc_normalize" ->
      s"""WITH t AS (SELECT doc_id, regexp_replace(text, 'a', 'a' || chr(769), 'g') AS deco
         |           FROM documents)
         |SELECT doc_id, nfc_normalize(deco) AS nfc_text,
         |  CAST(CASE WHEN nfc_normalize(deco) = deco THEN 0 ELSE 1 END AS BIGINT) AS changed
         |FROM t""".stripMargin,
    "q_encoding_stats" ->
      s"""WITH t AS (SELECT doc_id, text ||
         |  substr(chr(65533) || chr(65533), 1, CAST(doc_id % 3 AS INT)) ||
         |  CASE WHEN doc_id % 5 = 0 THEN ' ' || chr(1) || chr(2) || ' caf' || chr(233) ELSE '' END ||
         |  CASE WHEN doc_id % 7 = 0 THEN ' e' || chr(769) ELSE '' END AS s2
         |  FROM documents)
         |SELECT doc_id,
         | CAST(length(s2) AS BIGINT) AS n_chars,
         | CAST(len(regexp_extract_all(s2, chr(65533))) AS BIGINT) AS n_replacement,
         | CAST(len(regexp_extract_all(s2, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS n_control,
         | CAST(len(regexp_extract_all(s2, '[^\\x00-\\x7F]')) AS DOUBLE) / CAST(greatest(length(s2), 1) AS DOUBLE) AS non_ascii_frac,
         | CAST(CASE WHEN nfc_normalize(s2) = s2 THEN 0 ELSE 1 END AS BIGINT) AS nfc_changed
         |FROM t""".stripMargin,
    "q_script_stats" -> scriptStatsOracle,
    // the C4 rules as a DuckDB list_filter lambda: rtrim-then-terminal,
    // space-split word count, lowercase banned-substring checks — the
    // native's loop is defined to be exactly this lambda
    "q_c4_clean" -> {
      val bans = Text.c4Banned.map(b =>
        s"NOT contains(lower(l), '$b')").mkString(" AND ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |l0 AS (SELECT doc_id,
         |  -- COALESCE: DuckDB's array_to_string is NULL on an empty list
         |  -- where Spark's array_join is '' — short docs must not NULL out
         |  COALESCE(array_to_string(list_slice(tk, 1, 8), ' '), '') || '.' || chr(10) ||
         |  'ok' || chr(10) ||
         |  'Please enable JavaScript to continue.' || chr(10) ||
         |  COALESCE(array_to_string(list_slice(tk, 9, 20), ' '), '') || ' done?' || chr(10) ||
         |  COALESCE(array_to_string(list_slice(tk, 21, 25), ' '), '') AS doc0 FROM t),
         |l AS (SELECT doc_id,
         |  CASE WHEN doc_id % 13 = 0 THEN doc0 || chr(10) || 'lorem ipsum {'
         |       ELSE doc0 END AS doc FROM l0),
         |g AS (SELECT doc_id, doc FROM l
         |      WHERE NOT (contains(lower(doc), 'lorem ipsum') OR contains(doc, '{'))),
         |c AS (SELECT doc_id, doc,
         |  array_to_string(list_filter(string_split(doc, chr(10)), l ->
         |    regexp_matches(rtrim(l, ' '), '[.!?"'']$$')
         |    AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 3
         |    AND $bans), chr(10)) AS clean FROM g)
         |SELECT doc_id, clean,
         |  CAST(len(string_split(doc, chr(10))) AS BIGINT) AS n_lines,
         |  CAST(CASE WHEN clean = '' THEN 0
         |       ELSE len(string_split(clean, chr(10))) END AS BIGINT) AS n_kept
         |FROM c""".stripMargin
    },
    // flagship: extraction chain + nfc + min-id dedup on the extracted
    // text + the langidOracle CASE over the CLEANED tokens
    "q_web_pipeline" -> {
      val pageA = "'<html><body><script>track();</script><p>' || text || " +
        "' &amp; tail</p><a href=\"/x\">next</a></body></html>'"
      val pageB = "'<div class=\"main\"><style>p{}</style>' || chr(10) || '<p>' || text || " +
        "'&nbsp;&amp; tail</p><!-- v2 --><a' || chr(10) || 'href=\"/y\">next</a></div>'"
      val codes = Text.stopwords.keys.toSeq.sorted
      val scores = codes.map(c =>
        s"${langScore(Text.stopwords(c))} AS s_$c").mkString(", ")
      s"""WITH h AS (SELECT doc_id, $pageA AS html FROM documents
         |           UNION ALL
         |           SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
         |                  $pageB FROM documents),
         |c AS (SELECT doc_id, nfc_normalize($htmlCleanSql) AS clean FROM h),
         |k AS (SELECT MIN(doc_id) AS doc_id FROM c GROUP BY md5(clean)),
         |t AS (SELECT c.doc_id, list_filter(string_split(clean, ' '), t -> t <> '') AS tk
         |      FROM c JOIN k USING (doc_id)),
         |sc AS (SELECT doc_id, tk, $scores FROM t)
         |SELECT doc_id, CASE
         |  WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
         |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |  WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |  WHEN s_es >= s_fr THEN 'es'
         |  ELSE 'fr' END AS lang_pred,
         |  CAST(len(tk) AS BIGINT) AS n_tokens FROM sc""".stripMargin
    },
    "q_html_text" ->
      s"""WITH h AS (SELECT doc_id, $htmlExprSql AS html FROM documents)
         |SELECT doc_id, $htmlCleanSql AS clean FROM h""".stripMargin,
    "q_html_stats" ->
      s"""WITH h AS (SELECT doc_id, $htmlExprSql AS html FROM documents)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(html, '(?s)<[^>]+>')) AS BIGINT) AS n_tags,
         | CAST(len(regexp_extract_all(html, '(?is)<a[ \\t\\n\\r\\f>]')) AS BIGINT) AS n_links,
         | CAST(len(regexp_extract_all(html, '(?is)<script[ \\t\\n\\r\\f>]')) AS BIGINT) AS n_scripts,
         | CAST(length($htmlCleanSql) AS DOUBLE) / CAST(greatest(length(html), 1) AS DOUBLE) AS text_frac
         |FROM h""".stripMargin,
    // per-term scores quantize to DECIMAL(18,6) before the per-doc sum:
    // ln differs by 1 ulp cross-engine on rare inputs, and raw double
    // summation is partition-order nondeterministic (see Search scaladoc)
    "q_bm25" ->
      s"""$bm25CtesSql
         |SELECT doc_id, score FROM bmtop""".stripMargin,
    // store/load round trip + the 990‰ df-ceiling default: identical to
    // the direct scan except terms above the ceiling drop on both engines
    "q_bm25_index" ->
      s"""${bm25CtesSql(990)}
         |SELECT doc_id, score FROM bmtop""".stripMargin,
    // df-ceiling stop-term guard: the SAME predicate the probe applies to
    // the stored terms/ table (df·1000 <= 780·n) filters the oracle's own
    // dfreq, so both engines drop the identical term set data-derivedly —
    // the cut stays exact at any scale factor
    "q_bm25_stopguard" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |tstats AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, term, COUNT(*) AS tf
         |           FROM (SELECT doc_id, tk, unnest(tk) AS term FROM toks)
         |           WHERE term IN ('spark', 'vector', 'batch')
         |           GROUP BY 1, 2, 3),
         |corp AS (SELECT COUNT(*) AS n, SUM(CAST(len(tk) AS BIGINT)) AS sumdl FROM toks),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tstats GROUP BY 1),
         |keep AS (SELECT f.term, f.df FROM dfreq f CROSS JOIN corp c
         |         WHERE f.df * 1000 <= 780 * c.n),
         |scored AS (SELECT t.doc_id,
         |    CAST(ln(1 + (c.n - f.df + 0.5) / (f.df + 0.5)) *
         |         ((t.tf * (CAST(1.2 AS DOUBLE) + 1)) /
         |          (t.tf + CAST(1.2 AS DOUBLE) *
         |           (1 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (t.dl / (c.sumdl / c.n)))))
         |      AS DECIMAL(18,6)) AS s
         |  FROM tstats t JOIN keep f USING (term) CROSS JOIN corp c),
         |bmtop AS (SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS score
         |          FROM scored GROUP BY doc_id
         |          ORDER BY score DESC, doc_id LIMIT 10)
         |SELECT doc_id, score FROM bmtop""".stripMargin,
    "q_bm25_many" -> bm25ManyOracle,
    // whole-query batch splits append the same rows — the stream lands on
    // the batch answer exactly
    "q_stream_bm25probe" -> bm25ManyOracle,
    // maintained postings ≡ tokenize-from-scratch over the maintained
    // membership (base %10!=0 minus retired %13==0, plus ALL of the
    // admitted %10==0 — retire applies to stored rows only, so a doc in
    // both sets is REPLACED, not dropped)
    // the STREAMING maintain loop converges to the same maintained
    // membership ((stored − retired) ∪ admitted — the retire set is
    // idempotent per batch and disjoint from the admits), so it shares
    // the delta oracle verbatim
    "q_stream_lexmaintain" ->
      s"""WITH m AS (SELECT doc_id, text FROM documents
         |           WHERE doc_id % 13 <> 0 OR doc_id % 10 = 0),
         |t AS (SELECT doc_id, $toksSql AS tk FROM m),
         |p AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, term,
         |      CAST(COUNT(*) AS BIGINT) AS tf
         |      FROM (SELECT doc_id, tk, unnest(tk) AS term FROM t)
         |      GROUP BY 1, 2, 3)
         |SELECT doc_id, term, tf, dl,
         |  CAST(('0x' || substring(md5(term), 1, 15))::BIGINT % 16 AS BIGINT) AS bucket
         |FROM p""".stripMargin,
    "q_bm25_index_delta" ->
      s"""WITH m AS (SELECT doc_id, text FROM documents
         |           WHERE doc_id % 13 <> 0 OR doc_id % 10 = 0),
         |t AS (SELECT doc_id, $toksSql AS tk FROM m),
         |p AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, term,
         |      CAST(COUNT(*) AS BIGINT) AS tf
         |      FROM (SELECT doc_id, tk, unnest(tk) AS term FROM t)
         |      GROUP BY 1, 2, 3)
         |SELECT doc_id, term, tf, dl,
         |  CAST(('0x' || substring(md5(term), 1, 15))::BIGINT % 16 AS BIGINT) AS bucket
         |FROM p""".stripMargin,
    // RRF: both lists' ranks replay (BM25 CTEs shared with q_bm25; dense =
    // the annOracle cosine for query 0), contributions are exact integer
    // 1e6 // (60 + rank), the fused order is total on (rrf_ppm, id)
    "q_rrf_hybrid" ->
      s"""$bm25CtesSql,
         |lex AS (SELECT doc_id AS id,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bmtop),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
         |cv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
         |ds AS (SELECT cv.vec_id AS id,
         |  CASE WHEN sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v)) = 0 THEN 0
         |       ELSE list_dot_product(qv.v, cv.v) / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) END AS cos
         |  FROM qv CROSS JOIN cv),
         |dense AS (SELECT id, rnk FROM (
         |  SELECT id, row_number() OVER (ORDER BY cos DESC, id) AS rnk FROM ds)
         |  WHERE rnk <= 10),
         |contrib AS (SELECT id, 1000000 // (60 + rnk) AS c FROM lex
         |            UNION ALL SELECT id, 1000000 // (60 + rnk) FROM dense),
         |f AS (SELECT id, CAST(SUM(c) AS BIGINT) AS rrf_ppm FROM contrib GROUP BY id)
         |SELECT doc_id, rrf_ppm, rank FROM (
         |  SELECT id AS doc_id, rrf_ppm,
         |    CAST(row_number() OVER (ORDER BY rrf_ppm DESC, id) AS BIGINT) AS rank
         |  FROM f) WHERE rank <= 10""".stripMargin,
    // the full hybrid stack replay: bmtop (lexical), pooled dots (dense),
    // RRF fusion, then the exact MaxSim interaction over the 10 fused
    // candidates — every stage integral/decimal, bit-for-bit
    "q_hybrid_rerank" ->
      s"""$bm25CtesSql,
         |lex AS (SELECT doc_id AS id,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bmtop),
         |e AS MATERIALIZED (SELECT vec_id // 5 AS id, vec_id % 5 AS pos,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 65536.0)) AS qv
         |  FROM embeddings),
         |pool AS MATERIALIZED (SELECT id, list(comp ORDER BY j) AS pv FROM (
         |    SELECT id, j, SUM(qv[j]) AS comp
         |    FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS j) GROUP BY id, j)
         |  GROUP BY id),
         |dense AS (SELECT id, rnk FROM (
         |    SELECT d.id,
         |      row_number() OVER (ORDER BY
         |        CAST(list_dot_product(q.pv, d.pv) AS BIGINT) DESC, d.id) AS rnk
         |    FROM (SELECT pv FROM pool WHERE id = 0) q
         |    CROSS JOIN (SELECT * FROM pool WHERE id <> 0) d)
         |  WHERE rnk <= 10),
         |contrib AS (SELECT id, 1000000 // (60 + rnk) AS c FROM lex
         |            UNION ALL SELECT id, 1000000 // (60 + rnk) FROM dense),
         |f AS (SELECT id, CAST(SUM(c) AS BIGINT) AS rrf_ppm FROM contrib GROUP BY id),
         |cand AS (SELECT id FROM (
         |    SELECT id, row_number() OVER (ORDER BY rrf_ppm DESC, id) AS rank FROM f)
         |  WHERE rank <= 10 AND id <> 0),
         |pm AS (SELECT q.pos AS qpos, d.id AS neighbor_id,
         |    max(CAST(list_dot_product(q.qv, d.qv) AS BIGINT)) AS m
         |  FROM (SELECT * FROM e WHERE id = 0) q
         |  CROSS JOIN (SELECT e.* FROM e JOIN cand ON e.id = cand.id) d
         |  GROUP BY 1, 2),
         |sc AS (SELECT neighbor_id, CAST(SUM(m) AS BIGINT) AS maxsim
         |  FROM pm GROUP BY 1)
         |SELECT CAST(0 AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
         |       neighbor_id, maxsim FROM (
         |  SELECT neighbor_id, maxsim,
         |         row_number() OVER (ORDER BY maxsim DESC, neighbor_id) AS rnk
         |  FROM sc) WHERE rnk <= 5""".stripMargin,
  )
}
