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

/** DuckDB oracles: dedup/similarity/index/text families (SparkEntry registry — see [[EntryFixtures]]). */
object EntryOraclesScale {
  import EntryFixtures._
  import OracleFixtures._
  private[graft] val m: Map[String, String] = Map(
    "q_chunks" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |c AS (SELECT doc_id, tk,
         |      unnest(range(0, ((len(tk) - 1) // 32) + 1)) AS chunk_id
         |      FROM toks WHERE len(tk) > 0)
         |SELECT doc_id, chunk_id,
         | array_to_string(list_slice(tk, chunk_id * 32 + 1, chunk_id * 32 + 64), ' ') AS chunk_text,
         | CAST(LEAST(64, len(tk) - chunk_id * 32) AS BIGINT) AS n_tokens
         |FROM c""".stripMargin,
    "q_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |g AS (SELECT doc_id,
         |      unnest(list_transform(range(0, len(tk) - 1),
         |             i -> array_to_string(list_slice(tk, i + 1, i + 2), ' '))) AS gram
         |      FROM toks WHERE len(tk) >= 2),
         |c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, COUNT(*) AS n_distinct,
         | CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac,
         | CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
         |FROM c GROUP BY doc_id""".stripMargin,
    "q_span_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |ch AS (SELECT doc_id, tk,
         |       unnest(range(0, ((len(tk) - 1) // 32) + 1)) AS chunk_id
         |       FROM toks WHERE len(tk) > 0),
         |h AS (SELECT doc_id, chunk_id,
         |      md5(array_to_string(list_slice(tk, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ')) AS h
         |      FROM ch),
         |o AS (SELECT doc_id, chunk_id,
         |      row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_id) AS rn
         |      FROM h)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         | CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         | CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
         |   CAST(COUNT(*) AS DOUBLE) AS dup_frac
         |FROM o GROUP BY doc_id""".stripMargin,
    // the stream must converge on the batch ownership answer exactly
    "q_stream_spandedup" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |ch AS (SELECT doc_id, tk,
         |       unnest(range(0, ((len(tk) - 1) // 32) + 1)) AS chunk_id
         |       FROM toks WHERE len(tk) > 0),
         |h AS (SELECT doc_id, chunk_id,
         |      md5(array_to_string(list_slice(tk, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ')) AS h
         |      FROM ch),
         |o AS (SELECT doc_id, chunk_id,
         |      row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_id) AS rn
         |      FROM h)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         | CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         | CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
         |   CAST(COUNT(*) AS DOUBLE) AS dup_frac
         |FROM o GROUP BY doc_id""".stripMargin,
    "q_span_dedup_clean" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |ch AS (SELECT doc_id, tk,
         |       unnest(range(0, ((len(tk) - 1) // 32) + 1)) AS chunk_id
         |       FROM toks WHERE len(tk) > 0),
         |h AS (SELECT doc_id, chunk_id,
         |      array_to_string(list_slice(tk, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ') AS t,
         |      md5(array_to_string(list_slice(tk, chunk_id * 32 + 1, chunk_id * 32 + 32), ' ')) AS h
         |      FROM ch),
         |o AS (SELECT doc_id, chunk_id, t,
         |      row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_id) AS rn
         |      FROM h)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         | CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         | COALESCE(string_agg(t, ' ' ORDER BY chunk_id) FILTER (WHERE rn = 1), '') AS clean_text
         |FROM o GROUP BY doc_id""".stripMargin,
    "q_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |ch AS (SELECT doc_id, tk,
         |       unnest(range(0, ((len(tk) - 1) // 2) + 1)) AS chunk_id
         |       FROM toks WHERE len(tk) > 0),
         |hh AS (SELECT doc_id, chunk_id,
         |      array_to_string(list_slice(tk, chunk_id * 2 + 1, chunk_id * 2 + 2), ' ') AS t,
         |      md5(array_to_string(list_slice(tk, chunk_id * 2 + 1, chunk_id * 2 + 2), ' ')) AS h
         |      FROM ch),
         |d AS (SELECT h, COUNT(DISTINCT doc_id) AS docs FROM hh GROUP BY h),
         |o AS (SELECT hh.doc_id, hh.chunk_id, hh.t, (d.docs >= 20) AS boiler
         |      FROM hh JOIN d USING (h))
         |SELECT doc_id, COUNT(*) AS n_chunks,
         | CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_chunks,
         | COALESCE(string_agg(t, ' ' ORDER BY chunk_id) FILTER (WHERE NOT boiler), '')
         |   AS clean_text
         |FROM o GROUP BY doc_id""".stripMargin,
    "q_canonical_url" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END)
        |  || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END)
        |  || source || '.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
        |  || '/Path/' || CAST(doc_id AS VARCHAR)
        |  || (CASE WHEN doc_id % 4 = 0 THEN '/?utm_source=x&utm_medium=y'
        |      ELSE '?a=1&gclid=z#frag' END) AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '', 'g') AS x FROM u),
        |s2 AS (SELECT doc_id, url, regexp_replace(x,
        |  '([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*', '\1', 'g') AS x FROM s1),
        |s3 AS (SELECT doc_id, url, regexp_replace(x, '\?&+', '?', 'g') AS x FROM s2),
        |s4 AS (SELECT doc_id, url, regexp_replace(x, '&&+', '&', 'g') AS x FROM s3),
        |s5 AS (SELECT doc_id, url, regexp_replace(x, '[?&]+$', '', 'g') AS x FROM s4),
        |s6 AS (SELECT doc_id, url,
        |  lower(regexp_extract(x, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) AS head,
        |  regexp_replace(x, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS tail FROM s5),
        |s7 AS (SELECT doc_id, url,
        |  regexp_replace(regexp_replace(head, '^(http://[^/?#]*):80$', '\1'),
        |                 '^(https://[^/?#]*):443$', '\1') || tail AS x FROM s6)
        |SELECT doc_id, url, regexp_replace(x, '/$', '') AS canon FROM s7""".stripMargin,
    "q_domain_filter" ->
      """WITH u AS (SELECT doc_id,
        |     'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'cdn.' ELSE 'www.' END)
        |       || source || '.com/' || CAST(doc_id AS VARCHAR) AS url
        |     FROM documents),
        |d AS (SELECT doc_id, url,
        |      string_split(regexp_replace(
        |        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1),
        |        '^www\.', ''), '.') AS p
        |      FROM u),
        |suf AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(p) + 1),
        |               i -> array_to_string(list_slice(p, i, len(p)), '.'))) AS sfx
        |        FROM d)
        |SELECT doc_id, url FROM u
        |WHERE doc_id NOT IN (SELECT doc_id FROM suf WHERE sfx IN ('src3.com', 'src7.com'))""".stripMargin,
    "q_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |sc AS (SELECT doc_id, token,
         |       CAST(tf * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS DECIMAL(18,6)) AS score
         |       FROM tf JOIN dfq USING (token) CROSS JOIN n),
         |r AS (SELECT doc_id, token, score,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
         |      FROM sc)
         |SELECT doc_id, token, CAST(score AS DOUBLE) AS score, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3""".stripMargin,
    "q_vocab" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |c AS (SELECT token, COUNT(*) AS n_occurrences,
         |      COUNT(DISTINCT doc_id) AS n_docs FROM tok GROUP BY 1)
         |SELECT token, n_occurrences, n_docs,
         | CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT) AS freq_rank
         |FROM c""".stripMargin,
    "q_lm_xent" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |voc AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS v FROM voc),
         |q AS (SELECT tok,
         |      CAST(-ln(CAST(cnt + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)) AS DECIMAL(18,6)) AS xq
         |      FROM voc CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(SUM(xq * tf) AS DECIMAL(18,6)) AS sx,
         |      CAST(SUM(tf) AS BIGINT) AS n_tokens
         |      FROM tf JOIN q USING (tok) GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         | CAST(sx AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS xent FROM s""".stripMargin,
    "q_lm_xent_bigram" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |v AS (SELECT COUNT(DISTINCT tok) AS v
         |      FROM (SELECT unnest(tk) AS tok FROM toks)),
         |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(tk) - 1),
         |       i -> {'w1': tk[i + 1], 'w2': tk[i + 2]})) AS b
         |       FROM toks WHERE len(tk) >= 2),
         |dtf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2, COUNT(*) AS tf
         |        FROM bg GROUP BY 1, 2, 3),
         |big AS (SELECT w1, w2, SUM(tf) AS c12 FROM dtf GROUP BY 1, 2),
         |ctx AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1),
         |q AS (SELECT w1, w2,
         |      CAST(-ln(CAST(c12 + 1 AS DOUBLE) /
         |               CAST(c1 + (SELECT v FROM v) AS DOUBLE)) AS DECIMAL(18,6)) AS xq
         |      FROM big JOIN ctx USING (w1)),
         |s AS (SELECT doc_id, CAST(SUM(xq * tf) AS DECIMAL(18,6)) AS sx,
         |      CAST(SUM(tf) AS BIGINT) AS n_bigrams
         |      FROM dtf JOIN q USING (w1, w2) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         | CAST(sx AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS xent FROM s""".stripMargin,
    "q_train_classifier" -> trainClassifierOracle,
    "q_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |f AS (SELECT doc_id,
         |      ('0x' || substring(md5(tok), 1, 15))::BIGINT % 4096 AS bucket,
         |      COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |w AS (SELECT range AS bucket,
         |      CAST(CAST(range * 37 % 201 - 100 AS DECIMAL(18,6)) *
         |           CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,6)) AS weight
         |      FROM range(4096))
         |SELECT doc_id,
         | CAST(SUM(tf * COALESCE(weight, 0)) + CAST(0.5 AS DECIMAL(3,2)) AS DOUBLE) AS score,
         | CAST(SUM(tf) AS BIGINT) AS n_features
         |FROM f LEFT JOIN w USING (bucket) GROUP BY doc_id""".stripMargin,
    "q_dsir" ->
      s"""WITH toks AS (SELECT doc_id, lang = 'en' AS targ, unnest($toksSql) AS tok
         |              FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |voc AS (SELECT tok, COUNT(*) AS cnt_s,
         |        CAST(SUM(CASE WHEN targ THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
         |        FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt_s) AS BIGINT) AS n_s,
         |        CAST(SUM(cnt_t) AS BIGINT) AS n_t, COUNT(*) AS v FROM voc),
         |q AS (SELECT tok,
         |      CAST(ln(CAST((cnt_t + 1) * (n_s + v) AS DOUBLE) /
         |              CAST((cnt_s + 1) * (n_t + v) AS DOUBLE)) AS DECIMAL(18,6)) AS lq
         |      FROM voc CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(SUM(lq * tf) AS DECIMAL(18,6)) AS logw,
         |      CAST(SUM(tf) AS BIGINT) AS n_tokens
         |      FROM tf JOIN q USING (tok) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, CAST(logw AS DOUBLE) AS logw FROM s""".stripMargin,
    "q_bpe_merges" -> bpeMergesOracle,
    "q_bpe_segment" -> bpeSegmentOracle,
    "q_kmeans" ->
      s"""$kmeansCtes
         |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, dist2 FROM a2 WHERE rnk = 1""".stripMargin,
    // the same Lloyd replay, then the same md5-order quota device as
    // q_sample_per_group — per cluster instead of per priority class
    "q_cluster_sample" ->
      s"""$kmeansCtes,
         |asg AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM a2 WHERE rnk = 1)
         |SELECT vec_id, cluster FROM (
         |  SELECT vec_id, cluster, ROW_NUMBER() OVER (PARTITION BY cluster
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM asg)
         |WHERE rn <= 8""".stripMargin,
    "q_pq" -> pqOracle,
    // exhaustive-probe identity: IVF routing with nprobe = nlist visits
    // every cell, so the oracle is the same exhaustive ADC replay
    "q_pq_ivf" -> pqOracle,
    "q_pq_rerank" -> pqRerankOracle,
    // stored-index probe at nprobe = nlist ≡ the exhaustive ADC scan: the
    // store/load round-trip must reproduce q_pq bit for bit
    "q_ann_index_probe" -> pqOracle,
    // the rotated index replay: identical CTE chain over list_reverse(embedding)
    "q_ann_index_opq" -> pqOpqOracle,
    // the streamed probe must converge on the same answer under any
    // batch split (verdicts depend only on query + static index)
    "q_stream_annprobe" -> pqOracle,
    "q_stream_sqprobe" -> sqOracle, // stateless probe ≡ batch under any split
    "q_stream_maxsim" -> maxSimOracle, // stateless probe, whole-query splits
    "q_ann_index_delta" -> annIndexDeltaOracle,
    // the streaming maintain loop converges to the same maintained
    // membership (retire idempotent, admits re-encode deterministically
    // under the frozen model) — shared oracle
    "q_stream_annmaintain" -> annIndexDeltaOracle,
    // exact integer scatter sums — DuckDB's SUM(BIGINT) widens to
    // HUGEINT, so cast back for the schema match
    "q_gram" ->
      """WITH q AS (SELECT list_transform(embedding,
        |       x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
        |     FROM embeddings),
        |ij AS (SELECT a.range AS i, b.range AS j
        |       FROM range(0, 64) a CROSS JOIN range(0, 64) b)
        |SELECT i, j, CAST(SUM(qv[CAST(i + 1 AS INT)] * qv[CAST(j + 1 AS INT)]) AS BIGINT) AS s
        |FROM q CROSS JOIN ij GROUP BY i, j""".stripMargin,
    "q_semdedup" ->
      s"""$kmeansCtes,
         |asg AS (SELECT vec_id, cid FROM a2 WHERE rnk = 1),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |dup AS (SELECT DISTINCT b.vec_id AS id
         |        FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |        JOIN nn na ON na.vec_id = a.vec_id
         |        JOIN nn nb ON nb.vec_id = b.vec_id
         |        WHERE (CASE WHEN na.nrm * nb.nrm = 0 THEN 0
         |                    ELSE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm)
         |               END) >= 0.2)
         |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
         |       (d.id IS NOT NULL) AS is_dup
         |FROM asg a LEFT JOIN dup d ON d.id = a.vec_id""".stripMargin,
    "q_decontaminate" -> decontaminateOracle,
    "q_decontaminate_bloom" -> decontaminateOracle,
    // G49 corpus-overlap: exact replay — the k smallest DISTINCT shingle
    // hashes per side are a pure function of the shingle sets (no RNG, no
    // partitioning dependence), so DISTINCT/ORDER BY/LIMIT reproduces the
    // KmvSet aggregate bit-for-bit; set math and the single double
    // division then match the Spark projection exactly. The STREAMING twin
    // shares it: KMV mergeability makes the drained sketch identical to
    // the batch one under any split.
    "q_corpus_overlap" -> corpusOverlapOracle,
    "q_stream_corpusoverlap" -> corpusOverlapOracle,
    "q_histogram" ->
      """WITH s AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        |           FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT LEAST(CAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 10))
        |                   AS BIGINT), 9) AS bin, mn, mx
        |      FROM orders, s WHERE o_totalprice IS NOT NULL)
        |SELECT bin, mn + bin * ((mx - mn) / 10) AS lo,
        |       mn + (bin + 1) * ((mx - mn) / 10) AS hi, COUNT(*) AS n
        |FROM b GROUP BY bin, mn, mx""".stripMargin,
    "q_sample_per_group" ->
      """SELECT o_orderkey, o_orderpriority FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q_stream_decontaminate" -> decontaminateOracle,
    // exact transitive closure over the same pair list (LP fixpoint ≡ CC)
    "q_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (
         |${jaccardOracle("0.5")}) jp),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
         |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical
         |FROM reach GROUP BY src""".stripMargin,
    "q_neardup_pipeline" ->
      s"""WITH RECURSIVE lp AS (SELECT id_a, id_b FROM (
         |$lshPairsOracle) q),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM lp
         |          UNION SELECT id_b, id_a FROM lp),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |canon AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical
         |          FROM reach GROUP BY src)
         |SELECT d.doc_id, d.lang FROM documents d LEFT JOIN canon c USING (doc_id)
         |WHERE c.canonical IS NULL OR c.canonical = d.doc_id""".stripMargin,
    "q_soft_dedup" -> softDedupOracle,
    // the drained bucket state's star edges close to the same components
    // as the batch pair list — the stream must land on the batch answer
    "q_stream_softdedup" -> softDedupOracle,
    "q_ccnet_buckets" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |voc AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS v FROM voc),
         |q AS (SELECT tok,
         |      CAST(-ln(CAST(cnt + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)) AS DECIMAL(18,6)) AS xq
         |      FROM voc CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(SUM(xq * tf) AS DECIMAL(18,6)) AS sx,
         |      CAST(SUM(tf) AS BIGINT) AS n_tokens
         |      FROM tf JOIN q USING (tok) GROUP BY doc_id),
         |x AS (SELECT doc_id, n_tokens,
         |      CAST(sx AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS xent FROM s)
         |SELECT doc_id, n_tokens, xent,
         |  CAST(ntile(3) OVER (ORDER BY xent ASC, doc_id ASC) - 1 AS BIGINT) AS bucket
         |FROM x""".stripMargin,
    "q_minhash" ->
      s"""WITH t AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM documents)
         |SELECT doc_id, MIN(md5('0:' || tok)) AS h0, MIN(md5('1:' || tok)) AS h1,
         | MIN(md5('2:' || tok)) AS h2, MIN(md5('3:' || tok)) AS h3
         |FROM t GROUP BY doc_id""".stripMargin,
    "q_cosine_neardup_lsh" -> cosineLshOracle,
    "q_jaccard_pruned" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id,
         |        unnest(list_transform(range(0, len(tk) - 2),
         |               i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))) AS shingle
         |        FROM toks WHERE len(tk) >= 3),
         |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 10),
         |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |it AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
         |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT id_a, id_b, n_inter,
         | CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
         |FROM it JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.5""".stripMargin,
    "q_editdist" ->
      """WITH b AS (SELECT p_partkey, p_name,
        |  array_to_string(list_slice(list_filter(string_split(p_name, ' '), t -> t <> ''), 1, 2), ' ') AS blk
        |  FROM part),
        |g AS (SELECT blk FROM b GROUP BY blk HAVING COUNT(*) BETWEEN 2 AND 64)
        |SELECT a.p_partkey AS id_a, c.p_partkey AS id_b,
        | CAST(levenshtein(a.p_name, c.p_name) AS BIGINT) AS dist
        |FROM b a JOIN b c ON a.blk = c.blk AND a.p_partkey < c.p_partkey
        | JOIN g ON g.blk = a.blk
        |WHERE levenshtein(a.p_name, c.p_name) <= 12""".stripMargin,
    "q_fuzzy_join" ->
      // ok replicates the r16 maxBlockPairs=2^20 guard: blocks whose
      // pair PRODUCT exceeds the cap are dropped on both engines (the
      // sf1-soak cliff fix)
      """WITH l AS (SELECT p_partkey AS l_id, p_name AS l_name,
        |  array_to_string(list_slice(list_filter(string_split(p_name, ' '), t -> t <> ''), 1, 1), ' ') AS blk
        |  FROM part),
        |r0 AS (SELECT p_partkey + 1000000 AS r_id,
        |  regexp_replace(p_name, ' [a-z]+$', '') AS r_name FROM part
        |  WHERE p_partkey % 20 = 0),
        |r AS (SELECT r_id, r_name,
        |  array_to_string(list_slice(list_filter(string_split(r_name, ' '), t -> t <> ''), 1, 1), ' ') AS blk
        |  FROM r0),
        |ok AS (SELECT blk FROM
        |  (SELECT blk, COUNT(*) AS lc FROM l GROUP BY blk) la
        |  JOIN (SELECT blk, COUNT(*) AS rc FROM r GROUP BY blk) ra USING (blk)
        |  WHERE lc * rc <= 1048576)
        |SELECT l_id, l_name, r_id, r_name,
        | CAST(levenshtein(l_name, r_name) AS BIGINT) AS dist
        |FROM l JOIN ok USING (blk) JOIN r USING (blk)
        |WHERE levenshtein(l_name, r_name) <= 12""".stripMargin,
    "q_simhash" -> simhashOracle,
    "q_simhash_pairs" -> simhashPairsOracle,
    "q_lsh_pairs" -> lshPairsOracle,
    "q_incremental_neardup" -> incrementalNearDupOracle,
    "q_index_delta" -> indexDeltaOracle,
    "q_stream_idxmaintain" -> streamIdxMaintainOracle,
    "q_lsh_recall" -> lshRecallOracle,
    "q_stream_incneardup" -> incrementalNearDupOracle,
    "q_incremental_pipeline" -> incrementalPipelineOracle,
    "q_stream_neardup" -> streamNearDupOracle,
    "q_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 200),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   CASE WHEN a.nrm * b.nrm = 0 THEN 0
        |        ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END AS cosine
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id) WHERE cosine >= 0.2""".stripMargin,

    "q_transform_at" ->
      "SELECT o_orderkey, o_totalprice * 2 AS price2x FROM orders",
    "q_pipeline" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F' GROUP BY c_mktsegment""".stripMargin,
    "q_paginated" ->
      "SELECT p.range AS page, 'p' || CAST(p.range AS VARCHAR) || ':' || CAST(i.range AS VARCHAR) AS body FROM range(0, 20) p, range(0, 3) i",
    "q_http_template" ->
      """WITH u AS (SELECT n_nationkey,
        | 'http://api.example/v2/nations/' || CAST(n_nationkey AS VARCHAR) || '?name=' || n_name AS url
        | FROM nation)
        |SELECT n_nationkey, url, 'resp:' || url AS body FROM u
        |UNION ALL
        |SELECT n_nationkey, url, 'len:' || CAST(length(url) AS VARCHAR) AS body FROM u""".stripMargin,
    "q_extract" ->
      """SELECT o_orderkey, c_custkey AS cust_key, l_quantity AS qty
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "q_relations" ->
      """SELECT DISTINCT c_custkey AS src_id, l_partkey AS dst_id, 'ORDERED' AS rel
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "q_stream_e2e" ->
      """SELECT (epoch_us(ts) // 60000000) * 60000000 AS win_us, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_multimodal" -> multimodalOracle,
    "q_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type, epoch_us(ts) AS ts_us FROM events",
    "q_stream_keepbest" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, event_id, value
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT key, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY key ORDER BY value DESC, event_id DESC) AS rn,
        |  COUNT(*) OVER (PARTITION BY key) AS n_copies FROM e)
        |SELECT key, event_id AS keep_id, value AS keep_score, n_copies
        |FROM r WHERE rn = 1""".stripMargin,
    "q_stream_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |g AS (SELECT doc_id,
         |      unnest(list_transform(range(0, len(tk) - 1),
         |             i -> array_to_string(list_slice(tk, i + 1, i + 2), ' '))) AS gram
         |      FROM toks WHERE len(tk) >= 2),
         |c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, COUNT(*) AS n_distinct,
         | CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_frac,
         | CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
         |FROM c GROUP BY doc_id""".stripMargin,
    // the streaming interval join must reproduce the batch interval join
    "q_stream_join" ->
      """SELECT p.event_id AS p_id, e.event_id AS e_id, p.user_id AS user_id,
        | epoch_us(e.ts) - epoch_us(p.ts) AS dt_us
        |FROM events p JOIN events e ON p.user_id = e.user_id
        | AND p.event_type = 'purchase' AND e.event_type = 'error'
        | AND epoch_us(e.ts) >= epoch_us(p.ts) - 300000000
        | AND epoch_us(e.ts) <= epoch_us(p.ts) + 300000000""".stripMargin,
    "q_stream_enrich" ->
      """SELECT user_id, event_id, event_type, c_mktsegment
        |FROM events LEFT JOIN customer ON user_id = c_custkey""".stripMargin,
    "q_envvars" -> "SELECT CAST(NULL AS VARCHAR) AS v",
    "q_csv_roundtrip" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_csv_write_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders""".stripMargin,
    "q_recorder_roundtrip" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_partition_pruning" -> "SELECT doc_id, lang FROM documents WHERE lang = 'en'",
    "q_compact_roundtrip" -> "SELECT c_custkey, c_name, c_nationkey FROM customer",
    "q_swap_roundtrip" -> "SELECT c_custkey, c_name, c_nationkey FROM customer",
    // layout-transparent by design: the pointer protocol must hand back
    // the identical table
    "q_swap_pointer" -> "SELECT c_custkey, c_name, c_nationkey FROM customer",
    // zval mirror: same BIGINT binning, interleave unrolled as 16 shift-or
    // terms (out bit i*2+j = bit i of dim j; dim order custkey, cents)
    "q_zorder" -> {
      val terms = (0 until 8).flatMap(i =>
        Seq(s"(((b0 >> $i) & 1) << ${2 * i})",
            s"(((b1 >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH o AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
         |  CAST(floor(o_totalprice * 100) AS BIGINT) AS y FROM orders),
         |b AS (SELECT min(x) lx, max(x) hx, min(y) ly, max(y) hy FROM o),
         |v AS (SELECT o_orderkey,
         |  ((x - lx) * 256) // (hx - lx + 1) AS b0,
         |  ((y - ly) * 256) // (hy - ly + 1) AS b1 FROM o, b)
         |SELECT o_orderkey, CAST($terms AS BIGINT) AS zval FROM v""".stripMargin
    },
    "q_corpus_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |  md5('7|' || CAST(doc_id AS VARCHAR)) AS key FROM documents),
        |s AS (SELECT doc_id,
        |  ('0x' || substring(key, 1, 15))::BIGINT % 8 AS shard, key FROM k)
        |SELECT doc_id, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
        |FROM s""".stripMargin,
    // manifest: same shard derivation, then per-shard count / char sum /
    // bit_xor of the 60-bit md5 prefix over id || chr(1) || text; the
    // streaming twin converges to the same table (mergeable measures)
    "q_stream_manifest" -> manifestOracle,
    "q_manifest" -> manifestOracle,
    "q_jdbc_query" ->
      """SELECT o_custkey, COUNT(*) AS n_big, MAX(o_totalprice) AS max_price
        |FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey""".stripMargin,
    "q_jdbc_typed" ->
      "SELECT c_custkey, c_name, upper(md5(c_name)) AS c_sig_hex FROM customer",
    "q_graph_roundtrip" ->
      """SELECT DISTINCT c_custkey AS src_id, l_partkey AS dst_id, 'ORDERED' AS rel
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "q_text_roundtrip" -> "SELECT text AS value FROM documents",
    "q_sessionize" -> sessionizeOracle,
    // identical output by construction — the segmented form shares the
    // plain form's oracle
    "q_sessionize_segmented" -> sessionizeOracle,
    // the dialogue flow: the SHARED sessionize CTE prefix (event_type
    // carried through, null utterances filtered on both engines),
    // time-ordered string_agg per session, then the q_pack
    // cumulative-sum binning per user
    "q_dialogue_pack" ->
      s"""${sessionCtesSql(">", ", event_type",
            " WHERE event_type IS NOT NULL")},
         |g AS (SELECT user_id, CAST(sid AS BIGINT) AS session_id,
         |      string_agg(event_type, ' ' ORDER BY ts_us, event_type) AS dialogue,
         |      COUNT(*) AS n_tokens
         |      FROM s GROUP BY user_id, sid)
         |SELECT user_id, session_id, dialogue, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY user_id ORDER BY session_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 50 AS BIGINT) AS bin_id
         |FROM g""".stripMargin,
    "q_stream_sessions" ->
      s"""${sessionCtesSql(">=")}
         |SELECT user_id, MIN(ts_us) AS s_us, MAX(ts_us) + 600000000 AS e_us,
         | COUNT(*) AS n_events
         |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_sessionize_state" -> sessionizeOracle,
    "q_jdbc_roundtrip" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_mtl" ->
      """SELECT c_custkey AS cust_key, l_quantity AS qty, c_name AS cust_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "q_mtl_func" ->
      """SELECT upper(c_name) AS cust_uc, CAST(length(c_name) AS BIGINT) AS name_len,
        | c_custkey AS cust_key
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin,
    "q_mtl_where" ->
      """SELECT c_custkey AS cust_key, l_quantity AS qty, l_partkey AS part_key
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_quantity >= 25 AND c_custkey > 50""".stripMargin,
    "q_mtl_multi" ->
      """SELECT 'custq' AS src, CAST(c_custkey AS VARCHAR) AS a, c_name AS b
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |UNION ALL
        |SELECT 'itemq' AS src, CAST(l_partkey AS VARCHAR) AS a,
        | CAST(l_linenumber AS VARCHAR) AS b
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    // 2 rounds of min-label propagation over the (cust_key, cust_name)
    // coreference graph — mirrors MtlParser.coreferenceGroups exactly
    "q_coreference" ->
      """WITH q AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS a, c_name AS b
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |und AS (SELECT a, b FROM q UNION SELECT b AS a, a AS b FROM q),
        |l0 AS (SELECT DISTINCT a AS id, a AS lbl FROM und),
        |n1 AS (SELECT u.a, MIN(l.lbl) AS mn FROM und u JOIN l0 l ON l.id = u.b GROUP BY u.a),
        |l1 AS (SELECT l0.id, least(l0.lbl, n1.mn) AS lbl FROM l0 JOIN n1 ON n1.a = l0.id),
        |n2 AS (SELECT u.a, MIN(l.lbl) AS mn FROM und u JOIN l1 l ON l.id = u.b GROUP BY u.a),
        |l2 AS (SELECT l1.id, least(l1.lbl, n2.mn) AS lbl FROM l1 JOIN n2 ON n2.a = l1.id)
        |SELECT id AS member, lbl AS canonical FROM l2""".stripMargin,
    "q_compound_entity" ->
      """SELECT DISTINCT md5(CAST(c_custkey AS VARCHAR) || '|' || c_name) AS entity_id,
        | c_custkey AS cust_key, c_name AS cust_name
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    // coreference LP (as in q_coreference) + canonical substitution on both
    // edge endpoints; values outside any component pass through
    "q_kb_canonical" ->
      """WITH q AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS a, c_name AS b
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |und AS (SELECT a, b FROM q UNION SELECT b AS a, a AS b FROM q),
        |l0 AS (SELECT DISTINCT a AS id, a AS lbl FROM und),
        |n1 AS (SELECT u.a, MIN(l.lbl) AS mn FROM und u JOIN l0 l ON l.id = u.b GROUP BY u.a),
        |l1 AS (SELECT l0.id, least(l0.lbl, n1.mn) AS lbl FROM l0 JOIN n1 ON n1.a = l0.id),
        |n2 AS (SELECT u.a, MIN(l.lbl) AS mn FROM und u JOIN l1 l ON l.id = u.b GROUP BY u.a),
        |l2 AS (SELECT l1.id, least(l1.lbl, n2.mn) AS lbl FROM l1 JOIN n2 ON n2.a = l1.id),
        |edges AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS src_id,
        |          CAST(l_partkey AS VARCHAR) AS dst_id, 'ordered' AS rel
        |          FROM orders JOIN customer ON o_custkey = c_custkey
        |           JOIN lineitem ON l_orderkey = o_orderkey)
        |SELECT DISTINCT COALESCE(s.lbl, e.src_id) AS src_id,
        | COALESCE(d.lbl, e.dst_id) AS dst_id, e.rel
        |FROM edges e LEFT JOIN l2 s ON s.id = e.src_id
        | LEFT JOIN l2 d ON d.id = e.dst_id""".stripMargin,
    "q_kb_props" ->
      """SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS src_id,
        | CAST(l_partkey AS VARCHAR) AS dst_id, 'ordered' AS rel,
        | 'line' AS k, CAST(l_linenumber AS VARCHAR) AS v
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "q_config" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""".stripMargin,
    "q_config_llm" ->
      """WITH train AS (SELECT * FROM documents
        |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90)
        |SELECT md5(text) AS hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM train GROUP BY md5(text)""".stripMargin,
    "q_join_window_bucketed" ->
      """SELECT p.event_id AS p_id, e.event_id AS e_id, p.user_id AS user_id,
        | epoch_us(e.ts) - epoch_us(p.ts) AS dt_us
        |FROM events p JOIN events e ON p.user_id = e.user_id
        | AND p.event_type = 'purchase' AND e.event_type = 'error'
        | AND epoch_us(e.ts) >= epoch_us(p.ts) - 300000000
        | AND epoch_us(e.ts) <= epoch_us(p.ts) + 300000000""".stripMargin,

    "q_salted_agg" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n_rows, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_ann" -> annOracle,
    "q_ann_ivf" -> annOracle, // exhaustive IVF ≡ brute force
    "q_sq_topk" -> sqOracle,
    "q_sq_ivf" -> sqOracle, // exhaustive IVF-SQ ≡ sqTopK
    "q_sq_index_probe" -> sqOracle, // stored index at nprobe=nlist ≡ sqTopK
    // config build→probe chain at nprobe=nlist ≡ the exhaustive scan
    "q_config_index" -> sqOracle,
    "q_sq_index_delta" -> sqIndexDeltaOracle,
    "q_sq_rerank" -> sqRerankOracle,
    "q_jl_topk" -> jlOracle,
    "q_maxsim" -> maxSimOracle,
    "q_maxsim_ann_candidates" -> maxSimAnnCandOracle,
    "q_maxsim_rerank" -> maxSimRerankOracle,
    // nprobe == nlist ⇒ the stored-index probe IS the two-stage pooled
    // composition over the indexed corpus — same replay, same law as
    // q_ann_index_probe reusing pqOracle
    "q_maxsim_index" -> maxSimRerankOracle,
    "q_maxsim_index_delta" -> maxSimIndexDeltaOracle,
    // whole-query batch splits against the frozen index append the same
    // rows the one-shot probe emits
    "q_stream_maxsimprobe" -> maxSimRerankOracle,
    "q_margin_mine" -> marginOracle,
    "q_margin_mutual" -> marginMutualOracle,
    "q_margin_ivf" -> marginOracle, // exhaustive IVF routing ≡ brute force
    // streamed fwd/bwd lists merge to the batch operator's exactly
    "q_stream_marginmine" -> marginOracle,
    "q_kcenter" -> kcenterOracle,

    "q_pack" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents)
         |SELECT doc_id, lang, n_tokens,
         | CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000 AS BIGINT) AS bin_id
         |FROM t""".stripMargin,
    "q_llm_pipeline" ->
      s"""WITH t AS (SELECT doc_id, lang, text, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |th AS (SELECT lang, quantile_cont(CAST(n_tokens AS DOUBLE), 0.25) AS p25 FROM t GROUP BY lang),
         |q AS (SELECT t.doc_id, t.lang, t.text, t.n_tokens FROM t JOIN th ON t.lang = th.lang
         |      WHERE CAST(t.n_tokens AS DOUBLE) > th.p25),
         |d AS (SELECT * FROM (SELECT q.*, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep FROM q)
         |      WHERE doc_id = keep),
         |tr AS (SELECT * FROM d
         |       WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90)
         |SELECT doc_id, lang, n_tokens,
         | CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000 AS BIGINT) AS bin_id
         |FROM tr""".stripMargin,
    "q_quantiles" ->
      s"""WITH t AS (SELECT lang, CAST(len($toksSql) AS DOUBLE) AS nt FROM documents)
         |SELECT lang, quantile_cont(nt, 0.25) AS p25, quantile_cont(nt, 0.5) AS p50,
         | quantile_cont(nt, 0.75) AS p75
         |FROM t GROUP BY lang""".stripMargin,
    "q_quality_filter" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($toksSql) AS DOUBLE) AS nt FROM documents),
         |th AS (SELECT lang, quantile_cont(nt, 0.25) AS p25 FROM t GROUP BY lang)
         |SELECT doc_id, t.lang FROM t JOIN th ON t.lang = th.lang WHERE nt > p25""".stripMargin,
    "q_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents)
         |SELECT doc_id, lang, n_tokens FROM t
         |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |      < CAST(floor(greatest(0.0, least(1.0, CAST(n_tokens AS DOUBLE) / 500.0))
         |             * 1152921504606846976.0) AS BIGINT)""".stripMargin,
    "q_split" ->
      """SELECT doc_id, lang,
        | CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
        |      THEN 'train' ELSE 'val' END AS split
        |FROM documents""".stripMargin,

    "q_langid" -> langidOracle,
    // the data card: langid + tokenStats replays joined, rolled up per
    // language; dup count = n_docs − distinct md5 (copies share text ⇒
    // language); ratios are one division of two exact integers
    "q_corpus_report" ->
      s"""WITH lp AS (SELECT * FROM ($langidOracle) AS lx),
         |tok AS (SELECT s.doc_id, s.n_chars, s.n_ws_tokens, s.n_bpeish_tokens,
         |        md5(d.text) AS h
         |        FROM ($tokenStatsOracle) AS s JOIN documents d USING (doc_id)),
         |g AS (SELECT lang_pred AS lang, COUNT(*) AS n_docs,
         |      COUNT(*) - COUNT(DISTINCT h) AS n_dup_docs,
         |      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |      CAST(SUM(n_ws_tokens) AS BIGINT) AS total_ws_tokens,
         |      CAST(SUM(n_bpeish_tokens) AS BIGINT) AS total_bpeish_tokens
         |      FROM lp JOIN tok USING (doc_id) GROUP BY 1)
         |SELECT lang, n_docs, n_dup_docs, total_chars, total_ws_tokens,
         |       total_bpeish_tokens,
         |       CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_ratio,
         |       CAST(total_ws_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS ws_tokens_per_doc
         |FROM g""".stripMargin,
    "q_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS tk FROM documents)
         |SELECT doc_id,
         | CAST(length(text) AS BIGINT) AS n_chars,
         | CAST(len(tk) AS BIGINT) AS n_tokens,
         | CAST(len(regexp_extract_all(text, '[.,;:!?''"()]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
         | CAST(len(list_filter(tk, t -> t IN ${stopIn(Text.stopwords("en"))})) AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE) AS stopword_ratio,
         | CAST(COALESCE(list_sum(list_transform(tk, t -> length(t))), 0) AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE) AS mean_token_len
         |FROM t""".stripMargin,
    "q_tokens" -> tokenStatsOracle,
    "q_fingerprint" ->
      "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp FROM documents",
    "q_sql_stopwords" ->
      s"""SELECT doc_id,
         |  len(list_filter(tk, t -> t IN ('the', 'and', 'of', 'to', 'a', 'in'))) AS n_stop,
         |  len(tk) AS n_toks
         |FROM (SELECT doc_id, $toksSql AS tk FROM documents)""".stripMargin
  )
}
