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

/** Driver contract: one `queries` entry (+ DuckDB oracle SQL) per operator
  * from SURVEY.md §2.
  *
  * Oracle-parity rules (SURVEY §6) used throughout:
  *  - money/double sums accumulate in DECIMAL(18,2) (order-independent,
  *    engine-independent) and surface as double;
  *  - ratios are exact int ÷ int double divisions;
  *  - event timestamps compare as epoch-MICROS bigints (Spark: `ts_ns div
  *    1000`; DuckDB truncates nanos to micros on parquet read → `epoch_us`);
  *  - hashes are md5 hex (identical across engines), never engine hash().
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DECIMAL(18,2) accumulator cast — the exact-money-math workhorse. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q_bucketed_join's Hive-bucketed layout: written ONCE per
    * (session, sf-dir) per JVM into one fixed shutdown-hook-deleted temp
    * base (r13 ADVICE — a fresh temp dir per invocation leaked disk
    * across repeated bench/spec runs and relocated the catalog tables via
    * overwrite each time). Memoization is keyed by both the session (the
    * catalog the tables live in) and the data dir (a different SF must
    * rewrite). Returns the on-disk base; the `graft_bkt_*` tables point
    * into it.
    */
  // keyed by session alone, remembering the dir: the catalog names are
  // session-global, so a SECOND sf-dir in the same session must rewrite
  // (tables re-point) rather than serve the stale memo. The names carry
  // a per-SESSION suffix (not just per-JVM, r14 ADVICE: two sessions in
  // one JVM sharing a metastore each took the memo miss under a shared
  // per-JVM suffix and relocated each other's tables) so no pair of
  // sessions or JVMs sharing a warehouse ever writes the same name.
  private val bucketedBases =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, (String, String)]()
  private val bktSuffixes =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  private def bktTable(s: SparkSession, side: String): String = {
    val sfx = bktSuffixes.computeIfAbsent(s, _ =>
      java.util.UUID.randomUUID().toString.replace("-", "").take(8))
    s"graft_bkt_${side}_$sfx"
  }
  private lazy val bucketedTmpRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_bucket")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      } catch { case _: Throwable => () }))
    p
  }
  private def bucketedFixture(s: SparkSession, dir: String): String =
    bucketedBases.synchronized {
      Option(bucketedBases.get(s)).filter(_._1 == dir).map(_._2).getOrElse {
        val base = java.nio.file.Files
          .createTempDirectory(bucketedTmpRoot, "sf").toString
        Sinks.writeBucketed(
          T(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          bktTable(s, "orders"), s"$base/orders", Seq("o_orderkey"), buckets = 8,
          sortCols = Seq("o_orderkey"))
        Sinks.writeBucketed(
          T(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
          bktTable(s, "lineitem"), s"$base/lineitem", Seq("l_orderkey"),
          buckets = 8, sortCols = Seq("l_orderkey"))
        bucketedBases.put(s, (dir, base))
        base
      }
    }

  /** Seed a file-based embedded Derby database on the DRIVER from a
    * fixture frame, shut it down cleanly, and archive it into a jar —
    * returning the `jdbc:derby:jar:(path)db` URL + driver option map.
    *
    * The jar subprotocol is Derby's read-only-media form: booting from an
    * archive takes NO db lock, so EVERY executor JVM opens its own
    * read-only instance of the same database concurrently — the property
    * that makes the partitioned JDBC READ queries green under
    * `local-cluster` (in-memory Derby is per-JVM by definition, a
    * file-based embedded db write-locks to one JVM, and no Derby network
    * server ships in this environment — derbynet.jar is absent; verified
    * r12 with two concurrent reader JVMs over one archive).
    *
    * The driver-side collect is FIXTURE-sized by construction (these
    * queries seed thousands of rows, not corpora) and is the seed, not
    * the operator under test — the operator is Spark's executor-side
    * partitioned/pushdown JDBC read. `ddl` gives (name, derbyType) per
    * column in the frame's column order; names are quoted
    * (case-preserved) in the DDL, matching what Spark's own JDBC writer
    * does.
    */
  /** Derby ENGINE properties — read ONCE when the embedded engine boots
    * (the first getConnection in this JVM), then frozen. Every Derby entry
    * point calls this before connecting, so whichever query boots the
    * engine first (the in-memory q_jdbc_roundtrip or a jar fixture) boots
    * it with BOTH properties — setting them per-fixture was query-order
    * dependent: an earlier in-memory boot would silently discard the
    * tempDirectory a later jar fixture needs.
    *
    * derby.storage.tempDirectory matters for read-only/jar databases:
    * Derby's default puts temp spill files inside the database directory —
    * the unwritable jar — so any in-database sort/aggregate that outgrows
    * the in-memory buffer fails with SQLException at larger SFs.
    */
  private lazy val derbyEngineProps: Unit = {
    System.setProperty("derby.stream.error.path", "/tmp/derby.log")
    System.setProperty("derby.storage.tempDirectory",
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
  }

  private def derbyJarFixture(df: DataFrame, tag: String, table: String,
                              ddl: Seq[(String, String)]): (String, Map[String, String]) = {
    derbyEngineProps
    val base = java.nio.file.Files.createTempDirectory(s"graft_derby_$tag").toString
    val db = s"$base/db"
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      // one transaction: autocommit-per-batch write-ahead logging made the
      // seed the slowest bench row (54 s for 150k rows at sf0.1)
      conn.setAutoCommit(false)
      val colsSql = ddl.map { case (n, t) => s""""$n" $t""" }.mkString(", ")
      conn.createStatement().execute(s"CREATE TABLE $table ($colsSql)")
      val numericOnly = ddl.forall { case (_, t) =>
        Set("BIGINT", "INTEGER", "DOUBLE")(t.toUpperCase) }
      if (numericOnly) {
        // numeric fixtures go through Derby's BULK IMPORT (~5× the insert
        // path: 2.5 s vs 13 s for the 105k-row orders slice) — Long/Double
        // toString round-trips exactly and Derby parses it back bit-equal;
        // a NULL cell writes as the empty field, which IMPORT_TABLE loads
        // as SQL NULL for non-character columns (numericOnly guarantees
        // that)
        val csv = java.nio.file.Files.createTempFile("graft_derby_seed", ".csv")
        val w = new java.io.PrintWriter(java.nio.file.Files.newBufferedWriter(csv))
        try df.collect().foreach { r =>
          w.println(ddl.indices.map(i =>
            if (r.isNullAt(i)) "" else r.get(i).toString).mkString(","))
        } finally w.close()
        val cs = conn.prepareCall(
          "CALL SYSCS_UTIL.SYSCS_IMPORT_TABLE(null, ?, ?, null, null, 'UTF-8', 0)")
        cs.setString(1, table.toUpperCase) // created unquoted → stored upper
        cs.setString(2, csv.toString)
        cs.execute()
        java.nio.file.Files.delete(csv)
      } else {
        // mixed types (strings, blobs) batch-insert — those fixtures are
        // small (customer-sized) by construction
        val ps = conn.prepareStatement(
          s"INSERT INTO $table VALUES (${ddl.map(_ => "?").mkString(", ")})")
        // NULL cells need a TYPED setNull — Derby rejects a bare
        // setObject(i, null)
        def sqlType(t: String): Int = t.toUpperCase.takeWhile(_ != '(') match {
          case "BIGINT"  => java.sql.Types.BIGINT
          case "INTEGER" => java.sql.Types.INTEGER
          case "DOUBLE"  => java.sql.Types.DOUBLE
          case "BLOB"    => java.sql.Types.BLOB
          case _         => java.sql.Types.VARCHAR
        }
        var pending = 0
        df.collect().foreach { r =>
          ddl.indices.foreach { i =>
            if (r.isNullAt(i)) ps.setNull(i + 1, sqlType(ddl(i)._2))
            else r.get(i) match {
              case b: Array[Byte] => ps.setBytes(i + 1, b)
              case v              => ps.setObject(i + 1, v)
            }
          }
          ps.addBatch()
          pending += 1
          if (pending == 5000) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) ps.executeBatch()
      }
      conn.commit()
    } finally conn.close()
    // clean engine shutdown releases the lock and flushes the store;
    // Derby SIGNALS success with SQLState 08006, so the catch is the
    // expected path
    try { java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true"); () }
    catch { case _: java.sql.SQLException => () }
    val jarPath = s"$base/db.jar"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(jarPath))
    def add(f: java.io.File, prefix: String): Unit =
      if (f.isDirectory)
        f.listFiles.sortBy(_.getName)
          .foreach(c => add(c, s"$prefix${f.getName}/"))
      else if (!f.getName.endsWith(".lck")) { // stale locks stay out
        // STORED (uncompressed) entries: Derby page reads over a DEFLATED
        // entry re-decompress from the entry start per access — measured
        // 11 s vs 0.8 s for one aggregate over the 105k-row fixture
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val e = new java.util.zip.ZipEntry(s"$prefix${f.getName}")
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        val crc = new java.util.zip.CRC32()
        crc.update(bytes)
        e.setCrc(crc.getValue)
        zos.putNextEntry(e)
        zos.write(bytes)
        zos.closeEntry()
      }
    add(new java.io.File(db), "")
    zos.close()
    (s"jdbc:derby:jar:($jarPath)db",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
  }

  /** Scope a smaller shuffle-partition count around a stateful streaming
    * run. State-store instances (and their per-micro-batch delta/snapshot
    * files) are pinned to `spark.sql.shuffle.partitions` at stream start
    * and are never AQE-coalesced — unlike batch shuffles — so a bounded
    * replay at 32 partitions pays 32 stores × batches of checkpoint
    * bookkeeping for kilobytes of actual state. Sizing stores to state
    * volume is the standard production knob; these bounded tests size to
    * the data. Restores the previous value once the stream finishes.
    */
  private def withStreamShuffle[T](s: SparkSession, n: Int = 4)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Flagship query on sf=0.001: revenue per nation (broadcast dims). */
  def entry(spark: SparkSession): DataFrame =
    revenuePerNation(spark, "/root/testdata/sf0.001")

  /** lineitem ⋈ orders ⋈ customer ⋈ (broadcast) nation ⋈ (broadcast) region;
    * decimal-exact revenue. The dims are broadcast so the only shuffles are
    * the two fact-side join keys + the final group-by.
    */
  private def revenuePerNation(s: SparkSession, dir: String): DataFrame = {
    val li = T(s, dir, "lineitem"); val o = T(s, dir, "orders")
    val c = T(s, dir, "customer"); val n = T(s, dir, "nation"); val r = T(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count_distinct(col("o_orderkey")).as("n_orders"))
  }

  /** Nested order document used by the TreeHorn queries: customer info and
    * line items folded under a `payload` struct.
    */
  private def orderDoc(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders"); val c = T(s, dir, "customer")
    val li = T(s, dir, "lineitem")
    val nested = li.groupBy("l_orderkey")
      .agg(collect_list(struct(col("l_linenumber"), col("l_quantity"),
        col("l_partkey"))).as("lines"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(nested, o("o_orderkey") === nested("l_orderkey"))
      .select(col("o_orderkey"),
        struct(struct(col("c_custkey"), col("c_name")).as("cust_info"),
          col("lines")).as("payload"))
  }

  /** Synthesized HTML page wrapping each document — the fixture for the G55
    * extraction queries (q_html_text / q_html_stats). Exercises: an
    * uppercase multiline `<SCRIPT>` whose body contains a bare `<` (proves
    * element-content stripping runs BEFORE tag stripping), a `<style>`
    * block, a multiline comment, entities including the `&amp;lt;`
    * no-double-decode case, a multiline `<a` tag, and whitespace runs.
    * Both engines build the identical string from the SAME literal
    * fragments (`htmlPre`/`htmlMid`/`htmlPost` feed the Column AND the
    * oracle SQL), so the extraction chain is the only thing under test.
    */
  private val htmlPre = "<html><head><title>t</title><SCRIPT type=\"text/javascript\">\nvar n = 1;\nif (n < 2) { n = 2; }\n</SCRIPT><style>\np { color: red; }\n</style></head>\n<body><h1>Doc &#39;"
  private val htmlMid = "&#39;</h1><!-- crawl\nartifact --><p>"
  private val htmlPost = "</p>\n<p>a &amp;&amp; b &lt;tag&gt; &quot;q&quot;&nbsp;end &amp;lt;raw&amp;gt;</p><a href=\"http://x/1\">l1</a> <a\nhref=\"/y\">l2</a></body></html>"

  private def syntheticHtml: Column =
    concat(lit(htmlPre), col("doc_id").cast(StringType),
      lit(htmlMid), col("text"), lit(htmlPost))

  /** SQL single-quoted literal (quote-doubled). */
  private def sqlQ(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Non-Latin salts for q_script_stats: (doc_id modulus, fragment,
    * repeat count). The oracle rebuilds each fragment from code points via
    * chr() — source-encoding-independent on the SQL side.
    */
  private val scriptSalts: Seq[(Int, String, Int)] = Seq(
    (3, "Привет мир", 1),
    (5, "Γειά σου", 1),
    (7, "مرحبا", 1),
    (11, "好世界", 200)) // 600 CJK chars — outweighs any doc's Latin body

  /** The salted-text expression in DuckDB SQL — same fragments. */
  private def scriptSaltSql: String = {
    def chrExpr(s: String): String =
      s.map(c => s"chr(${c.toInt})").mkString("(", " || ", ")")
    "text || " + scriptSalts.map { case (m, frag, times) =>
      val f = if (times == 1) chrExpr(frag)
              else s"repeat(${chrExpr(frag)}, $times)"
      s"CASE WHEN doc_id % $m = 0 THEN chr(32) || $f ELSE '' END"
    }.mkString(" || ")
  }

  /** q_script_stats oracle — counts and the argmax CASE are both generated
    * from [[graft.functions.Text.scripts]] (name-ascending), so the SQL
    * can't drift from the Column API's ranges or tie-break.
    */
  private def scriptStatsOracle: String = {
    val names = Text.scripts.map(_._1)
    val defs = Text.scripts.map { case (n, re) =>
      s"CAST(len(regexp_extract_all(s2, '$re')) AS BIGINT) AS n_$n"
    }.mkString(",\n ")
    val arms = names.init.zipWithIndex.map { case (n, i) =>
      val rest = names.drop(i + 1)
      s"WHEN ${rest.map(r => s"n_$n >= n_$r").mkString(" AND ")} THEN '$n'"
    }.mkString("\n  ")
    s"""WITH t AS (SELECT doc_id, $scriptSaltSql AS s2 FROM documents),
       |sc AS (SELECT doc_id, $defs FROM t)
       |SELECT doc_id, ${names.map("n_" + _).mkString(", ")}, CASE
       |  WHEN greatest(${names.map("n_" + _).mkString(", ")}) = 0 THEN 'none'
       |  $arms
       |  ELSE '${names.last}' END AS main_script FROM sc""".stripMargin
  }

  /** Query term-sets for q_bm25_many / q_stream_bm25probe — one Scala
    * definition feeds the Spark frame AND the oracle's VALUES list.
    */
  private val bm25ManyQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "vector", "customer"),
    1L -> Seq("spark", "window"),
    2L -> Seq("merge", "batch"))

  /** Multi-query BM25 oracle: the bm25CtesSql scoring chain per (query,
    * doc) with the term sets from [[bm25ManyQueries]] as a VALUES list.
    * Carries the df-ceiling keep CTE at 990‰ — the r12 default
    * [[graft.similarity.Search.bm25ManyFromIndex]] now applies — so both
    * engines drop the same stop terms at any scale factor.
    */
  private def bm25ManyOracle: String = {
    val values = bm25ManyQueries.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid, '$t')")
    }.mkString(", ")
    val allTerms = bm25ManyQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |q AS (SELECT CAST(query_id AS BIGINT) AS query_id, term
       |      FROM (VALUES $values) v(query_id, term)),
       |tstats AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, term, COUNT(*) AS tf
       |           FROM (SELECT doc_id, tk, unnest(tk) AS term FROM toks)
       |           WHERE term IN ($allTerms)
       |           GROUP BY 1, 2, 3),
       |corp AS (SELECT COUNT(*) AS n, SUM(CAST(len(tk) AS BIGINT)) AS sumdl FROM toks),
       |dfreq0 AS (SELECT term, COUNT(*) AS df FROM tstats GROUP BY 1),
       |dfreq AS (SELECT f0.term, f0.df FROM dfreq0 f0 CROSS JOIN corp c0
       |          WHERE f0.df * 1000 <= 990 * c0.n),
       |scored AS (SELECT q.query_id, t.doc_id,
       |    CAST(ln(1 + (c.n - f.df + 0.5) / (f.df + 0.5)) *
       |         ((t.tf * (CAST(1.2 AS DOUBLE) + 1)) /
       |          (t.tf + CAST(1.2 AS DOUBLE) *
       |           (1 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (t.dl / (c.sumdl / c.n)))))
       |      AS DECIMAL(18,6)) AS s
       |  FROM tstats t JOIN q USING (term) JOIN dfreq f USING (term) CROSS JOIN corp c),
       |sc AS (SELECT query_id, doc_id, CAST(SUM(s) AS DOUBLE) AS score
       |       FROM scored GROUP BY 1, 2)
       |SELECT query_id, doc_id, score, rank FROM (
       |  SELECT query_id, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc) WHERE rank <= 5""".stripMargin
  }

  /** BM25 scored-and-cut CTEs ending in `bmtop(doc_id, score)` — shared by
    * q_bm25 and the RRF hybrid (per-term scores quantize to DECIMAL(18,6)
    * before the per-doc sum; see [[graft.similarity.Search]] scaladoc).
    * `maxDfPermille < 1000` inserts the df-ceiling keep CTE — the SAME
    * `df·1000 <= ceiling·n` predicate the guarded index probe applies to
    * its stored terms/ table (990 is [[graft.similarity.Search
    * .bm25FromIndex]]'s r12 default, so q_bm25_index's oracle carries it
    * too; the direct-scan q_bm25 stays unguarded, as bm25TopK is).
    */
  private def bm25CtesSql: String = bm25CtesSql(1000)
  private def bm25CtesSql(maxDfPermille: Int): String = {
    val dfSrc =
      if (maxDfPermille >= 1000) "dfreq"
      else
        s"""(SELECT f0.term, f0.df FROM dfreq f0 CROSS JOIN corp c0
           |        WHERE f0.df * 1000 <= $maxDfPermille * c0.n)""".stripMargin
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |tstats AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, term, COUNT(*) AS tf
       |           FROM (SELECT doc_id, tk, unnest(tk) AS term FROM toks)
       |           WHERE term IN ('spark', 'vector', 'customer')
       |           GROUP BY 1, 2, 3),
       |corp AS (SELECT COUNT(*) AS n, SUM(CAST(len(tk) AS BIGINT)) AS sumdl FROM toks),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tstats GROUP BY 1),
       |scored AS (SELECT t.doc_id,
       |    CAST(ln(1 + (c.n - f.df + 0.5) / (f.df + 0.5)) *
       |         ((t.tf * (CAST(1.2 AS DOUBLE) + 1)) /
       |          (t.tf + CAST(1.2 AS DOUBLE) *
       |           (1 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (t.dl / (c.sumdl / c.n)))))
       |      AS DECIMAL(18,6)) AS s
       |  FROM tstats t JOIN $dfSrc f USING (term) CROSS JOIN corp c),
       |bmtop AS (SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS score
       |          FROM scored GROUP BY doc_id
       |          ORDER BY score DESC, doc_id LIMIT 10)""".stripMargin
  }

  /** Heterogeneous JSON messages synthesized from `events` for the
    * JSON-Schema gate (q_json_schema) — ONE SQL fragment evaluated by
    * BOTH engines (Spark `expr` and DuckDB share the CASE/||/CAST
    * syntax), so the validated input cannot drift between them. Five
    * shapes by event_id % 5 (valid — incl. an in-enum integer `priority`
    * and a deep well-formed `items` element (nested `dims` array +
    * nested `meta` object + the properties-less required `lot`) /
    * string-typed value + an integer-element `tags` array (r12
    * per-ELEMENT items check) + an out-of-enum integer priority (r13
    * typed enum) + an element whose `sku` is a string, whose `dims`
    * trips ALL THREE array-of-arrays checks (r13: `maxitems:` +
    * element `type:` + element `min:$.items[].dims[]`) and whose
    * `meta.w` is a string (r13 two-level `type:$.items[].meta.w`) /
    * missing required user.id + an element missing `sku`, `lot` AND
    * `meta.w` with a bound-violating `qty` (r13 element-field `min`) /
    * enum-violating type + a STRING priority + an EMPTY items array
    * (`minitems:$.items`) / missing required value + a `name` that
    * fails the r13 `pattern`), with every 7th message malformed
    * outright. r14 `additionalProperties: false` coverage at all three
    * depths: shape 1's `meta.unit` (array-element depth,
    * `extra:$.items[].meta`), shape 2's `user.role` (nested,
    * `extra:$.user`), shape 4's root `_debug` (`extra:$` — and r15
    * `propname:$`, the underscore failing the root propertyNames
    * pattern); r15 `contains` coverage at all three depths: shape 1's
    * tags hold TWO `^(b|ok)` matches (maxContains 1 → `contains:$.tags`)
    * where shape 3's hold none (minContains → same tag), shape 2's
    * items hold no `sku`-bearing element (`contains:$.items`), and
    * shape 1's dims hold no integer in [1,5]
    * (`contains:$.items[].dims`, element depth); r15 `propertyNames`
    * likewise: shape 1's `meta.unit` key fails `^[a-z]$`
    * (`propname:$.items[].meta`), shape 2's `user.role` key fails
    * `^(id|name)$` (`propname:$.user`); r14
    * `uniqueItems` on tags — shape 1's repeated "ok" fires
    * `unique:$.tags` (its integer 3 stays the element type check's
    * business), and shape 3's `["a", null, null]` pins BOTH the r14
    * null-element laws through the DuckDB gate every round: two JSON
    * nulls are uniqueItems duplicates AND each null element fails the
    * string element type check (the `json_extract('$[*]')`
    * null-folding divergence the r14 null-preserving replay closes).
    * Shape 2's `"priority": null` exercises the r14 UNION type
    * (`["integer", "null"]` — the nullable idiom): type passes on
    * null, the enum/multipleOf value checks stay typed-guarded. The valid shape's first tag is the ASTRAL-bearing string
    * 𝒳abcdefg (8 code points — exactly the items maxLength boundary;
    * spelled as JSON \u escapes so the fixture file itself is
    * locale-proof): valid under correct UTF-8 handling, 11 "chars"
    * under the ASCII-locale variant mangling r13 found and fixed
    * (build.sbt file.encoding) — a locale regression now FAILS the
    * driver's DuckDB gate instead of lurking.
    */
  private val jsonSynthSql: String =
    """CASE WHEN event_id % 7 = 0 THEN '{broken'
      | ELSE CASE CAST(event_id % 5 AS INT)
      |  WHEN 0 THEN '{"user": {"id": ' || CAST(user_id AS STRING) || ', "name": "u' || CAST(user_id AS STRING) || '"}, "type": "' || event_type || '", "value": ' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || ', "tags": ["\ud835\udcb3abcdefg", "b"], "priority": 2, "items": [{"sku": 5, "qty": 2, "lot": 1, "dims": [1, 2], "meta": {"w": 1.5}}]}'
      |  WHEN 1 THEN '{"user": {"id": ' || CAST(user_id AS STRING) || '}, "type": "' || event_type || '", "value": "' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || '", "tags": ["ok", 3, "ok"], "priority": 9, "items": [{"sku": "x", "qty": 1, "lot": 2, "dims": [9, -2, "x"], "meta": {"w": "heavy", "unit": "kg"}}]}'
      |  WHEN 2 THEN '{"user": {"name": "u' || CAST(user_id AS STRING) || '", "role": "admin"}, "type": "' || event_type || '", "value": ' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || ', "priority": null, "items": [{"qty": 0, "meta": {}}]}'
      |  WHEN 3 THEN '{"user": {"id": ' || CAST(user_id AS STRING) || '}, "type": "badtype", "value": ' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || ', "tags": ["a", null, null], "priority": "high", "items": []}'
      |  ELSE '{"user": {"id": ' || CAST(user_id AS STRING) || ', "name": "v' || CAST(user_id AS STRING) || '"}, "type": "' || event_type || '", "_debug": true}'
      | END END""".stripMargin.replace("\n", " ")

  /** The q_json_schema demo schema (types + required + enum — incl. the
    * r13 TYPED integer enum and `multipleOf` (priority 9 fails BOTH:
    * 9 ∉ [1,2,3] and 9 % 2 ≠ 0) — + nested object + array with
    * per-ELEMENT items validation (r12) + the r13 FULL element
    * recursion: arrays of arrays (`dims` with its own items +
    * maxItems), two-level element objects (`meta.w`), element-field
    * bounds (`qty` minimum), a properties-less required (`lot`), and
    * the r13 `pattern` on user.name — the supported subset exercised
    * end to end). r14: `additionalProperties: false` closes the root,
    * the nested `user`, and the array-element `meta` objects. r15:
    * `contains`/`minContains`/`maxContains` at all three depths (tags —
    * both count bounds; items — an object-satisfaction subschema via
    * `required`; dims — a three-term conjunction at element depth) and
    * `propertyNames` patterns on the root, the nested `user`, and the
    * element-depth `meta`.
    */
  private val jsonSchemaDemo: String =
    """{"type": "object", "required": ["user", "type", "value"],
      | "additionalProperties": false,
      | "propertyNames": {"pattern": "^[a-z]+$"},
      | "dependentRequired": {"priority": ["tags"]},
      | "$defs": {"money": {"type": "number", "minimum": 0, "maximum": 15}},
      | "properties": {
      |  "user": {"type": "object", "required": ["id"],
      |           "additionalProperties": false,
      |           "propertyNames": {"pattern": "^(id|name)$"},
      |           "properties": {"id": {"type": "integer", "minimum": 0},
      |                          "name": {"type": "string", "minLength": 1,
      |                                   "maxLength": 64,
      |                                   "pattern": "^u[0-9]+$"}}},
      |  "type": {"type": "string",
      |           "enum": ["click", "view", "purchase", "error", "signup"]},
      |  "value": {"$ref": "#/$defs/money"},
      |  "tags": {"type": "array", "maxItems": 8, "uniqueItems": true,
      |           "contains": {"type": "string", "pattern": "^(b|ok)"},
      |           "minContains": 1, "maxContains": 1,
      |           "items": {"type": "string", "minLength": 1,
      |                     "maxLength": 8}},
      |  "priority": {"type": ["integer", "null"], "enum": [1, 2, 3],
      |               "multipleOf": 2},
      |  "items": {"type": "array", "minItems": 1,
      |            "contains": {"required": ["sku"]},
      |            "items": {"type": "object", "required": ["sku", "lot"],
      |                      "properties": {
      |                        "sku": {"type": "integer"},
      |                        "qty": {"type": "integer", "minimum": 1},
      |                        "dims": {"type": "array", "maxItems": 2,
      |                                 "contains": {"type": "integer",
      |                                              "minimum": 1,
      |                                              "maximum": 5},
      |                                 "items": {"type": "integer",
      |                                           "minimum": 0}},
      |                        "meta": {"type": "object", "required": ["w"],
      |                                 "additionalProperties": false,
      |                                 "propertyNames": {"pattern": "^[a-z]$"},
      |                                 "minProperties": 1,
      |                                 "properties": {
      |                                   "w": {"type": "number"}}}}}}}}""".stripMargin

  /** The [[syntheticHtml]] expression in DuckDB SQL — same fragments. */
  private def htmlExprSql: String =
    s"${sqlQ(htmlPre)} || CAST(doc_id AS VARCHAR) || ${sqlQ(htmlMid)} || text || ${sqlQ(htmlPost)}"

  /** DuckDB replay of [[graft.functions.Text.htmlToText]] over a column
    * named `html` — identical regex chain (inline flags, shared syntax) and
    * the SAME entity list ([[graft.functions.Text.htmlEntities]] renders to
    * the replace chain, so the two implementations cannot drift).
    */
  private def htmlCleanSql: String = {
    val noScript = "regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '(?s)<[^>]+>', ' ', 'g')"
    val decoded = Text.htmlEntities.foldLeft(noTags) { case (acc, (f, t)) =>
      s"replace($acc, ${sqlQ(f)}, ${sqlQ(t)})"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
  }

  // ---------------------------------------------------------------------
  // queries — one per SURVEY §2 row
  // ---------------------------------------------------------------------

  /** The shared lexical retrieval leg of both hybrid queries
    * (q_rrf_hybrid, q_hybrid_rerank): BM25 top-10 on the fixed term set,
    * ranked (score DESC, id ASC) under query_id 0 — ONE spelling, because
    * both queries' bit-parity with the shared bm25CtesSql oracle hangs on
    * this exact ranking (the maxSimCol single-sourcing rule).
    */
  private def lexTopKRanked(docs: DataFrame): DataFrame =
    Search.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "vector", "customer"), k = 10)
      .select(lit(0L).as("query_id"), col("id"), col("score"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("id").asc)).cast(LongType))
      .select("query_id", "id", "rank")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- sources (A4/A5/A6) ----
    "q_counter" -> ((s, _) => Sources.counter(s, 0, 1000)),
    "q_sequence" -> ((s, _) => Sources.sequence(s, Seq("a", "b", "c"), 2)),
    "q_constant" -> ((s, _) => Sources.constant(s, Map("k" -> "v"), 3)),

    // ---- row-level transforms (B1-B8) ----
    "q_insert_data" -> ((s, dir) =>
      Ops.insertData(T(s, dir, "nation"), Map("source" -> "graft", "version" -> 1L))),
    "q_regex" -> ((s, dir) =>
      Ops.substituteRegex(T(s, dir, "part"), "p_name", " ", "_", Some("p_name_u"))
        .select("p_partkey", "p_name", "p_name_u")),
    "q_remap" -> ((s, dir) =>
      Ops.remap(T(s, dir, "customer"),
        Seq("c_custkey" -> "id", "c_name" -> "name", "c_mktsegment" -> "segment"))),
    // JSON-string column → typed struct → field (reference messages are
    // parsed JSON dicts); explicit schema, codegen from_json
    "q_json" -> ((s, dir) =>
      Ops.parseJson(T(s, dir, "events"), "props", "k INT")
        .select(col("event_id"), col("parsed.k").as("k"))),
    // JSON-Schema validation gate (the reference JsonValidator experiment,
    // working form): heterogeneous synthesized messages validated against
    // a nested schema (types/required/enum/array) — the DuckDB replay is
    // GENERATED from the same compiled schema walk, so the check lists
    // cannot drift (JsonSchemaGate.oracleChecksSql)
    "q_json_schema" -> ((s, dir) =>
      graft.schema.JsonSchemaGate.validate(
          T(s, dir, "events").withColumn("raw", expr(jsonSynthSql)),
          "raw", jsonSchemaDemo, parsedCol = None)
        .select(col("event_id"), col("is_valid"), col("violations"))),
    // STREAMING twin: the gate is a stateless per-row projection, so
    // validating each micro-batch appends exactly the batch answer
    // regardless of how the drain splits files (shares q_json_schema's
    // oracle) — the ingest-side schema firewall a crawl pipeline runs
    // BEFORE anything stateful sees a malformed message
    "q_stream_jsonschema" -> ((s, dir) => withStreamShuffle(s) {
      val msgs = T(s, dir, "events").select(col("event_id"),
        expr(jsonSynthSql).as("raw"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_js").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      // 8 files drained 4 per trigger: the same 2-micro-batch cadence as
      // before, but each batch's validate runs over FOUR file splits —
      // the engine's parallel shape (a real crawl batch is many files),
      // not a 1-file-per-batch fixture artifact (r14; the stateless-
      // projection law means any split appends the same rows, so the
      // oracle is untouched)
      msgs.repartition(8).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(msgs.schema.toDDL),
        maxFilesPerTrigger = 4)
      val run = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true) { (batch, id) =>
        if (!batch.isEmpty)
          graft.schema.JsonSchemaGate.validate(batch, "raw", jsonSchemaDemo,
              parsedCol = None)
            .select(col("event_id"), col("is_valid"), col("violations"))
            .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      run.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
    }),
    "q_explode" -> ((s, dir) =>
      Ops.serialize(
        T(s, dir, "documents").withColumn("toks", Text.tokens(col("text"))),
        "toks", "token").select("doc_id", "token")),
    "q_filter" -> ((s, dir) => {
      val ev = Ops.filterTest(
        Ops.filterTest(T(s, dir, "events"), "event_type", Ops.KeyExists),
        "value", Ops.ValueIsNotNone)
      ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "value")
    }),
    "q_sample" -> ((s, dir) => Ops.modSample(T(s, dir, "documents"), "doc_id", 10)),
    "q_apply" -> ((s, dir) =>
      Ops.applyExpr(T(s, dir, "lineitem"), "margin",
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType))
        .select("l_orderkey", "l_linenumber", "margin")),

    // ---- aggregation & stateful (C1-C7) ----
    "q_collect" -> ((s, dir) =>
      Ops.aggregateValues(T(s, dir, "documents"), Seq("lang"), "doc_id", "ids")
        .select(col("lang"),
          array_join(transform(col("ids"), _.cast(StringType)), ",").as("doc_ids"))),
    "q_agg" -> ((s, dir) =>
      Ops.groupAgg(T(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"), Seq(
        Ops.moneySum(col("l_quantity")).as("sum_qty"),
        Ops.moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("n_rows"),
        Ops.moneyAvg(col("l_quantity")).as("avg_qty")))),
    "q_batch" -> ((s, dir) =>
      Ops.batchRows(T(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber"), 100)
        .select("l_orderkey", "l_linenumber", "batch_id")),
    "q_window" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(expr("(ts_ns div 1000) div 60000000").as("minute_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Ops.moneySum(col("value")).as("sum_value"))),
    // sliding windows: 10-minute window every 5 minutes — each event lands
    // in exactly duration/slide windows (Spark `window(ts, dur, slide)`)
    "q_window_sliding" -> ((s, dir) =>
      Ops.timeWindowAgg(
          T(s, dir, "events").withColumn("ts", timestamp_micros(expr("ts_ns div 1000"))),
          "ts", "10 minutes",
          Seq("event_type"),
          Seq(count(lit(1)).as("n_events"), Ops.moneySum(col("value")).as("sum_value")),
          slide = Some("5 minutes"))
        .select(unix_micros(col("window.start")).as("win_us"), col("event_type"),
          col("n_events"), col("sum_value"))),
    "q_join_window" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), expr("ts_ns div 1000").as("p_us"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id"), expr("ts_ns div 1000").as("e_us"))
      Ops.intervalJoin(p, e, Seq("user_id"), col("p_us"), col("e_us"),
          lit(-300000000L), lit(300000000L))
        .select(col("p_id"), col("e_id"), col("__ij_l.user_id").as("user_id"),
          (col("e_us") - col("p_us")).as("dt_us"))
    }),
    // As-of join: each click pairs with the user's latest purchase at or
    // before it. Right side pre-aggregated to unique (user_id, ts) so the
    // union+window shape is deterministic (see Ops.asOfJoin).
    "q_asof" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("l_us"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), expr("ts_ns div 1000").as("r_us"))
        .agg(max(col("value")).as("r_value"))
      Ops.asOfJoin(l, r, Seq("user_id"), "l_us", "r_us", Seq("r_value"))
        .select("event_id", "user_id", "l_us", "r_us", "r_value")
    }),
    // hot-key as-of: same join, shuffled on (key, hour-bucket) with the
    // carry-in pre-pass — shares q_asof's ASOF oracle, proving the bucketed
    // path bit-equal to the key-partitioned one
    "q_asof_bucketed" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("l_us"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), expr("ts_ns div 1000").as("r_us"))
        .agg(max(col("value")).as("r_value"))
      Ops.asOfJoinBucketed(l, r, Seq("user_id"), "l_us", "r_us", Seq("r_value"),
          bucketWidth = 3600L * 1000000L)
        .select("event_id", "user_id", "l_us", "r_us", "r_value")
    }),
    // as-of with NULLABLE payloads: every output value must come from the
    // SAME matched right row — a NULL in one payload column stays NULL
    // (DuckDB ASOF semantics), never back-filled from an older row
    "q_asof_nulls" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("l_us"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), expr("ts_ns div 1000").as("r_us"))
        .agg(max(col("value")).as("__mx"), count(lit(1)).as("r_n"))
        .select(col("user_id"), col("r_us"),
          when(col("__mx") >= lit(10.0), col("__mx")).as("r_value"), col("r_n"))
      Ops.asOfJoin(l, r, Seq("user_id"), "l_us", "r_us", Seq("r_value", "r_n"))
        .select("event_id", "user_id", "l_us", "r_us", "r_value", "r_n")
    }),
    "q_rowstats" -> ((s, dir) => Ops.rowStats(T(s, dir, "customer"))),
    // C6 string→typed inference: cast customer to all-strings (plus synthetic
    // bool/date/timestamp string columns), recover the types via SchemaInfer,
    // and emit the re-typed values — the oracle reads the ORIGINAL typed
    // columns, so every wrong inference shows up as a schema/hash mismatch.
    "q_schema_infer" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val strings = c.select(
        col("c_custkey").cast(StringType).as("custkey"),
        col("c_name").as("name"),
        col("c_nationkey").cast(StringType).as("nationkey"),
        col("c_acctbal").cast(StringType).as("acctbal"),
        when(col("c_custkey") % 2 === 0, "true").otherwise("false").as("vip"),
        date_add(lit("2020-01-01").cast(DateType), (col("c_custkey") % 365).cast(IntegerType))
          .cast(StringType).as("signup"),
        timestamp_seconds(lit(1577836800L) + col("c_custkey") * 60)
          .cast(StringType).as("seen"))
      val typed = graft.schema.SchemaInfer.inferAndApply(strings)
      // dates/timestamps surface as epoch days/micros: unix_date/unix_micros
      // only typecheck on real DATE/TIMESTAMP inputs, and integer output
      // sidesteps engines' differing date reprs
      typed.select(col("custkey"), col("name"), col("nationkey"), col("acctbal"),
        col("vip"), unix_date(col("signup")).cast(LongType).as("signup_days"),
        unix_micros(col("seen")).as("seen_us"))
    }),
    "q_join" -> ((s, dir) => revenuePerNation(s, dir)),
    // HIVE-BUCKETED co-located join (r13, D5): both fact sides written
    // bucketBy(8, join key) with matching counts, then the equi-join
    // plans with ZERO exchanges under the join (the bucketed scans
    // already satisfy the SMJ's partitioning requirement — the total
    // budget's 1 exchange is the groupBy AFTER it; PlanBudgetSpec pins
    // it, LayoutSpec pins the exchange-free join subtree). At 100 TB
    // this converts the recurring fact⋈fact join's two corpus shuffles
    // per run into one bucketed write per ingest. Correctness never
    // depends on the layout — the oracle is the plain join
    "q_bucketed_join" -> ((s, dir) => {
      // one fixed per-JVM temp base (shutdown-hook-deleted) and ONE write
      // per (session, sf-dir): repeated invocations in one JVM — bench
      // iterations, spec re-runs — reuse the layout instead of accumulating
      // a fresh temp dir + catalog relocation each time (r13 ADVICE)
      bucketedFixture(s, dir)
      val o = s.table(bktTable(s, "orders"))
      val l = s.table(bktTable(s, "lineitem"))
      // MERGE hint: pin the sort-merge join the planner picks when both
      // fact sides exceed the broadcast threshold (the regime bucketing
      // exists for) — at bench scale orders would otherwise broadcast
      // and the layout would sit unexercised
      o.join(l.hint("merge"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(Ops.moneySum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
    }),
    "q_topk" -> ((s, dir) =>
      Ops.topK(T(s, dir, "orders"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),
    "q_window_rank" -> ((s, dir) =>
      Ops.windowRank(T(s, dir, "customer"), Seq("c_nationkey"),
          Seq(col("c_acctbal").desc, col("c_custkey").asc), 3)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          col("rnk").cast(LongType).as("rnk"))),
    // hierarchical aggregates: rollup/cube plan as ONE Expand + aggregate
    // (not N re-scans) — subtotals and grand totals in a single pass
    "q_rollup" -> ((s, dir) =>
      T(s, dir, "orders").rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))),
    "q_cube" -> ((s, dir) =>
      T(s, dir, "orders").cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))),

    // data-quality gate: all expectations in ONE aggregate scan
    "q_quality_checks" -> ((s, dir) =>
      Ops.qualityChecks(T(s, dir, "events"),
        Seq(
          "value_nonneg" -> (col("value") >= 0),
          "etype_known" -> col("event_type").isin(
            "click", "view", "purchase", "error", "signup"),
          "user_present" -> col("user_id").isNotNull),
        uniqueCols = Seq("event_id"))),

    // ---- reshaping (B3/C7 companions) ----
    // pivot with a CALLER-NAMED value domain (no discovery pass, bounded
    // row width at scale); absent combinations fill 0
    "q_pivot" -> ((s, dir) =>
      Ops.pivotAgg(T(s, dir, "events"), Seq("user_id"), "event_type",
        Seq("click", "view", "purchase", "error", "signup"), count(lit(1)),
        fillValue = 0L)),
    "q_unpivot" -> ((s, dir) =>
      Ops.unpivotCols(
        Ops.pivotAgg(T(s, dir, "events"), Seq("user_id"), "event_type",
          Seq("click", "view"), count(lit(1)), fillValue = 0L),
        Seq("user_id"), Seq("click", "view"), "event_type", "n")),
    // rolling 3-event window per user: decimal-exact moving sum
    "q_rolling" -> ((s, dir) => {
      val ev = T(s, dir, "events").select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"), col("value"))
      Ops.rollingAgg(ev, Seq("user_id"), struct(col("ts_us"), col("event_id")),
          lookback = 3,
          Seq("roll_sum" -> sum(dec(col("value"))), "roll_n" -> count(lit(1))))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("roll_sum").cast(DoubleType).as("roll_sum"), col("roll_n"))
    }),
    // schema-evolving fan-in: two drifted projections union by name,
    // missing columns null-fill
    "q_union_evolved" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      Ops.unionEvolved(Seq(
        c.select(col("c_custkey"), col("c_name")),
        c.select(col("c_custkey"), col("c_acctbal"))))
    }),
    "q_anti_join" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),
    "q_semi_join" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // ---- transforms at nested paths (B5) ----
    "q_transform_at" -> ((s, dir) =>
      Ops.transformAt(
          T(s, dir, "orders").select(col("o_orderkey"),
            struct(col("o_totalprice").as("price")).as("pay")),
          "pay.price", _ * 2)
        .select(col("o_orderkey"), col("pay.price").as("price2x"))),

    // ---- pipeline DAG (E1) ----
    "q_pipeline" -> ((s, dir) =>
      graft.pipeline.Pipeline.empty
        .source("orders", T(s, dir, "orders"))
        .source("customer", T(s, dir, "customer"))
        .stage("f_orders", "orders")(_.filter(col("o_orderstatus") === "F"))
        .fanIn("joined", Seq("f_orders", "customer"))(dfs =>
          dfs(0).join(dfs(1), col("o_custkey") === col("c_custkey")))
        .stage("agg", "joined")(_.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            Ops.moneySum(col("o_totalprice")).as("sum_price")))
        .output("agg")),

    // ---- distributed paginated source (A9) ----
    "q_paginated" -> ((s, _) =>
      Sources.paginatedApi(s, 20, p => (0 until 3).map(i => s"p$p:$i"))),
    // per-row templated GET (deterministic fake fetch; url built in codegen)
    "q_http_template" -> ((s, dir) =>
      Sources.httpTemplate(
        T(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
        "http://api.example/{v}/nations/{n_nationkey}?name={n_name}",
        url => Seq(s"resp:$url", s"len:${url.length}"),
        keep = Seq("n_nationkey"),
        constants = Map("v" -> "v2"))),

    // ---- TreeHorn (F1/F2/F3/F4) ----
    "q_treewalk" -> ((s, dir) => {
      val li = T(s, dir, "lineitem"); val o = T(s, dir, "orders")
      val nested = li.groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_linenumber"), col("l_quantity"))).as("lines"))
      val doc = o.join(nested, o("o_orderkey") === nested("l_orderkey"))
        .select(col("o_orderkey"), struct(col("lines")).as("payload"))
      TreeWalk.flattenAtKey(doc, "l_quantity", "item", keep = Seq("o_orderkey"))
    }),
    // GO UP: anchor output at an ancestor of the matched node — walk down to
    // the line-item level, climb back to the struct holding customer info
    "q_treewalk_up" -> ((s, dir) =>
      TreeWalk.walk(orderDoc(s, dir),
        Seq(TreeWalk.GoDown(TreeWalk.HasKey("l_quantity"), "item"),
            TreeWalk.GoUp(TreeWalk.HasDescendantKey("c_name"), "pay")),
        Seq("item.l_quantity" -> "qty", "item.l_partkey" -> "part_key",
            "pay.cust_info.c_name" -> "cust_name"),
        keep = Seq("o_orderkey"))),
    // compound schema conditions + a value predicate on the landed node
    "q_treewalk_cond" -> ((s, dir) =>
      TreeWalk.walk(orderDoc(s, dir),
        Seq(TreeWalk.GoDown(TreeWalk.And(TreeWalk.HasKey("l_quantity"),
            TreeWalk.HasAncestorKey("o_orderkey")), "item")),
        Seq("item.l_quantity" -> "qty", "item.l_linenumber" -> "line_no"),
        keep = Seq("o_orderkey"),
        where = Seq("item.l_quantity" -> (_ >= lit(25))))),
    "q_extract" -> ((s, dir) =>
      TreeWalk.extract(orderDoc(s, dir),
        Seq(TreeWalk.Capture("c_name", "cust"), TreeWalk.Capture("l_quantity", "item")),
        Seq("cust.c_custkey" -> "cust_key", "item.l_quantity" -> "qty"),
        keep = Seq("o_orderkey"))),
    "q_relations" -> ((s, dir) =>
      TreeWalk.relations(orderDoc(s, dir),
        TreeWalk.Capture("c_name", "cust"), "c_custkey",
        TreeWalk.Capture("l_quantity", "item"), "l_partkey", "ORDERED")),

    // ---- MTL front-end (F5) ----
    "q_mtl" -> ((s, dir) => {
      val program = graft.json.MtlParser.parse(
        """QUERY orderq IS SELECT cust.c_custkey AS cust_key,
          |identity(item.l_quantity) AS qty, cust.c_name AS cust_name
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY c_name AS cust
          |GO DOWN UNTIL HAS KEY l_quantity AS item;""".stripMargin)
      graft.json.MtlParser.run(orderDoc(s, dir), program, "orderq")
    }),

    // MTL function application (treehorn_yaccer.py:392-485: user-defined
    // functions in selection lists): `f(label.key) AS alias` resolves
    // against a caller-supplied Column=>Column registry — the Spark-native
    // equivalent of the reference's imported Python callables. The PYTHON
    // FUNCTION declaration line parses and is ignored (execution is JVM).
    "q_mtl_func" -> ((s, dir) => {
      val program = graft.json.MtlParser.parse(
        """shout IS A PYTHON FUNCTION IMPORTED FROM string.upper;
          |QUERY orderq IS SELECT shout(cust.c_name) AS cust_uc,
          |strlen(cust.c_name) AS name_len, cust.c_custkey AS cust_key
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY c_name AS cust;""".stripMargin)
      graft.json.MtlParser.run(orderDoc(s, dir), program, "orderq",
        functions = Map(
          "shout" -> (c => upper(c)),
          "strlen" -> (c => length(c).cast(LongType))))
    }),

    // MTL WHERE: predicates parsed from the query text filter before
    // projection (and push down into the scan)
    "q_mtl_where" -> ((s, dir) => {
      val program = graft.json.MtlParser.parse(
        """QUERY orderq IS SELECT cust.c_custkey AS cust_key,
          |item.l_quantity AS qty, item.l_partkey AS part_key
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY c_name AS cust
          |GO DOWN UNTIL (HAS KEY l_quantity AND NOT HAS KEY c_name) AS item
          |WHERE item.l_quantity >= 25 AND cust.c_custkey > 50;""".stripMargin)
      graft.json.MtlParser.run(orderDoc(s, dir), program, "orderq")
    }),
    // multi-query MTL program: two traversals share ONE evaluation of the
    // document frame; outputs union with a query tag (ints stringified —
    // doubles would format differently across engines)
    "q_mtl_multi" -> ((s, dir) => {
      val program = graft.json.MtlParser.parse(
        """QUERY custq IS SELECT cust.c_custkey AS cust_key, cust.c_name AS cust_name
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY c_name AS cust;
          |QUERY itemq IS SELECT item.l_partkey AS part_key, item.l_linenumber AS line_no
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY l_quantity AS item;""".stripMargin)
      val ts = graft.json.MtlParser.runProgram(orderDoc(s, dir), program)
      ts("custq").select(lit("custq").as("src"),
          col("cust_key").cast(StringType).as("a"), col("cust_name").as("b"))
        .unionByName(ts("itemq").select(lit("itemq").as("src"),
          col("part_key").cast(StringType).as("a"),
          col("line_no").cast(StringType).as("b")))
    }),

    // MTL coreference: cust_key and cust_name name the same entity; output =
    // min-label connected components over the value graph (2 LP rounds)
    "q_coreference" -> ((s, dir) => {
      val program = graft.json.MtlParser.parse(
        """QUERY orderq IS SELECT cust.c_custkey AS cust_key, cust.c_name AS cust_name
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY c_name AS cust;
          |IN QUERY orderq cust_key AND cust_name COREFER;""".stripMargin)
      graft.json.MtlParser.coreferenceGroups(orderDoc(s, dir), program, "orderq")
    }),

    // compound-name entities: identity = content hash of ordered components
    // (deterministic replacement for the reference's per-row uuid4)
    "q_compound_entity" -> ((s, dir) => {
      val rows = TreeWalk.extract(orderDoc(s, dir),
        Seq(TreeWalk.Capture("c_name", "cust")),
        Seq("cust.c_custkey" -> "cust_key", "cust.c_name" -> "cust_name"))
      graft.json.MtlParser.compoundEntities(rows, Seq("cust_key", "cust_name"))
    }),
    // canonicalized knowledge base: relation edges with coreference
    // canonical ids substituted at both endpoints (broadcast rewrites)
    "q_kb_canonical" -> ((s, dir) => {
      val program = graft.json.MtlParser.parse(
        """QUERY orderq IS SELECT cust.c_custkey AS cust_key,
          |cust.c_name AS cust_name, item.l_partkey AS part_key
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY c_name AS cust
          |GO DOWN UNTIL HAS KEY l_quantity AS item;
          |IN QUERY orderq cust NAMED BY cust_key IS RELATED TO part NAMED BY part_key AS ordered;
          |IN QUERY orderq cust_key AND cust_name COREFER;""".stripMargin)
      graft.json.MtlParser.knowledgeBase(orderDoc(s, dir), program, "orderq")
        .select("src_id", "dst_id", "rel")
    }),
    // relationship properties (nft_nodes.py:834): edge property k/v pairs
    // asserted from a selection alias, exploded for the oracle
    "q_kb_props" -> ((s, dir) => {
      val program = graft.json.MtlParser.parse(
        """QUERY orderq IS SELECT cust.c_custkey AS cust_key,
          |item.l_partkey AS part_key, item.l_linenumber AS line_no
          |FROM obj START AT TOP
          |GO DOWN UNTIL HAS KEY c_name AS cust
          |GO DOWN UNTIL HAS KEY l_quantity AS item;
          |IN QUERY orderq cust NAMED BY cust_key IS RELATED TO part NAMED BY part_key AS ordered WITH PROPERTY line BY line_no;""".stripMargin)
      graft.json.MtlParser.relationTables(orderDoc(s, dir), program, "orderq").head
        .select(col("src_id").cast("string").as("src_id"),
          col("dst_id").cast("string").as("dst_id"), col("rel"),
          explode(col("props")).as("p"))
        .select(col("src_id"), col("dst_id"), col("rel"),
          col("p.k").as("k"), col("p.v").as("v"))
    }),

    // ---- config-built pipeline (E4) ----
    "q_config" -> ((s, dir) =>
      graft.pipeline.ConfigPipeline.fromJson(s,
        s"""{"stages": [
           | {"name": "orders", "op": "table", "dir": "$dir", "table": "orders"},
           | {"name": "f", "op": "filter", "from": "orders", "expr": "o_orderstatus = 'F'"},
           | {"name": "agg", "op": "agg", "from": "f", "keys": ["o_orderpriority"],
           |  "aggs": ["COUNT(*) AS n_orders",
           |           "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price"]}
           |]}""".stripMargin).output("agg")),

    // config-built LLM-data pipeline: split → filter train → exact dedup,
    // entirely from JSON (E4 reaching the G ops)
    "q_config_llm" -> ((s, dir) =>
      graft.pipeline.ConfigPipeline.fromJson(s,
        s"""{"stages": [
           | {"name": "docs", "op": "table", "dir": "$dir", "table": "documents"},
           | {"name": "sp", "op": "split", "from": "docs", "id": "doc_id", "trainPct": 90},
           | {"name": "train", "op": "filter", "from": "sp", "expr": "split = 'train'"},
           | {"name": "dd", "op": "dedup_exact", "from": "train", "id": "doc_id", "text": "text"}
           |]}""".stripMargin).output("dd")),

    // config-built INDEX lifecycle (E4 + G52, r12): the config path stands
    // a stored IVF-SQ index UP (sq_index_write — trained coarse quantizer
    // by default) and probes it in the SAME pipeline; nprobe = nlist makes
    // the probe ≡ the exhaustive sqTopK scan, so the whole build→probe
    // chain shares q_sq_topk's oracle bit for bit
    "q_config_index" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_cfg_idx").toString
      graft.pipeline.ConfigPipeline.fromJson(s,
        s"""{"stages": [
           | {"name": "c", "op": "table", "dir": "$dir", "table": "embeddings"},
           | {"name": "built", "op": "sq_index_write", "from": "c",
           |  "id": "vec_id", "vec": "embedding", "dim": 64,
           |  "dir": "$base/sq", "nlist": 16},
           | {"name": "qf", "op": "filter", "from": "c", "expr": "vec_id < 8"},
           | {"name": "nn", "op": "sq_index_probe", "from": "qf",
           |  "id": "vec_id", "vec": "embedding", "dir": "$base/sq",
           |  "topK": 3, "nprobe": 16}
           |]}""".stripMargin).output("nn")
    }),

    // ---- bucketed interval join (C5 scale path; same oracle as q_join_window) ----
    "q_join_window_bucketed" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), expr("ts_ns div 1000").as("p_us"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id"), expr("ts_ns div 1000").as("e_us"))
      Ops.intervalJoinBucketed(p, e, Seq("user_id"), "p_us", "e_us",
          -300000000L, 300000000L, bucketWidth = 600000000L)
        .select(col("p_id"), col("e_id"), col("__ij_l.user_id").as("user_id"),
          (col("e_us") - col("p_us")).as("dt_us"))
    }),

    // ---- streaming end-to-end (A3 + C4 + D3/E2) ----
    // file-stream source → event-time windowed agg → foreachBatch parquet
    // recorder, drained with AvailableNow. Complete mode makes the final
    // parquet the full aggregate regardless of how files split into
    // micro-batches, so the result is batch-deterministic and oracle-able.
    "q_stream_e2e" -> ((s, dir) => withStreamShuffle(s) {
      val ev = T(s, dir, "events").select(col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"), col("value"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_e2e").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      // 2 files × maxFilesPerTrigger=1 = two micro-batches: enough to prove
      // batch-split determinism at half the per-batch overhead of 4
      ev.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
          format = "parquet", schemaDdl = Some(ev.schema.toDDL),
          maxFilesPerTrigger = 1)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val agg = stream
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Ops.moneySum(col("value")).as("sum_value"))
        .select(unix_micros(col("window.start")).as("win_us"), col("event_type"),
          col("n_events"), col("sum_value"))
      val q = graft.streaming.Streams.toForeachBatch(agg, ckpt,
        availableNow = true, outputMode = "complete") { (batch, _) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      q.awaitTermination()
      s.read.parquet(outDir)
    }),

    // stream-static broadcast enrichment, end to end: file-stream events
    // (no stateful operator here, but the per-batch sink write still plans
    // at the session shuffle setting — scoped down with the rest)
    // left-join the customer dim map-side (zero stream-side shuffle),
    // appended to parquet per micro-batch — row-level, so any batch split
    // yields the same total output (2 files × 1 file/trigger here)
    "q_stream_enrich" -> ((s, dir) => withStreamShuffle(s) {
      val ev = T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_enr").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      ev.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(ev.schema.toDDL),
        maxFilesPerTrigger = 1)
      val dim = T(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val enriched = graft.streaming.Streams.enrich(stream, dim, Seq("user_id"))
      val q = graft.streaming.Streams.toForeachBatch(enriched, ckpt,
        availableNow = true, outputMode = "append") { (batch, _) =>
        batch.write.mode("append").parquet(outDir)
      }
      q.awaitTermination()
      s.read.parquet(outDir)
    }),

    // stream-stream interval join, end to end: purchases and errors arrive
    // as two independent file streams; the inner join with a ±300 s event-
    // time range emits each matched pair exactly once as state meets state
    // (batch-split independent). Watermark is set beyond the data's span so
    // no state evicts mid-replay — production use sets the real lag bound
    // and trades tail completeness for bounded state (see Streams.streamJoin).
    "q_stream_join" -> ((s, dir) => withStreamShuffle(s) {
      val ev = T(s, dir, "events")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_join").toString
      val pDir = s"$base/p"; val eDir = s"$base/e"
      val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), expr("ts_ns div 1000").as("p_us"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id"), expr("ts_ns div 1000").as("e_us"))
      p.repartition(2).write.mode("overwrite").parquet(pDir)
      e.repartition(2).write.mode("overwrite").parquet(eDir)
      val ps = graft.streaming.Streams.watchDirectory(s, pDir, format = "parquet",
          schemaDdl = Some(p.schema.toDDL), maxFilesPerTrigger = 1)
        .withColumn("p_ts", timestamp_micros(col("p_us")))
      val es = graft.streaming.Streams.watchDirectory(s, eDir, format = "parquet",
          schemaDdl = Some(e.schema.toDDL), maxFilesPerTrigger = 1)
        .withColumn("e_ts", timestamp_micros(col("e_us")))
      val joined = graft.streaming.Streams.streamJoin(ps, es, Seq("user_id"),
        "p_ts", "e_ts", watermark = "30 days", timeout = "300 seconds")
      val out = joined.select(col("p_id"), col("e_id"),
        ps("user_id").as("user_id"), (col("e_us") - col("p_us")).as("dt_us"))
      val q = graft.streaming.Streams.toForeachBatch(out, ckpt,
        availableNow = true, outputMode = "append") { (batch, _) =>
        batch.write.mode("append").parquet(outDir)
      }
      q.awaitTermination()
      s.read.parquet(outDir)
    }),

    // ---- sessionization (C4 dynamic windows) ----
    // gap sessions over events: 10-minute inactivity splits; window-function
    // (scale) form and flatMapGroupsWithState (stateful) form share one oracle
    "q_sessionize" -> ((s, dir) =>
      Ops.sessionize(
          T(s, dir, "events").select(col("user_id"), expr("ts_ns div 1000").as("ts_us")),
          Seq("user_id"), "ts_us", gap = 600000000L)
        .select("user_id", "session_id", "session_start", "session_end", "n_events")),
    // celebrity-key-safe two-phase form: per-(user, hour-bucket) local
    // tags chained through summary rows — bit-identical to q_sessionize
    // (shares its oracle) with the per-key skew ceiling removed
    // (plans/SKEW.md r11 measures the hot-user decade)
    "q_sessionize_segmented" -> ((s, dir) =>
      Ops.sessionizeSegmented(
          T(s, dir, "events").select(col("user_id"), expr("ts_ns div 1000").as("ts_us")),
          Seq("user_id"), "ts_us", gap = 600000000L, segment = 3600000000L)
        .select("user_id", "session_id", "session_start", "session_end", "n_events")),
    // DIALOGUE-PACK flagship: the conversation-data training-prep flow in
    // one query — gap-sessionize the event stream (sessionTag keeps the
    // member rows), assemble each session's events into one time-ordered
    // "dialogue" string (ties break on the utterance text), then pack the
    // dialogues into fixed-token-budget training sequences (packByBudget
    // over (user_id, session_id) order). Every stage is deterministic
    // integer/string work, so the whole flow replays in SQL.
    "q_dialogue_pack" -> ((s, dir) => {
      // null utterances filter out BEFORE tagging (matching the oracle's
      // WHERE): an ALL-null session would otherwise diverge — Spark's
      // array_join yields "" where DuckDB's string_agg yields NULL
      val ev = T(s, dir, "events").select(col("user_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_type"))
        .filter(col("event_type").isNotNull)
      val tagged = Ops.sessionTag(ev, Seq("user_id"), "ts_us",
        gap = 600000000L)
      val dialogues = tagged.groupBy("user_id", "session_id")
        .agg(array_join(transform(
            sort_array(collect_list(struct(col("ts_us"), col("event_type")))),
            x => x.getField("event_type")), " ").as("dialogue"),
          count(lit(1)).as("n_tokens"))
      // per-user packing: each user's sessions fill that user's context
      // windows in session order — the exchange stays keyed (a global
      // pack would funnel every dialogue through one window task)
      Ops.packByBudget(dialogues, Seq("user_id"), Seq("session_id"),
          "n_tokens", budget = 50L)
        .select("user_id", "session_id", "dialogue", "n_tokens", "bin_id")
    }),
    "q_sessionize_state" -> ((s, dir) => {
      import s.implicits._
      val ev = T(s, dir, "events")
        .select(col("user_id"), expr("ts_ns div 1000").as("ts_us")).as[(Long, Long)]
      graft.streaming.Streams.sessionizeState(ev, gap = 600000000L)
        .toDF("user_id", "session_id", "session_start", "session_end", "n_events")
    }),

    // streaming keep-best dedup: per-user best-value event via keyed state,
    // drained as a changelog (update mode, per-batch dirs) and compacted to
    // final states by max n_copies — which strictly increases per key, so
    // the compaction is exact under ANY batch split (2 files × 1/trigger)
    "q_stream_keepbest" -> ((s, dir) => withStreamShuffle(s) {
      import s.implicits._
      val ev = T(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id").cast(StringType).as("key"),
          col("event_id"), col("value"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_kb").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      ev.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
          format = "parquet", schemaDdl = Some(ev.schema.toDDL), maxFilesPerTrigger = 1)
        .as[(String, Long, Double)]
      val best = graft.streaming.Streams.keepBestStream(stream)
        .toDF("key", "keep_id", "keep_score", "n_copies")
      val q = graft.streaming.Streams.toForeachBatch(best, ckpt,
        availableNow = true, outputMode = "update") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
        .groupBy("key")
        .agg(max(struct(col("n_copies"), col("keep_score"), col("keep_id"))).as("__f"))
        .select(col("key"), col("__f.keep_id").as("keep_id"),
          col("__f.keep_score").as("keep_score"), col("__f.n_copies").as("n_copies"))
    }),

    // streaming repetition stats: per-document Gopher metrics computed as
    // documents arrive (one in-memory pass per doc via keyed state, state
    // dropped immediately); row-level per doc → any batch split appends
    // the same total output; shares q_repetition's oracle shape
    "q_stream_repetition" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_rep").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val stats = graft.streaming.Streams.repetitionStatsStream(
        stream, "doc_id", "text", n = 2)
      val q = graft.streaming.Streams.toForeachBatch(stats, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
        .select(col("id").as("doc_id"), col("n_grams"), col("n_distinct"),
          col("dup_frac"), col("top_frac"))
    }),

    // ---- JDBC write → partitioned read-back (A8 + D4, embedded Derby) ----
    // real database round-trip: overwrite-write nation into Derby, then read
    // it back through the 4-way partitioned JDBC scan; the oracle reads the
    // original parquet, so any type/value mangling in either direction fails.
    // This one query keeps IN-MEMORY Derby and stays the single documented
    // environmental skip under local-cluster: the operator under test is
    // Spark's executor-side JDBC WRITER, and embedded Derby accepts writes
    // from exactly one JVM (no network server ships in this environment) —
    // the read-only jar device that fixed q_jdbc_query/q_jdbc_typed cannot
    // carry a write. plans/CLUSTER.md r12 has the adjudication.
    "q_jdbc_roundtrip" -> ((s, dir) => {
      derbyEngineProps
      val url = "jdbc:derby:memory:graft_rt;create=true"
      val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
      val n = T(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      Sinks.jdbcWrite(n, url, "nation_rt", drv, mode = "overwrite")
      Sources.jdbcTable(s, url, "nation_rt",
        partitionColumn = Some("n_nationkey"), lowerBound = 0L, upperBound = 25L,
        numPartitions = 4, extra = drv)
    }),

    // introspected typed read (StreamMySQLTable shape): seed a table with
    // a BINARY column into a read-only jar-archived Derby (multi-JVM-legal
    // — see derbyJarFixture), read its column types back through JDBC
    // metadata, apply them via SchemaInfer, and hex-surface the blob — the
    // oracle recomputes the hex from the source parquet, so a mangled type
    // map or byte round-trip fails
    "q_jdbc_typed" -> ((s, dir) => {
      val src = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), unhex(md5(col("c_name"))).as("c_sig"))
      val (url, drv) = derbyJarFixture(src, "ty", "customer_ty",
        Seq("c_custkey" -> "BIGINT", "c_name" -> "VARCHAR(64)",
          "c_sig" -> "BLOB"))
      val cols = Sources.jdbcColumns(url, "customer_ty", drv)
      Sources.jdbcTyped(s, url, "customer_ty", cols,
          partitionColumn = Some("c_custkey"), lowerBound = 0L, upperBound = 1500L,
          numPartitions = 4, extra = drv)
        .select("c_custkey", "c_name", "c_sig_hex")
    }),

    // JDBC SQL-pushdown source: the WHERE/aggregate runs inside Derby and
    // only the result set reaches Spark (Civis SQLExecute/FindValue shape);
    // the database is the read-only jar fixture, so the pushdown executes
    // inside whichever JVM Spark schedules it on
    "q_jdbc_query" -> ((s, dir) => {
      // the seed is FIXTURE-sized: only rows the pushdown predicate can
      // ever touch are loaded (a strict superset of the query's
      // > 200000 cut, so the in-database WHERE still discards rows and
      // the result is unchanged at any SF) — seeding the full order book
      // through one driver JDBC connection was the slowest bench row
      val o = T(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(col("o_totalprice") > 150000.0)
      val (url, drv) = derbyJarFixture(o, "q", "orders_q",
        Seq("o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
          "o_totalprice" -> "DOUBLE"))
      // identifiers quoted: the fixture DDL quotes columns case-preserved,
      // and unquoted references would uppercase and miss them
      Sources.jdbcQuery(s, url,
        """SELECT "o_custkey", COUNT(*) AS n_big, MAX("o_totalprice") AS max_price
          |FROM orders_q WHERE "o_totalprice" > 200000.0 GROUP BY "o_custkey"""".stripMargin,
        extra = drv)
        .select(col("o_custkey").as("o_custkey"),
          col("n_big").cast(LongType).as("n_big"),
          col("max_price").as("max_price"))
    }),

    // ---- sink round trips (D3/D4): record → read back → oracle ----
    "q_recorder_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_rec").toString + "/rec"
      Sinks.recorder(T(s, dir, "nation"), out)
      s.read.parquet(out)
    }),
    // graph export: entity+edge parquet layout; edges read back must equal
    // the relation extraction they came from (q_relations' oracle)
    "q_graph_roundtrip" -> ((s, dir) => {
      // entity AND edge exports both walk the doc — persist it or the
      // join+collect_list scaffold runs twice
      val doc = orderDoc(s, dir)
        .trackedPersist()
      val cust = TreeWalk.Capture("c_name", "cust")
      val item = TreeWalk.Capture("l_quantity", "item")
      val out = java.nio.file.Files.createTempDirectory("graft_graph").toString
      Sinks.graphExport(
        Map("cust" -> TreeWalk.entities(doc, cust, "c_custkey")),
        Map("ordered" -> TreeWalk.relations(doc, cust, "c_custkey", item, "l_partkey", "ORDERED")),
        out)
      s.read.parquet(s"$out/edges_ordered")
    }),

    // partition-layout write → pruned read: only the lang='en' directory is
    // scanned (PlanSpec asserts the PartitionFilters); oracle = plain WHERE
    "q_partition_pruning" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
      Sinks.writePartitioned(
        T(s, dir, "documents").select("doc_id", "text", "lang"), out, Seq("lang"))
      s.read.parquet(out).filter(col("lang") === "en").select("doc_id", "lang")
    }),

    // fragment → compact → read back: content must survive bit-for-bit
    "q_compact_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_cmp").toString
      val frag = s"$base/frag"; val out = s"$base/out"
      T(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
        .repartition(16).write.parquet(frag)
      Sinks.compact(s, frag, out)
      s.read.parquet(out)
    }),
    // ATOMIC-SWAP rewrite round trip (the index write-back device): first
    // swapWrite creates the dir, the second READS the live dir and writes
    // back over it through the .next/rename protocol — the exact
    // maintenance loop every stored-index family runs; the read-back must
    // be the full unchanged table (partition layout included)
    "q_swap_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_swp").toString
      val idx = s"$base/idx"
      Sinks.swapWrite(
        T(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey"),
        idx, Seq("c_nationkey"))
      // maintenance shape: read the LIVE data, write back over it —
      // through resolveLive (a no-op on the rename layout), so the query
      // is protocol-agnostic and the suite runs green under
      // SPARK_GRAFT_SWAP=pointer too (r14)
      Sinks.swapWrite(s.read.parquet(Sinks.resolveLive(s, idx)), idx,
        Seq("c_nationkey"))
      s.read.parquet(Sinks.resolveLive(s, idx)).select(col("c_custkey"),
        col("c_name"), col("c_nationkey").cast(LongType).as("c_nationkey"))
    }),
    // the SAME roundtrip under the r14 generation-POINTER protocol (the
    // object-store-safe swap — no directory rename at all): write,
    // maintenance-read the live generation through resolveLive, write
    // back as a new generation, read back bit-for-bit. Shares
    // q_swap_roundtrip's oracle — the protocols are layout-transparent
    // to readers, and this row proves it through the DuckDB gate, not
    // just the spec.
    "q_swap_pointer" -> ((s, dir) => {
      val key = "spark.graft.swap.protocol"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "pointer")
      try {
        val base = java.nio.file.Files.createTempDirectory("graft_swp_p").toString
        val idx = s"$base/idx"
        Sinks.swapWrite(
          T(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey"),
          idx, Seq("c_nationkey"))
        Sinks.swapWrite(
          s.read.parquet(Sinks.resolveLive(s, idx)), idx, Seq("c_nationkey"))
        s.read.parquet(Sinks.resolveLive(s, idx)).select(col("c_custkey"),
          col("c_name"), col("c_nationkey").cast(LongType).as("c_nationkey"))
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }),
    // Z-ORDER layout (D5): the Morton keys zorderWrite range-partitions by.
    // Binning and interleave are pure BIGINT arithmetic, so the oracle
    // replays every key bit-exactly; the file-skip win the layout buys is
    // measured in plans/LAYOUT.md and pinned by LayoutSpec.
    // floor() on BOTH sides before the bigint cast: o_totalprice is DOUBLE
    // and a bare double→BIGINT cast TRUNCATES in Spark but ROUNDS in DuckDB
    // (±1 cents on ~5% of rows — latent bin flips); floor-then-cast is the
    // same IEEE value in both engines
    "q_zorder" -> ((s, dir) =>
      Sinks.zorderValue(
        T(s, dir, "orders").withColumn("cents",
          expr("cast(floor(o_totalprice * 100) as bigint)")),
        Seq("o_custkey", "cents"), bits = 8)
        .select(col("o_orderkey"), col("zval"))),
    // GLOBAL TRAINING SHUFFLE: shard + in-shard position are a pure
    // function of (seed, id) — the oracle replays the whole permutation
    "q_corpus_shuffle" -> ((s, dir) =>
      Ops.corpusShuffle(T(s, dir, "documents"), "doc_id", seed = 7L,
          numShards = 8)
        .select(col("doc_id"), col("shard"), col("pos").cast("long").as("pos"))),
    // SHARD MANIFEST: per-shard row count, content length, and an
    // order-independent xor digest over (id, text) — the integrity check
    // two independent exports compare before training starts; the oracle
    // replays sharding, hashing, and the xor fold exactly
    "q_manifest" -> ((s, dir) =>
      Ops.shardManifest(
        Ops.corpusShuffle(T(s, dir, "documents").select("doc_id", "text"),
          "doc_id", seed = 7L, numShards = 8),
        "shard", "doc_id", "text")),
    // STREAMING manifest twin: count, char-sum, and xor are all MERGEABLE
    // (that mergeability is the digest's design point — it's why an
    // export's manifest is order/parallelism-independent), so the
    // complete-mode streaming aggregate over the sharded corpus drained
    // as a file stream converges to the batch manifest EXACTLY at the
    // final micro-batch — shares q_manifest's oracle
    "q_stream_manifest" -> ((s, dir) => withStreamShuffle(s) {
      val sharded = Ops.corpusShuffle(
        T(s, dir, "documents").select("doc_id", "text"), "doc_id",
        seed = 7L, numShards = 8).select("shard", "doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_man").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      sharded.repartition(4).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(sharded.schema.toDDL),
        maxFilesPerTrigger = 1)
      val manifest = Ops.shardManifest(stream, "shard", "doc_id", "text")
      val q = graft.streaming.Streams.toForeachBatch(manifest, ckpt,
        availableNow = true, outputMode = "complete") { (batch, _) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      q.awaitTermination()
      s.read.parquet(outDir)
    }),

    // ---- file-format round trips (A1/A2): write → read back → oracle vs
    // the source parquet, so header/quoting/type-inference mangling fails ----
    "q_csv_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/nation"
      T(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1).write.option("header", "true").mode("overwrite").csv(out)
      Sources.csv(s, out)
    }),
    // CSV SINK (D: CivisToCSV shape): Sinks.csvWrite → typed re-read with
    // the source frame's own DDL, so decimals/doubles don't drift through
    // re-inference; distributed write (no coalesce — one file per task)
    "q_csv_write_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_csvw").toString + "/orders"
      val src = T(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      Sinks.csvWrite(src, out)
      Sources.csv(s, out, schemaDdl = Some(src.schema.toDDL))
    }),
    "q_text_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_text").toString + "/docs"
      T(s, dir, "documents").select("text").write.mode("overwrite").text(out)
      Sources.textLines(s, out)
    }),

    // streaming session windows end-to-end: file stream → session_window
    // agg (complete mode: the final batch is the whole deterministic
    // answer regardless of file/batch splits) → parquet → oracle. DuckDB
    // mirror uses the >= gap break (session_window merges strictly-inside
    // events) and end = last event + gap.
    "q_stream_sessions" -> ((s, dir) => withStreamShuffle(s) {
      val ev = T(s, dir, "events").select(col("user_id"), expr("ts_ns div 1000").as("ts_us"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_sess").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      ev.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
          format = "parquet", schemaDdl = Some(ev.schema.toDDL), maxFilesPerTrigger = 1)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val agg = stream
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("s_us"),
          unix_micros(col("session_window.end")).as("e_us"),
          col("n_events"))
      val q = graft.streaming.Streams.toForeachBatch(agg, ckpt,
        availableNow = true, outputMode = "complete") { (batch, _) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      q.awaitTermination()
      s.read.parquet(outDir)
    }),

    // streaming exact-dedup end-to-end: duplicated file stream →
    // dropDuplicates within the watermark horizon (sized to cover the whole
    // bounded replay, so the result is the global distinct) → parquet
    "q_stream_dedup" -> ((s, dir) => withStreamShuffle(s) {
      val ev = T(s, dir, "events")
        .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("ts_us"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_dd").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      // write the input TWICE — the stream must actually drop repeats
      ev.repartition(1).write.mode("overwrite").parquet(inDir)
      ev.repartition(1).write.mode("append").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
          format = "parquet", schemaDdl = Some(ev.schema.toDDL), maxFilesPerTrigger = 1)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val dd = graft.streaming.Streams.dedupStream(stream, "ts",
          watermark = "36500 days", keys = Seq("user_id", "event_type"))
        .select("user_id", "event_type", "ts_us")
      // per-batchId overwrite = idempotent under foreachBatch's
      // at-least-once retries (a plain append would duplicate a replayed
      // micro-batch)
      val q = graft.streaming.Streams.toForeachBatch(dd, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
    }),

    // env-var config source: a deterministically-unset variable yields the
    // one-row frame with a typed null (set-var behavior is spec-covered —
    // real env values cannot cross the Spark/DuckDB boundary)
    "q_envvars" -> ((s, _) =>
      Sources.envVars(s, Seq("GRAFT_UNSET_SENTINEL_XYZ"))
        .select(col("GRAFT_UNSET_SENTINEL_XYZ").cast(StringType).as("v"))),

    // ---- multimodal plumbing (G12) ----
    "q_multimodal" -> ((s, dir) => {
      val media = Multimodal.fakeMedia(s, T(s, dir, "documents"), "doc_id")
      Multimodal.decodeFeatures(s, media)
        .select(col("id"), col("format"), col("n_bytes"), col("byte_sum"),
          col("mean_byte"), size(col("frame_hashes")).as("n_sampled"))
    }),

    // ---- dedup (G1-G5) ----
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(T(s, dir, "documents"), "doc_id", "text")),
    // keep-best dedup: among normalized duplicates keep the LONGEST copy
    // (ties by highest id) — the curation keep policy, one partial-agg pass
    "q_dedup_best" -> ((s, dir) =>
      Dedup.exactKeepBest(
        T(s, dir, "documents")
          .withColumn("norm", md5(Text.normalize(col("text"))))
          .withColumn("len", length(col("text")).cast(LongType)),
        "doc_id", "norm", "len")),
    // normalize-then-dedup: case/punctuation/whitespace variants collapse
    "q_dedup_norm" -> ((s, dir) =>
      Dedup.exact(
        T(s, dir, "documents").withColumn("norm", Text.normalize(col("text"))),
        "doc_id", "norm")),
    "q_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(T(s, dir, "documents"), "doc_id", "text", k = 3, tau = 0.5)),
    // Datalog-style inference: transitive closure of per-customer
    // "next order" chains → derived happened-before edges
    "q_kb_infer" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val edges = T(s, dir, "orders")
        .withColumn("__nxt", lead(col("o_orderkey"), 1).over(w))
        .filter(col("__nxt").isNotNull)
        .select(col("o_orderkey").cast(StringType).as("src_id"),
          col("__nxt").cast(StringType).as("dst_id"), lit("next").as("rel"))
      MtlParser.inferTransitive(edges, "next", "before")
    }),
    // deterministic integer PageRank over the same next-order edge graph:
    // 3 iterations, all-BIGINT arithmetic (rank div outdeg, 85% damping as
    // (85*cs) div 100) — bit-identical across partitionings and engines
    "q_pagerank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val edges = T(s, dir, "orders")
        .withColumn("__nxt", lead(col("o_orderkey"), 1).over(w))
        .filter(col("__nxt").isNotNull)
        .select(col("o_orderkey").cast(StringType).as("src_id"),
          col("__nxt").cast(StringType).as("dst_id"))
      graft.graph.Graph.pageRank(edges, iters = 3)
    }),
    // DANGLING-mass redistribution (r12) over the SAME sink-bearing graph
    // (every customer's last order is a sink): each iteration the dangling
    // nodes' summed rank splits evenly into every node's contribution
    // before damping — (85·(cs + D div N)) div 100, exact BIGINT, so the
    // oracle unrolls the same three iterations with the same floor
    // divisions and total mass no longer decays with the sink count
    "q_pagerank_dangling" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val edges = T(s, dir, "orders")
        .withColumn("__nxt", lead(col("o_orderkey"), 1).over(w))
        .filter(col("__nxt").isNotNull)
        .select(col("o_orderkey").cast(StringType).as("src_id"),
          col("__nxt").cast(StringType).as("dst_id"))
      graft.graph.Graph.pageRank(edges, iters = 3, danglingRedistribute = true)
    }),
    // degree table over the customer→part purchase graph
    "q_degrees" -> ((s, dir) => {
      val edges = T(s, dir, "orders")
        .join(T(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast(StringType).as("src_id"),
          col("l_partkey").cast(StringType).as("dst_id"))
      graft.graph.Graph.degrees(edges)
    }),
    // single Datalog rule: skip2(a, c) :- next(a, b), next(b, c)
    "q_kb_rule" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val edges = T(s, dir, "orders")
        .withColumn("__nxt", lead(col("o_orderkey"), 1).over(w))
        .filter(col("__nxt").isNotNull)
        .select(col("o_orderkey").cast(StringType).as("src_id"),
          col("__nxt").cast(StringType).as("dst_id"), lit("next").as("rel"))
      MtlParser.applyRule(edges, "next", "next", "skip2")
    }),
    // per-stratum deterministic sampling: all of zh, 10% of en, half of rest
    "q_stratified" -> ((s, dir) =>
      Ops.stratifiedSample(T(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 100, "zh" -> 1000), defaultPermille = 500)
        .select("doc_id", "lang")),
    // flagship r4 curation pipeline: repetition floor (docs too short to
    // measure count as clean) → mixture rebalance over the CLEANED corpus
    // → reproducible split. One corpus scan feeds the repetition stats;
    // everything after is count-aggregate + filter projections.
    "q_curation_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val rep = Text.repetitionStats(docs, "doc_id", "text", n = 2)
        .select(col("id").as("doc_id"), col("dup_frac"))
      val clean = docs.join(rep, Seq("doc_id"), "left")
        .withColumn("dup_frac", coalesce(col("dup_frac"), lit(0.0)))
        .filter(col("dup_frac") <= 0.6)
      val mixed = Ops.resampleMixture(clean, "doc_id", "lang",
        Map("en" -> 50, "zh" -> 30, "es" -> 20))
      Ops.hashSplit(mixed, "doc_id", 90)
        .select("doc_id", "lang", "dup_frac", "split")
    }),
    // mixture resampling: rebalance lang shares to en:zh:es = 50:30:20
    // (zh is the bottleneck → keeps 100%; de/fr unweighted → dropped)
    "q_mixture" -> ((s, dir) =>
      Ops.resampleMixture(T(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 50, "zh" -> 30, "es" -> 20))
        .select("doc_id", "lang")),
    // temperature mixing: group quotas ∝ sqrt(n_lang) (α=0.5, the
    // multilingual low-resource-upweighting rule); kept docs are the first
    // quota in each group's (md5(id), id) permutation
    "q_temperature_sample" -> ((s, dir) =>
      Ops.temperatureSample(T(s, dir, "documents"), "doc_id", "lang",
        total = 300L, alpha = 0.5)),
    // token-budget selection: fill each language's TOKEN target in md5(id)
    // order; budgets are below each group's sf0.01 volume so every group
    // truncates (the crossing doc is the last kept)
    "q_token_budget" -> ((s, dir) =>
      Ops.tokenBudgetSample(T(s, dir, "documents"), "doc_id", "lang", "text",
        Map("en" -> 6000L, "zh" -> 2000L, "es" -> 1500L))),
    // snapshot diff: old = docs minus (id%11=3) with texts perturbed at
    // id%7=0; new = docs minus (id%13=5) → all four statuses appear
    "q_snapshot_diff" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val old = d.filter(col("doc_id") % 11 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val nw = d.filter(col("doc_id") % 13 =!= 5)
      Ops.snapshotDiff(old, nw, "doc_id", "text")
    }),
    // token-distribution drift between the same two snapshots: mean
    // per-token log likelihood ratio of the new crawl under its own unigram
    // LM vs the old one's (empirical KL) — the "did the language move"
    // monitor beside snapshotDiff's "which docs moved"
    "q_distribution_drift" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val old = d.filter(col("doc_id") % 11 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val nw = d.filter(col("doc_id") % 13 =!= 5)
      graft.functions.Lm.distributionDrift(old, nw, "text")
    }),
    // shift-robust exact-substring dedup: sliding 16-token window hashes,
    // earlier (doc, start) owns each hash, overlapping dup windows merge
    // into maximal spans — catches copied runs fixed chunks miss when an
    // insertion shifts them off the chunk grid
    "q_substring_dedup" -> ((s, dir) =>
      Dedup.substringDedup(T(s, dir, "documents"), "doc_id", "text",
          window = 16, stride = 1)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_dup_spans"),
          col("dup_tokens"), col("dup_frac"))),
    // the TRANSFORM twin: tokens inside a maximal dup span removed, the
    // survivors reassembled in token order (the Lee-et-al substring cut)
    "q_substring_dedup_clean" -> ((s, dir) =>
      Dedup.substringDedupClean(T(s, dir, "documents"), "doc_id", "text",
          window = 16)
        .select(col("id").as("doc_id"), col("n_tokens"), col("dup_tokens"),
          col("clean_text"))),
    // STREAMING twin of substring dedup: per-window-hash ownership state
    // (min (id,start) — batch-split independent), drained changelog
    // compacted by max n_copies, maximal spans merged at drain time;
    // must converge on the batch answer exactly (shared oracle)
    "q_stream_substringdedup" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_ss").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val owners = graft.streaming.Streams.substringOwnersStream(stream,
        "doc_id", "text", window = 16)
      val q = graft.streaming.Streams.toForeachBatch(owners, ckpt,
        availableNow = true, outputMode = "update") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      val finalOwners = s.read.parquet(s"$outDir/batch_*")
        .groupBy("h")
        .agg(max(struct(col("n_copies"), col("owner_id"), col("owner_start")))
          .as("__f"))
        .select(col("h"), col("__f.owner_id").as("owner_id"),
          col("__f.owner_start").as("owner_start"))
      val dups = Dedup.windowHashes(docs, "doc_id", "text", 16, 1)
        .join(finalOwners, col("__h") === col("h"))
        .filter(col("owner_id") =!= col("id") || col("owner_start") =!= col("start"))
        .select(col("id"), col("start"), (col("start") + 16).as("__end"))
      val perDoc = Dedup.mergeSpans(dups).groupBy("id")
        .agg(count(lit(1)).as("n_dup_spans"),
          sum(col("__e") - col("__s")).as("dup_tokens"))
      docs.select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .join(perDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
        .withColumn("dup_frac",
          when(col("n_tokens") > 0,
            col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
            .otherwise(lit(0.0)))
    }),
    // STREAMING twin of winnowed dedup: per-print ownership state
    // (min (id,pos) — batch-split independent) over the same zero-shuffle
    // print projection; drained changelog compacted by max n_copies,
    // per-doc rollup at drain time — must equal the batch answer exactly
    // (shared oracle)
    "q_stream_winnow" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_wn").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val owners = graft.streaming.Streams.winnowOwnersStream(stream,
        "doc_id", "text", k = 8, w = 4)
      val q = graft.streaming.Streams.toForeachBatch(owners, ckpt,
        availableNow = true, outputMode = "update") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      val finalOwners = s.read.parquet(s"$outDir/batch_*")
        .groupBy("print")
        .agg(max(struct(col("n_copies"), col("owner_id"), col("owner_pos")))
          .as("__f"))
        .select(col("print"), col("__f.owner_id").as("owner_id"),
          col("__f.owner_pos").as("owner_pos"))
      val perDoc = Dedup.winnowedPrints(docs, "doc_id", "text", k = 8, w = 4)
        .join(finalOwners, Seq("print"))
        .select(col("id"),
          (col("owner_id") =!= col("id") || col("owner_pos") =!= col("pos"))
            .as("__dup"))
        .groupBy("id").agg(
          count(lit(1)).as("n_prints"),
          sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_prints"))
      docs.select(col("doc_id"))
        .join(perDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_prints"), lit(0L)).as("n_prints"),
          coalesce(col("n_dup_prints"), lit(0L)).as("n_dup_prints"))
        .withColumn("dup_frac",
          when(col("n_prints") > 0,
            col("n_dup_prints").cast("double") / col("n_prints").cast("double"))
            .otherwise(lit(0.0)))
    }),
    // winnowing fingerprints (MOSS): rightmost-min of each w-hash window
    // over k-gram hashes — ~2/(w+1) density with a REAL detection
    // guarantee (runs >= w+k-1 tokens always share a print), the
    // principled thinning stride sampling lacks
    "q_winnow" -> ((s, dir) =>
      Dedup.winnowedDedup(T(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 4)
        .select(col("id").as("doc_id"), col("n_prints"), col("n_dup_prints"),
          col("dup_frac"))),
    // heavy hitters over the corpus token stream: freqItems sketch
    // candidates + one exact verify pass — equals the full GROUP BY answer
    // while only candidate values ever enter an exchange
    "q_heavy_hitters" -> ((s, dir) => {
      val toks = T(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("tok"))
      Ops.heavyHitters(toks, "tok", supportPermille = 33)
    }),
    // STREAMING heavy hitters: Spark's own update-mode streaming aggregate
    // maintains the per-value running count (state = one long per distinct
    // value — smaller than any ownership twin's state); the changelog's
    // cnt strictly increases, so the drain compacts by max-cnt, derives
    // the total from the compacted counts, and applies the support
    // threshold — count is batch-split independent, so the answer equals
    // the batch q_heavy_hitters exactly (shared oracle)
    "q_stream_heavyhitters" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_hh").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val counts = stream
        .select(explode(Text.tokens(col("text"))).as("value"))
        .groupBy("value").agg(count(lit(1)).as("cnt"))
      val q = graft.streaming.Streams.toForeachBatch(counts, ckpt,
        availableNow = true, outputMode = "update") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      val finalCounts = s.read.parquet(s"$outDir/batch_*")
        .groupBy("value").agg(max(col("cnt")).as("cnt"))
      val total = finalCounts.agg(sum(col("cnt")).as("n"))
      finalCounts.crossJoin(total)
        .filter(col("cnt") * 1000 > col("n") * 33)
        .select(col("value"), col("cnt"))
    }),
    // KMV distinct sketch: k smallest md5 hashes per group (deterministic,
    // unlike HLL — the oracle reproduces the estimate bit-for-bit)
    "q_kmv" -> ((s, dir) =>
      Ops.approxDistinctKmv(T(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_partkey", k = 64)),
    // PII redaction over synthetic contact strings built from customer
    "q_redact" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val contact = concat(
        col("c_name"), lit(" email "),
        lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", ".")),
        lit("@mail.example.com phone 415-555-"),
        lpad((col("c_custkey") % 10000).cast(StringType), 4, "0"),
        lit(" ssn "),
        lpad((col("c_custkey") % 1000).cast(StringType), 3, "0"), lit("-"),
        lpad((col("c_custkey") % 100).cast(StringType), 2, "0"), lit("-"),
        lpad((col("c_custkey") % 10000).cast(StringType), 4, "0"),
        lit(" ip "), (col("c_custkey") % 256).cast(StringType), lit(".10.0.1"))
      c.select(col("c_custkey"), Text.redactPii(contact).as("redacted"))
    }),
    // G54: Unicode NFC normalization — decomposed a + COMBINING ACUTE
    // (U+0301) synthesized from the corpus text recomposes to á (U+00E1);
    // rows without an 'a' pass through the allocation-free already-normal
    // fast path. DuckDB's nfc_normalize is the bit-exact oracle.
    "q_nfc_normalize" -> ((s, dir) => {
      val deco = regexp_replace(col("text"), "a", "a\u0301")
      T(s, dir, "documents").select(col("doc_id"),
        Text.normalizeUnicode(deco).as("nfc_text"),
        when(Text.normalizeUnicode(deco) === deco, lit(0L)).otherwise(lit(1L))
          .as("changed"))
    }),
    // G54: encoding-quality stats over text salted with exactly the
    // mojibake the filter exists to catch — U+FFFD transcode tombstones,
    // C0 controls, non-ASCII, and a decomposed e + U+0301 sequence
    "q_encoding_stats" -> ((s, dir) => {
      val noisy = concat(col("text"),
        lit("\uFFFD\uFFFD").substr(lit(1), (col("doc_id") % 3).cast(IntegerType)),
        when(col("doc_id") % 5 === 0, lit(" \u0001\u0002 caf\u00e9"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" e\u0301")).otherwise(lit("")))
      T(s, dir, "documents").select(col("doc_id") +: Text.encodingStats(noisy): _*)
    }),
    // G54: script-mix stats over text salted with short non-Latin runs
    // (the corpus itself is ASCII); every 11th doc gets a CJK block long
    // enough to flip main_script — the "CJK in my English crawl"
    // contamination case the signal exists for
    "q_script_stats" -> ((s, dir) => {
      val salted = concat(col("text") +: scriptSalts.map { case (m, frag, times) =>
        when(col("doc_id") % m === 0, lit(" " + frag * times)).otherwise(lit(""))
      }: _*)
      T(s, dir, "documents").select(col("doc_id") +: Text.scriptStats(salted): _*)
    }),
    // G57: C4 line-quality cleaning over synthesized multi-line docs —
    // each doc becomes five lines exercising each rule (kept; <3 words;
    // banned "javascript"; kept with '?'; no terminal punct), and every
    // 13th doc gains the doc-level lorem-ipsum/brace markers and drops
    // whole. Native single-loop projection; the oracle replays the rules
    // as a DuckDB list_filter lambda.
    "q_c4_clean" -> ((s, dir) => {
      val tk = Text.tokens(col("text"))
      val lines = concat_ws("\n",
        concat(array_join(slice(tk, 1, 8), " "), lit(".")),
        lit("ok"),
        lit("Please enable JavaScript to continue."),
        concat(array_join(slice(tk, 9, 12), " "), lit(" done?")),
        array_join(slice(tk, 21, 5), " "))
      val doc = when(col("doc_id") % 13 === 0,
        concat(lines, lit("\nlorem ipsum {"))).otherwise(lines)
      T(s, dir, "documents")
        .select(col("doc_id"), doc.as("__d"))
        .filter(Text.c4DocOk(col("__d")))
        .select(col("doc_id"), Text.c4CleanLines(col("__d")).as("clean"),
          size(split(col("__d"), "\n")).cast(LongType).as("n_lines"),
          when(Text.c4CleanLines(col("__d")) === "", lit(0L))
            .otherwise(size(split(Text.c4CleanLines(col("__d")), "\n"))
              .cast(LongType)).as("n_kept"))
    }),
    // G55: HTML → visible text over a synthesized page wrapping each doc —
    // uppercase multiline <SCRIPT> (with a '<' in its body), <style>,
    // comments, entities (incl. the &amp;-last no-double-decode order),
    // whitespace collapse. The oracle replays the identical regex chain.
    "q_html_text" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id"),
        Text.htmlToText(syntheticHtml).as("clean"))),
    // G55: markup-shape stats (tag/link/script counts, visible-text
    // fraction) — the filter signals read before extraction
    "q_html_stats" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id") +: Text.htmlStats(syntheticHtml): _*)),
    // G55 flagship: the WEB-INGEST pipeline in one query — page →
    // htmlToText → NFC normalize → exact dedup on the EXTRACTED text
    // (markup variants of the same content collapse — the page wrapper
    // here carries no doc-unique markup precisely so real duplicate text
    // still collapses after extraction) → language ID + token count on
    // survivors. One corpus scan feeds the whole projection chain; the
    // only corpus-sized exchange is the dedup hash aggregate.
    "q_web_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      // the same content crawled twice under DIFFERENT markup (the
      // motivating case: raw-URL/raw-HTML dedup misses these; dedup on
      // the EXTRACTED text collapses them)
      val pageA = concat(lit("<html><body><script>track();</script><p>"),
        col("text"), lit(" &amp; tail</p><a href=\"/x\">next</a></body></html>"))
      val pageB = concat(lit("<div class=\"main\"><style>p{}</style>\n<p>"),
        col("text"), lit("&nbsp;&amp; tail</p><!-- v2 --><a\nhref=\"/y\">next</a></div>"))
      // variant-B ids offset past the REAL id space (max+1, the ScaleBench
      // salting device) — a fixed constant would collide with salted
      // replica ids at high replication factors
      val off = docs.agg(max("doc_id")).head().getLong(0) + 1L
      val crawl = docs.select(col("doc_id"), pageA.as("__p"))
        .unionByName(docs.select((col("doc_id") + off).as("doc_id"),
          pageB.as("__p")))
      val enriched = crawl.select(col("doc_id"),
        Text.normalizeUnicode(Text.htmlToText(col("__p"))).as("clean"))
      val keep = Dedup.exact(enriched, "doc_id", "clean")
        .select(col("keep_id").as("doc_id"))
      enriched.join(keep, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), Text.langId(col("clean")).as("lang_pred"),
          size(Text.tokens(col("clean"))).cast(LongType).as("n_tokens"))
    }),
    // BM25 keyword search: top-10 docs for a 3-term query
    "q_bm25" -> ((s, dir) =>
      Search.bm25TopK(T(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "vector", "customer"), k = 10)
        .select(col("id").as("doc_id"), col("score"))),
    // G58: the stored LEXICAL index — postings partitioned by term bucket,
    // probed without re-scanning the corpus under the r12 GUARDED default
    // (maxDfPermille = 990): surviving terms score through the shared
    // bm25Tail bit-identically to bm25TopK (the stored-index identity the
    // other four index families pin the same way), and the oracle applies
    // the identical df·1000 <= 990·n predicate to its own dfreq
    "q_bm25_index" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_lexidx").toString
      Search.writeLexIndex(T(s, dir, "documents"), "doc_id", "text", base,
        buckets = 16)
      Search.bm25FromIndex(s, base, Seq("spark", "vector", "customer"), k = 10)
        .select(col("id").as("doc_id"), col("score"))
    }),
    // G58: stop-term guard — a query term whose df exceeds the ceiling
    // (batch: ~800‰ of these docs) is dropped from the stored terms/
    // table BEFORE its corpus-sized posting list is scanned; the cut is
    // exact and the oracle applies the identical df*1000 <= ceiling*n
    // predicate to its own dfreq, so both engines drop the same terms at
    // ANY scale factor
    "q_bm25_stopguard" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_lexidx_g").toString
      Search.writeLexIndex(T(s, dir, "documents"), "doc_id", "text", base,
        buckets = 16)
      Search.bm25FromIndex(s, base, Seq("spark", "vector", "batch"), k = 10,
          maxDfPermille = 780)
        .select(col("id").as("doc_id"), col("score"))
    }),
    // G58: postings lifecycle — retire + admit under the stored layout;
    // maintained ≡ tokenized-from-scratch over the maintained membership
    // (the oracle re-derives every posting row)
    "q_bm25_index_delta" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val base = java.nio.file.Files.createTempDirectory("graft_lexidx_d").toString
      Search.writeLexIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", base, buckets = 16)
      val (posts, _, _, _) = Search.lexIndexDelta(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", base,
        docs.filter(col("doc_id") % 13 === 0).select(col("doc_id").as("id")))
      posts.select(col("id").as("doc_id"), col("term"), col("tf"),
        col("dl"), col("bucket"))
    }),
    // G58: STREAMING lexical-index MAINTENANCE — the crawl loop for the
    // postings family (the G40 q_stream_idxmaintain device, lexical
    // edition, and the first ONLINE exerciser of the r12 safe-order
    // writeLexDelta): bootstrap the 90% generation, drain admitted docs
    // as a file stream, and per micro-batch run lexIndexDelta + the
    // atomic-swap write-back over the LIVE index. The retire set is
    // disjoint from the admitted ids and re-applied idempotently each
    // batch (anti-joins no-op once retired), so the final maintained
    // membership — (stored − retired) ∪ admitted — is identical under
    // ANY batch split and equals q_bm25_index_delta's, whose oracle this
    // query shares verbatim (postings re-derived from scratch in SQL).
    "q_stream_lexmaintain" -> ((s, dir) => withStreamShuffle(s) {
      val d = T(s, dir, "documents").select("doc_id", "text")
      val corpus = d.filter(col("doc_id") % 10 =!= 0)
      val admitted = d.filter(col("doc_id") % 10 === 0)
      val base = java.nio.file.Files.createTempDirectory("graft_stream_lxm").toString
      val inDir = s"$base/in"; val idxDir = s"$base/index"; val ckpt = s"$base/ckpt"
      Search.writeLexIndex(corpus, "doc_id", "text", idxDir, buckets = 16)
      admitted.repartition(2).write.mode("overwrite").parquet(inDir)
      // retired ⊆ stored and disjoint from admitted: %13 hits minus the
      // %10 admits — retiring S every batch is idempotent, which is what
      // makes the loop batch-split invariant
      val retired = d.filter(col("doc_id") % 13 === 0 && col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("id"))
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(admitted.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true) { (batch, _) =>
        if (!batch.isEmpty) {
          val (posts, doclens, stats, terms) = Search.lexIndexDelta(
            batch, "doc_id", "text", idxDir, retired)
          Search.writeLexDelta(idxDir, posts, doclens, stats, terms)
          graft.Caching.drain() // each delta's tracked tokenize pin
        }
      }
      q.awaitTermination()
      graft.streaming.Streams.readIndex(s, s"$idxDir/postings", recursive = false)
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("dl"),
          col("bucket").cast(LongType).as("bucket"))
    }),
    // G58: MULTI-query BM25 over the stored index — the batch-retrieval
    // shape (every query scored in one pass); per-query results are
    // bit-identical to per-call probes (spec) and the oracle replays all
    // three term sets through one rank window
    "q_bm25_many" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_lexidx_m").toString
      Search.writeLexIndex(T(s, dir, "documents"), "doc_id", "text", base,
        buckets = 16)
      import s.implicits._
      val q = bm25ManyQueries.flatMap { case (qid, ts) => ts.map(qid -> _) }
        .toDF("qid", "term")
      Search.bm25ManyFromIndex(s, base, q, "qid", "term", k = 5)
        .select(col("query_id"), col("id").as("doc_id"), col("score"),
          col("rank"))
    }),
    // G58: the STREAMING probe twin (the G47 device, lexical edition) —
    // query term-sets drain as a file stream, each micro-batch probes the
    // static stored index via foreachBatch; a query's top-k depends only
    // on its own terms + the index, so any whole-query batch split
    // appends the same rows (shares q_bm25_many's oracle)
    "q_stream_bm25probe" -> ((s, dir) => withStreamShuffle(s) {
      val base = java.nio.file.Files.createTempDirectory("graft_stream_bm").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      Search.writeLexIndex(T(s, dir, "documents"), "doc_id", "text",
        s"$base/idx", buckets = 16)
      import s.implicits._
      val q = bm25ManyQueries.flatMap { case (qid, ts) => ts.map(qid -> _) }
        .toDF("qid", "term")
      // keep each query's terms within one file ⇒ every micro-batch holds
      // whole queries
      q.repartition(2, col("qid")).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some("qid BIGINT, term STRING"),
        maxFilesPerTrigger = 1)
      val run = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true) { (batch, id) =>
        if (!batch.isEmpty)
          Search.bm25ManyFromIndex(s, s"$base/idx", batch, "qid", "term", k = 5)
            .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      run.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
        .select(col("query_id"), col("id").as("doc_id"), col("score"),
          col("rank"))
    }),
    // G56: hybrid retrieval — Reciprocal Rank Fusion of the BM25 lexical
    // top-10 and the dense cosine top-10 (query = embedding 0; doc_id and
    // vec_id share the id space at every SF). Contributions are exact
    // 1e6 div (60 + rank) BIGINTs, so the fused ranking replays in SQL.
    "q_rrf_hybrid" -> ((s, dir) => {
      val docs = T(s, dir, "documents"); val emb = T(s, dir, "embeddings")
      val dense = graft.similarity.Ann
        .bruteForceTopK(emb.filter(col("vec_id") === 0), emb,
          "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      Search.rrfFuse(Seq(lexTopKRanked(docs), dense),
          "query_id", "id", "rank", topK = 10)
        .select(col("id").as("doc_id"), col("rrf_ppm"), col("rank"))
    }),
    // G56+G59 capstone — the production retrieval stack in one query:
    // RRF-fuse the lexical BM25 top-10 with the dense POOLED
    // late-interaction top-10 (MaxSim.pooledTopK — one exact pooled dot
    // per pair), then settle the fused candidates with the exact MaxSim
    // token interaction (MaxSim.rerank — candidate-sized work: the corpus
    // semi-joins to the 10 fused ids BEFORE any gather). Lexical hits
    // outside the multi-vector sub-corpus carry no token matrix and drop
    // at the re-rank (the documented token-less contract); every stage is
    // exact integer/decimal arithmetic, so the whole stack replays in SQL.
    "q_hybrid_rerank" -> ((s, dir) => {
      val docs = T(s, dir, "documents"); val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val qToks = toks.filter(col("id") === 0)
      val dense = graft.similarity.MaxSim.pooledTopK(toks, qToks,
          "id", "pos", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      val fused = Search.rrfFuse(Seq(lexTopKRanked(docs), dense),
        "query_id", "id", "rank", topK = 10)
      graft.similarity.MaxSim.rerank(
        fused.select(col("query_id"), col("id").as("neighbor_id")),
        toks, qToks, "id", "pos", "embedding", k = 5)
    }),
    // overlapping token-window chunking (64-token windows, 50% overlap)
    "q_chunks" -> ((s, dir) =>
      Text.chunk(T(s, dir, "documents"), "doc_id", "text", 64, 32)
        .select(col("id").as("doc_id"), col("chunk_id"), col("chunk_text"),
          col("n_tokens"))),
    // benchmark decontamination: flag corpus docs sharing 5-grams with a
    // deterministic "eval set" (doc_id % 97 == 0)
    "q_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Dedup.decontaminate(docs, "doc_id", "text", bench, "text",
          k = 5, minHits = 1)
        .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
    }),
    // Bloom-prefiltered decontamination: the too-big-to-broadcast-bench
    // path (sketch probe → exact verify join). No false negatives + exact
    // verify ⇒ output identical to q_decontaminate — shares its oracle.
    "q_decontaminate_bloom" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Dedup.decontaminateBloom(docs, "doc_id", "text", bench, "text",
          k = 5, minHits = 1, fpp = 0.01)
        .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
    }),
    // WINNOWED decontamination: both sides thin to winnowing fingerprints
    // (~2/(w+1) of the k-gram volume) yet any shared run >= w+k-1 tokens
    // still shares a print — the storable-sketch cross-corpus check
    "q_decontaminate_winnow" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Dedup.decontaminateWinnow(docs, "doc_id", "text", bench, "text",
          k = 8, w = 4, minHits = 1)
        .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
    }),
    // corpus-overlap sketch (G49): KMV resemblance between two corpora —
    // two scans, two k-sized exchanges (the bounded kmv_set aggregate),
    // then 1×1 set math; no cross-corpus join exists. The k smallest
    // distinct hashes are a pure function of the shingle sets, so the
    // oracle replays with DISTINCT/ORDER BY/LIMIT per side.
    "q_corpus_overlap" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.corpusOverlap(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0),
        "text", ngram = 5, sketchK = 256)
    }),
    // equal-width histogram of order totals: bin edges from one min/max
    // fetch, binning is a projection, counting one partial-agg shuffle;
    // the oracle computes the identical IEEE double edges
    "q_histogram" -> ((s, dir) =>
      Ops.histogram(T(s, dir, "orders"), "o_totalprice", bins = 10)),
    // deterministic N-per-group sample: 3 orders per priority class by
    // md5(id) order — RNG-free, so the oracle reproduces the exact rows
    "q_sample_per_group" -> ((s, dir) =>
      Ops.sampleNPerGroup(T(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority"),
        Seq("o_orderpriority"), "o_orderkey", n = 3)),
    // STREAMING decontamination: the hygiene gate on a live ingest — the
    // bench shingle set is static (broadcasts inside every micro-batch),
    // documents arrive as a file stream, and each micro-batch runs the
    // batch decontaminate (per-doc hit counts depend only on the doc and
    // the static bench set, so any batch split appends the same rows);
    // shares q_decontaminate's oracle
    "q_stream_decontaminate" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val base = java.nio.file.Files.createTempDirectory("graft_stream_dc").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        Dedup.decontaminate(batch, "doc_id", "text", bench, "text",
            k = 5, minHits = 1)
          .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
          .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
    }),
    // STREAMING incremental near-dedup: the daily-crawl loop live — the
    // corpus LSH index is STATIC (built once, read from storage), delta
    // documents arrive as a file stream, and each micro-batch probes the
    // batch operator against the static index (a doc's verdict depends
    // only on the doc + the index, so any batch split appends the same
    // rows — the q_stream_decontaminate argument); shares
    // q_incremental_neardup's oracle
    "q_stream_incneardup" -> ((s, dir) => withStreamShuffle(s) {
      val d = T(s, dir, "documents").select("doc_id", "text")
      val delta = d.filter(col("doc_id") % 13 === 5)
      val base = java.nio.file.Files.createTempDirectory("graft_stream_inc").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val idxDir = s"$base/index"
      // the stored-index posture: write the corpus index once, probe a file
      // stream of deltas against the read-back table
      Dedup.bandKeysOf(d.filter(col("doc_id") % 13 =!= 5), "doc_id", "text",
        16, 4, 4).write.mode("overwrite").parquet(idxDir)
      val index = s.read.parquet(idxDir)
      delta.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(delta.schema.toDDL), maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        Dedup.incrementalNearDup(batch, "doc_id", "text", index, 16, 4, 4)
          .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
    }),
    // STREAMING ANN probe: the vector side of the live crawl loop —
    // query embeddings arrive as a file stream and each micro-batch
    // probes the STORED IVFPQ index (frozen model + cell-partitioned
    // codes, built once). A query's top-k depends only on the query and
    // the static index, so any batch split appends the same rows — at
    // nprobe = nlist the probe is the exhaustive ADC scan and the stream
    // shares q_pq's oracle bit for bit.
    "q_stream_annprobe" -> ((s, dir) => withStreamShuffle(s) {
      val emb = T(s, dir, "embeddings")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_annp").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val idxDir = s"$base/index"
      graft.similarity.Pq.writeIndex(emb, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, dir = idxDir, nlist = 8)
      val queries = emb.filter(col("vec_id") < 8)
      queries.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(queries.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        graft.similarity.Pq.probeIndex(batch, "vec_id", "embedding", idxDir,
            topK = 3, nprobe = 8)
          .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
        .select("query_id", "rank", "neighbor_id", "adc2")
    }),
    // STREAMING vector-index MAINTENANCE (the q_stream_lexmaintain device,
    // codes edition — with it, every index family with a delta function
    // also has its crawl loop online): admitted vectors drain as a file
    // stream; each micro-batch encodes them under the FROZEN stored model
    // (Pq.indexCodesDelta) and swap-writes the maintained code table back
    // over the live cell-partitioned layout. The retire set is disjoint
    // from the admits and idempotent per batch, so the final membership —
    // (stored − retired) ∪ admitted — is batch-split invariant and equals
    // q_ann_index_delta's, whose oracle (codebooks replayed on the 90%
    // generation, codes re-derived for the membership) this query shares.
    "q_stream_annmaintain" -> ((s, dir) => withStreamShuffle(s) {
      val emb = T(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val admitted = emb.filter(col("vec_id") % 10 === 0)
      val retired = emb.filter(col("vec_id") % 13 === 0 && col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("id"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_annm").toString
      val inDir = s"$base/in"; val idxDir = s"$base/index"; val ckpt = s"$base/ckpt"
      graft.similarity.Pq.writeIndex(corpus, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, dir = idxDir, nlist = 8)
      admitted.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(admitted.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true) { (batch, _) =>
        if (!batch.isEmpty) {
          val maintained = graft.similarity.Pq.indexCodesDelta(
            batch, "vec_id", "embedding", idxDir, retired)
          graft.operators.Sinks.swapWrite(maintained, s"$idxDir/codes",
            Seq("cell"))
        }
      }
      q.awaitTermination()
      graft.streaming.Streams.readIndex(s, s"$idxDir/codes", recursive = false)
        .select(col("id").as("vec_id"),
          element_at(col("codes"), 1).cast(LongType).as("code0"),
          element_at(col("codes"), 2).cast(LongType).as("code1"))
    }),
    // STREAMING SQ probe: the byte-code sibling of q_stream_annprobe —
    // scales are the frozen model (2·dim longs, trained once on the
    // corpus), query embeddings drain as a file stream, each micro-batch
    // scores against the static code table. A query's top-k depends only
    // on the query + the frozen (scales, corpus), so any batch split
    // appends the same rows and the stream shares q_sq_topk's oracle.
    "q_stream_sqprobe" -> ((s, dir) => withStreamShuffle(s) {
      val emb = T(s, dir, "embeddings")
      val scales = graft.similarity.Sq.trainScales(emb, "embedding", dim = 64)
      val base = java.nio.file.Files.createTempDirectory("graft_stream_sqp").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val queries = emb.filter(col("vec_id") < 8)
      queries.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(queries.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        graft.similarity.Sq.sqTopK(batch, emb, "vec_id", "embedding",
            scales, topK = 3)
          .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
        .select("query_id", "rank", "neighbor_id", "sq2")
    }),
    // STREAMING MaxSim probe: the late-interaction sibling of
    // q_stream_annprobe — the corpus token-vector table is static, query
    // token rows drain as a file stream in WHOLE-QUERY file granularity
    // (repartition BY query id — a file split mid-query would gather a
    // partial matrix; the q_bm25_many whole-term-set device). A query's
    // top-k depends only on its own tokens + the static corpus, so any
    // whole-query batch split appends the same rows and the stream shares
    // q_maxsim's oracle.
    "q_stream_maxsim" -> ((s, dir) => withStreamShuffle(s) {
      val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_ms").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val queries = toks.filter(col("id") % 20 === 0)
      queries.repartition(2, col("id")).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(queries.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        graft.similarity.MaxSim.maxSimTopK(toks, batch,
            "id", "pos", "embedding", k = 3)
          .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
        .select("query_id", "rank", "neighbor_id", "maxsim")
    }),
    // STREAMING stored-index MaxSim probe: the late-interaction leg of the
    // crawl-loop probe family (q_stream_annprobe / q_stream_sqprobe /
    // q_stream_bm25probe) — the gathered matrix layout is built ONCE on
    // disk, query token rows drain as a file stream in whole-query file
    // granularity, each micro-batch routes/screens/re-ranks against the
    // frozen index. A query's top-k depends only on its own tokens + the
    // frozen index, so any whole-query split appends the same rows and
    // the stream shares q_maxsim_index's oracle (nprobe == nlist).
    "q_stream_maxsimprobe" -> ((s, dir) => withStreamShuffle(s) {
      val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_msp").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      val idxDir = s"$base/index"
      graft.similarity.MaxSim.writeIndex(toks, "id", "pos", "embedding",
        idxDir, nlist = 8)
      val queries = toks.filter(col("id") % 20 === 0)
      queries.repartition(2, col("id")).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(queries.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true, outputMode = "append") { (batch, id) =>
        graft.similarity.MaxSim.probeIndex(batch, "id", "pos", "embedding",
            idxDir, k = 3, nprobe = 8, mShort = 8)
          .write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      s.read.parquet(s"$outDir/batch_*")
        .select("query_id", "rank", "neighbor_id", "maxsim")
    }),
    // STREAMING index MAINTENANCE: the full daily-crawl loop — per batch,
    // probe the stored index and APPEND admitted docs' band keys. The
    // streamed delta is pre-collapsed with keepCanonical (uncapped), whose
    // survivors are pairwise band-DISJOINT (distinct dup-components share
    // no band key by construction), so every admission verdict depends only
    // on the doc + the corpus index — the result is identical under ANY
    // batch split, which is what lets one SQL oracle replay the loop.
    // Output: the final maintained index (corpus keys ∪ admitted deltas').
    "q_stream_idxmaintain" -> ((s, dir) => withStreamShuffle(s) {
      val d = T(s, dir, "documents").select("doc_id", "text")
      val corpus = d.filter(col("doc_id") % 13 =!= 5)
      val delta = Dedup.keepCanonical(d.filter(col("doc_id") % 13 === 5),
        "doc_id", "text", 16, 4, 4, maxBucket = Int.MaxValue,
        metricName = "idxm_precollapse")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_idxm").toString
      val inDir = s"$base/in"; val idxDir = s"$base/index"
      val verdictDir = s"$base/verdicts"; val ckpt = s"$base/ckpt"
      Dedup.bandKeysOf(corpus, "doc_id", "text", 16, 4, 4)
        .write.mode("overwrite").parquet(idxDir)
      delta.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(delta.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.indexMaintainStream(stream, "doc_id",
        "text", idxDir, verdictDir, ckpt, 16, 4, 4)
      q.awaitTermination()
      // the maintained index = bootstrap files + per-batch subdirs
      s.read.option("recursiveFileLookup", "true").parquet(idxDir)
    }),
    // STREAMING LSH near-dup: the stateful twin of the G3 flagship path.
    // Banded minhash buckets live as keyed state — (min_id, n_members)
    // per bucket, NO member lists — and each micro-batch emits touched
    // buckets' updated state as a changelog (update mode, per-batch
    // dirs). Compaction keeps the max-n_members emission per bucket
    // (n_members strictly increases), then documents' band keys join the
    // final buckets for per-doc verdicts: canonical = min bucket-min
    // over the doc's bands, duplicate iff canonical < id. min and count
    // commute, so the result is identical under ANY batch split; the
    // oracle recomputes the same md5 band buckets in SQL.
    "q_stream_neardup" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_nd").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val buckets = graft.streaming.Streams.lshBucketsStream(stream,
        "doc_id", "text", numHashes = 16, bands = 4, rowsPerBand = 4)
      val q = graft.streaming.Streams.toForeachBatch(buckets, ckpt,
        availableNow = true, outputMode = "update") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      val finalBuckets = s.read.parquet(s"$outDir/batch_*")
        .groupBy("band", "band_key")
        .agg(max(struct(col("n_members"), col("min_id"))).as("__f"))
        .select(col("band"), col("band_key"), col("__f.min_id").as("min_id"))
      val banded = Dedup.bandedKeys(
        Dedup.minhashSignature(docs, "doc_id", "text", 16),
        bands = 4, rowsPerBand = 4)
      banded.join(finalBuckets, Seq("band", "band_key"))
        .groupBy("id")
        .agg(min("min_id").as("canonical"))
        .select(col("id").as("doc_id"), col("canonical"),
          (col("canonical") < col("id")).as("is_dup"))
    }),
    // STREAMING span dedup: span-ownership state (min (id,chunk) per hash —
    // batch-split independent) drained as a changelog, compacted by max
    // n_copies, per-doc dup fractions from a drain-time hash join; the
    // oracle is the BATCH spanDedup SQL — the stream must land on it exactly
    "q_stream_spandedup" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_sd").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val owners = graft.streaming.Streams.chunkOwnersStream(stream,
        "doc_id", "text", window = 32)
      val q = graft.streaming.Streams.toForeachBatch(owners, ckpt,
        availableNow = true, outputMode = "update") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      val finalOwners = s.read.parquet(s"$outDir/batch_*")
        .groupBy("h")
        .agg(max(struct(col("n_copies"), col("owner_id"), col("owner_chunk")))
          .as("__f"))
        .select(col("h"), col("__f.owner_id").as("owner_id"),
          col("__f.owner_chunk").as("owner_chunk"))
      Text.chunk(docs, "doc_id", "text", 32, 32)
        .select(col("id"), col("chunk_id"), md5(col("chunk_text")).as("h"))
        .join(finalOwners, Seq("h"))
        .groupBy("id").agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("owner_id") =!= col("id") ||
            col("owner_chunk") =!= col("chunk_id"), 1L).otherwise(0L))
            .as("n_dup_chunks"))
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          (col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
            .as("dup_frac"))
    }),
    // Gopher-style repetition metrics: duplicate / most-frequent bigram
    // fractions per document (the boilerplate-and-spam filter signal)
    "q_repetition" -> ((s, dir) =>
      Text.repetitionStats(T(s, dir, "documents"), "doc_id", "text", n = 2)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_distinct"),
          col("dup_frac"), col("top_frac"))),
    // span-level corpus dedup: non-overlapping 32-token chunks, first
    // corpus-wide occurrence owns the span, later copies count as dups
    "q_span_dedup" -> ((s, dir) =>
      Dedup.spanDedup(T(s, dir, "documents"), "doc_id", "text", window = 32)
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          col("dup_frac"))),
    // span dedup as a TRANSFORM: duplicated 32-token windows removed and
    // the cleaned text reassembled in chunk order (the C4 "drop repeated
    // spans" rewrite); oracle rebuilds the kept-chunk join in DuckDB
    "q_span_dedup_clean" -> ((s, dir) =>
      Dedup.spanDedupClean(T(s, dir, "documents"), "doc_id", "text", window = 32)
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          col("clean_text"))),
    // boilerplate removal: 2-token chunks appearing in >= 20 distinct docs
    // drop from EVERY document (window=2 so the tiny synthetic vocabulary
    // actually produces cross-doc repeats; production window is larger)
    "q_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateClean(T(s, dir, "documents"), "doc_id", "text",
          window = 2, minDocFreq = 20)
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_boiler_chunks"),
          col("clean_text"))),
    // URL blocklist filter: block two domains incl. their subdomains
    // (cdn.srcN.com must match a srcN.com blocklist entry via the suffix
    // chain — plain equality would miss it)
    "q_domain_filter" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents").withColumn("url",
        concat(lit("https://"),
          when(col("doc_id") % 3 === 0, lit("cdn.")).otherwise(lit("www.")),
          col("source"), lit(".com/"), col("doc_id").cast(StringType)))
      val bl = Seq("src3.com", "src7.com").toDF("domain")
      Ops.domainBlocklistFilter(docs, "doc_id", "url", bl, "domain")
        .select("doc_id", "url")
    }),
    // URL canonicalization: messy synthetic URLs (mixed-case scheme/host,
    // default ports, tracking params, fragments, trailing slashes) →
    // canonical form; the oracle replays the same RE2 regex chain
    "q_canonical_url" -> ((s, dir) => {
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("HTTP://")).otherwise(lit("https://")),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("www.")),
        col("source"), lit(".COM"),
        when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
        lit("/Path/"), col("doc_id").cast(StringType),
        when(col("doc_id") % 4 === 0, lit("/?utm_source=x&utm_medium=y"))
          .otherwise(lit("?a=1&gclid=z#frag")))
      T(s, dir, "documents").select(col("doc_id"), url.as("url"),
        graft.functions.Text.canonicalUrl(url).as("canon"))
    }),
    // per-document TF-IDF keywords (top-3, decimal-quantized ln scoring)
    "q_tfidf" -> ((s, dir) =>
      graft.similarity.Search.tfIdfKeywords(T(s, dir, "documents"), "doc_id", "text", m = 3)
        .select(col("id").as("doc_id"), col("token"), col("score"), col("rnk"))),
    // corpus vocabulary with dense frequency ranks
    "q_vocab" -> ((s, dir) =>
      graft.similarity.Search.vocabulary(T(s, dir, "documents"), "doc_id", "text")),
    // inverted index over the corpus: token → sorted postings + df; the
    // postings array flattens to a string for the cross-engine compare
    // (array reprs differ between engines; the VALUES must not)
    "q_inverted_index" -> ((s, dir) =>
      graft.similarity.Search.invertedIndex(
          T(s, dir, "documents").select(col("doc_id").cast(StringType).as("doc_id"),
            col("text")),
          "doc_id", "text", maxPostings = 1000)
        .select(col("token"),
          expr("array_join(postings, ' ')").as("postings"), col("df"))),
    // CCNet-style perplexity signal: cross-entropy under a corpus-trained
    // add-one unigram LM (outlier-high = noise, outlier-low = boilerplate)
    "q_lm_xent" -> ((s, dir) =>
      graft.functions.Lm.unigramCrossEntropy(T(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"), col("xent"))),
    // bigram perplexity: order-sensitive fluency signal (a shuffled bag of
    // the same words scores the same under the unigram LM, not this one)
    "q_lm_xent_bigram" -> ((s, dir) =>
      graft.functions.Lm.bigramCrossEntropy(T(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"), col("xent"))),
    // DSIR data selection: log importance weight toward the en subcorpus
    "q_dsir" -> ((s, dir) =>
      graft.functions.Lm.importanceWeights(T(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en")
        .select(col("id").as("doc_id"), col("n_tokens"),
          col("logw").cast("double").as("logw"))),
    // fastText-style quality classifier inference: hashing-trick features
    // (md5 mod 4096 — vocabulary-free, fixed model memory) scored against
    // a broadcast weight table; weights here are a deterministic synthetic
    // model (production ships trained ones), all-DECIMAL accumulation
    // classifier TRAINING (batch perceptron, all-BIGINT): labels from the
    // lang column, 3 fixed epochs over hashed features; the oracle unrolls
    // the same integer epochs (zero cold start → epoch 1 updates on every
    // doc), so any drift in margins/updates/bias hash-mismatches
    "q_train_classifier" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val feats = graft.functions.Lm.hashedFeatures(docs, "doc_id", "text", 512)
      val labels = docs.select(col("doc_id").as("id"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
      graft.functions.Lm.trainPerceptron(feats, labels, epochs = 3)
    }),
    "q_quality_classifier" -> ((s, dir) => {
      val dim = 4096
      val weights = s.range(dim).select(col("id").as("bucket"),
        ((col("id") * 37 % 201 - 100).cast(DecimalType(18, 6)) *
          lit(new java.math.BigDecimal("0.01"))).cast(DecimalType(18, 6)).as("weight"))
      val feats = graft.functions.Lm.hashedFeatures(
        T(s, dir, "documents"), "doc_id", "text", dim)
      graft.functions.Lm.linearScore(feats, weights, new java.math.BigDecimal("0.5"))
        .select(col("id").as("doc_id"), col("score").cast(DoubleType).as("score"),
          col("n_features"))
    }),
    // BPE training off the toy regime: 17 batched job rounds at R=32 over
    // the customer-name corpus (the richest vocabulary in the testdata —
    // documents.text has 31 distinct words and exhausts at 89 merges)
    // yield 268 merges at sf0.01. One corpus scan; a round is ONE
    // vocab-sized job + argmax fetch, not 32 — the scheduler-round-trip
    // posture a 50k-merge production run needs (at R=32 that run is ~1.6k
    // vocab-sized jobs, not 50k). maxRounds bounds rounds instead of the
    // merge count so every round wants the full R and the oracle can
    // unroll exactly 17 rounds — short early rounds (symbol diversity <
    // 64) mirror as empty SQL slots. The oracle replays the batched
    // greedy selection round for round in the same padded-string
    // representation.
    "q_bpe_merges" -> ((s, dir) =>
      graft.functions.Bpe.train(T(s, dir, "customer"), "c_name",
          nMerges = 544, mergesPerRound = 32, maxRounds = 17)._1
        .select(col("rank"), col("l"), col("r"), col("merged"), col("n"))),
    // BPE segmentation: replay the trained merges over every corpus token
    // as a chain of literal-replace projections (zero shuffles). The
    // oracle instead joins tokens to the final trained vocabulary —
    // agreement proves the projection chain ≡ the training fixpoint.
    "q_bpe_segment" -> ((s, dir) => {
      val docs = T(s, dir, "customer")
      val merges = graft.functions.Bpe.train(docs, "c_name",
          nMerges = 544, mergesPerRound = 32, maxRounds = 17)._1
        .select("l", "r").collect().map(row => (row.getString(0), row.getString(1))).toSeq
      graft.functions.Bpe.segment(docs, "c_custkey", "c_name", merges)
        .select(col("id").as("c_custkey"), col("token"),
          array_join(col("syms"), " ").as("syms_str"), col("n_syms"))
    }),
    // deterministic k-means over embeddings: md5 seeding, 2 Lloyd passes,
    // quantized components so centroid means are exact cross-engine
    "q_kmeans" -> ((s, dir) =>
      graft.similarity.Clustering.kmeans(T(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4, rounds = 2)
        .select(col("id").as("vec_id"), col("cluster"), col("dist2"))),
    // cluster-balanced DIVERSITY sample (r13): k-means assignment → a
    // deterministic per-cluster quota (md5-order N-per-group) — the
    // "subsample evenly across semantic space" training-prep op
    // (SemDeDup-style clusters, then equal representation instead of
    // frequency-proportional), composed from G29 + G23. Scale shape:
    // the Lloyd passes are G29's constant-plan jobs and the quota is
    // one partial-agg TopKStruct pass — no window sort over the corpus
    "q_cluster_sample" -> ((s, dir) => {
      val asg = graft.similarity.Clustering.kmeans(T(s, dir, "embeddings"),
          "vec_id", "embedding", k = 4, rounds = 2)
        .select(col("id").as("vec_id"), col("cluster"))
      Ops.sampleNPerGroup(asg, Seq("cluster"), "vec_id", n = 8)
    }),
    // product quantization: per-subspace k-means codebooks (m=2, k=4),
    // byte-code corpus, ADC top-k — the memory-compression ANN scale path
    "q_pq" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val cbs = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, rounds = 2)
      graft.similarity.Pq.adcTopK(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "embedding", cbs, topK = 3)
        .select("query_id", "rank", "neighbor_id", "adc2")
    }),
    // IVF-routed ADC (FAISS IVFPQ composition): coarse cells route the
    // query, PQ codes score the candidates. nprobe = nlist probes every
    // cell, so the result is EXACTLY adcTopK's — same oracle — while the
    // plan exercises the routed join (cell assignment + broadcast probe)
    // that at nprobe < nlist scans only ~nprobe/nlist of the codes.
    "q_pq_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val cbs = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, rounds = 2)
      graft.similarity.Pq.ivfAdcTopK(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "embedding", cbs, topK = 3, nlist = 8, nprobe = 8,
          trained = true)
        .select("query_id", "rank", "neighbor_id", "adc2")
    }),
    // ADC shortlist + exact re-rank (the production recall lever): search
    // wide with compressed codes (top-8 by ADC), settle the final top-3
    // with |Q|·8 exact distances. The oracle replays the same ADC
    // shortlist and the same (q·q + c·c) − 2·q·c double arithmetic.
    "q_pq_rerank" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val cbs = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, rounds = 2)
      val queries = emb.filter(col("vec_id") < 8)
      val short = graft.similarity.Pq.ivfAdcTopK(queries, emb,
        "vec_id", "embedding", cbs, topK = 8, nlist = 8, nprobe = 8)
      graft.similarity.Pq.rerank(short, queries, emb, "vec_id", "embedding",
        topK = 3)
    }),
    // G47: PERSISTENT IVFPQ index — the ANN side of the stored-index crawl
    // loop: model + cell-partitioned codes written to disk, probed from
    // disk. nprobe = nlist makes the probe ≡ the exhaustive ADC scan, so
    // the store/load round-trip shares q_pq's oracle; at nprobe < nlist
    // the cell routing prunes code PARTITIONS at file-listing time
    // (plans/ANN.md measures the pruned fraction; SourcesAnnSpec pins the
    // PartitionFilters shape)
    "q_ann_index_probe" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val idx = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
      // trained = true: the k-means coarse quantizer is the production
      // routing path (balanced cells on real distributions); at
      // nprobe = nlist the probe result is centroid-independent, so the
      // store/load identity oracle is unchanged
      graft.similarity.Pq.writeIndex(emb, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, dir = idx, nlist = 8, trained = true)
      graft.similarity.Pq.probeIndex(emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", idx, topK = 3, nprobe = 8)
        .select("query_id", "rank", "neighbor_id", "adc2")
    }),
    // OPQ-ROTATED persistent index (r9): the rotation is stored IN the
    // model and probeIndex applies it to queries automatically — build-
    // and probe-time rotation cannot drift. The oracled rotation is the
    // fixed coordinate-reversal permutation (orthonormal; MatVecMul's
    // double-accumulate narrows back to the exact permuted floats), so
    // the whole rotated train/encode/ADC replay stays bit-deterministic
    // in SQL via list_reverse; the data-derived Pca.rotation path is
    // pinned by SourcesAnnSpec's rotated-index ≡ rotated-adcTopK identity
    "q_ann_index_opq" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val idx = java.nio.file.Files.createTempDirectory("graft_pqidx_r").toString
      val rev = Array.tabulate(64, 64)((i, j) => if (j == 63 - i) 1.0 else 0.0)
      graft.similarity.Pq.writeIndex(emb, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, dir = idx, nlist = 8, rotation = Some(rev))
      graft.similarity.Pq.probeIndex(emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", idx, topK = 3, nprobe = 8)
        .select("query_id", "rank", "neighbor_id", "adc2")
    }),
    // ANN index maintenance under the FROZEN model: retire ids, encode the
    // delta with the stored codebooks, output the maintained code table —
    // the oracle re-derives every maintained code from scratch (train on
    // the 90% generation, encode the maintained membership), so
    // maintained ≡ rebuilt is checked row for row, same identity law as
    // q_index_delta / q_winnow_index_delta
    "q_ann_index_delta" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val idx = java.nio.file.Files.createTempDirectory("graft_pqidx_d").toString
      graft.similarity.Pq.writeIndex(emb.filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", dim = 64, m = 2, k = 4, dir = idx, nlist = 8)
      graft.similarity.Pq.indexCodesDelta(
          emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", idx,
          emb.filter(col("vec_id") % 13 === 0).select(col("vec_id").as("id")))
        .select(col("id").as("vec_id"),
          element_at(col("codes"), 1).cast(LongType).as("code0"),
          element_at(col("codes"), 2).cast(LongType).as("code1"))
    }),
    // SemDeDup: k-means blocks + within-cluster cosine, keep-lowest-id
    "q_semdedup" -> ((s, dir) =>
      graft.similarity.Clustering.semDedup(T(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4, tau = 0.2, rounds = 2)
        .select(col("id").as("vec_id"), col("cluster"), col("is_dup"))),
    // near-dup pairs → transitive clusters: min-label propagation to
    // fixpoint ≡ the oracle's exact transitive closure
    "q_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccard(T(s, dir, "documents"), "doc_id", "text",
        k = 3, tau = 0.5)
      Dedup.dupClusters(pairs)
        .select(col("member").as("doc_id"), col("canonical"))
    }),
    // near-dup FLAGSHIP: the full scale path in one query — zero-shuffle
    // minhash signatures → banded LSH candidates (guarded buckets) →
    // pointer-jumped connected components → keep only each cluster's
    // canonical doc (non-members keep themselves). The oracle recomputes
    // the identical pairs and closes them with a recursive CTE.
    "q_neardup_pipeline" -> ((s, dir) =>
      Dedup.keepCanonical(T(s, dir, "documents"), "doc_id", "text",
          numHashes = 16, bands = 4, rowsPerBand = 4, maxBucket = 256)
        .select(col("doc_id"), col("lang"))),
    // SOFT dedup (G50): the same near-dup clusters, but every doc kept
    // with weight_permille = 1000 div cluster-size — the downweight-not-
    // drop posture; oracle = the neardup recursive CTE + a size rollup
    "q_soft_dedup" -> ((s, dir) =>
      Dedup.softDedupWeights(T(s, dir, "documents"), "doc_id", "text",
        numHashes = 16, bands = 4, rowsPerBand = 4, maxBucket = 256)),
    // STREAMING soft dedup (G50 twin): the banded bucket state streams
    // (constant per bucket: min_id + n_members, the lshBucketsStream
    // state); at drain, STAR edges (member → bucket min) close to the
    // SAME connected components as the batch pair list — within a bucket
    // a clique and a star reach identical components — so cluster sizes
    // and weights land exactly on the batch answer (shared oracle)
    "q_stream_softdedup" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Files.createTempDirectory("graft_stream_sdw").toString
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      docs.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(docs.schema.toDDL), maxFilesPerTrigger = 1)
      val buckets = graft.streaming.Streams.lshBucketsStream(stream,
        "doc_id", "text", numHashes = 16, bands = 4, rowsPerBand = 4)
      val q = graft.streaming.Streams.toForeachBatch(buckets, ckpt,
        availableNow = true, outputMode = "update") { (batch, id) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }
      q.awaitTermination()
      // compact the changelog by max n_members, then apply the SAME
      // maxBucket=256 guard the batch operator uses — the final state
      // carries each bucket's total membership, so the drop is exact
      val finalBuckets = s.read.parquet(s"$outDir/batch_*")
        .groupBy("band", "band_key")
        .agg(max(struct(col("n_members"), col("min_id"))).as("__f"))
        .filter(col("__f.n_members") <= 256)
        .select(col("band"), col("band_key"), col("__f.min_id").as("min_id"))
      val banded = Dedup.bandedKeys(
        Dedup.minhashSignature(docs, "doc_id", "text", 16),
        bands = 4, rowsPerBand = 4)
      val edges = banded.join(finalBuckets, Seq("band", "band_key"))
        .filter(col("id") =!= col("min_id"))
        .select(col("id").as("id_a"), col("min_id").as("id_b")).distinct()
      val clusters = Dedup.dupClusters(edges)
      val sizes = clusters.groupBy("canonical").agg(count(lit(1)).as("__n"))
      val m = clusters.join(sizes, "canonical")
        .select(col("member").as("doc_id"), col("canonical"), col("__n"))
      docs.select(col("doc_id"))
        .join(m, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canonical"), col("doc_id")).as("cluster"),
          coalesce(col("__n"), lit(1L)).as("n_copies"),
          expr("1000 div coalesce(__n, 1)").as("weight_permille"))
    }),
    // CCNet perplexity buckets (G51): head/middle/tail terciles of the
    // corpus-LM cross-entropy by RANK cutoffs (ntile — all-integer, no
    // interpolated-threshold ulp hazard); bucket 0 = lowest xent = head
    "q_ccnet_buckets" -> ((s, dir) =>
      graft.functions.Lm.perplexityBuckets(T(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id").as("doc_id"), col("n_tokens"), col("xent"),
          col("bucket"))),
    // INCREMENTAL-CURATION flagship: the r6 ops composed as a daily ingest
    // run — diff the snapshots, probe only added ∪ changed against the
    // LSH index of the UNCHANGED (already-curated) corpus, token-budget
    // the surviving ingest per language. Corpus text is touched only for
    // the index build; at scale that index is read from storage
    // (q_stream_incneardup's posture) and the whole run is O(delta).
    // Within-batch dups are keepCanonical's job upstream (q_neardup_
    // pipeline); budgets truncate every language at sf0.01.
    "q_incremental_pipeline" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val old = d.filter(col("doc_id") % 11 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val diff = Ops.snapshotDiff(old, d, "doc_id", "text")
      val fresh = d.join(diff.filter(col("status").isin("added", "changed"))
        .select("id"), col("doc_id") === col("id"), "left_semi")
      val corpus = d.join(diff.filter(col("status") === "unchanged")
        .select("id"), col("doc_id") === col("id"), "left_semi")
      val index = Dedup.bandKeysOf(corpus, "doc_id", "text", 16, 4, 4)
      val probed = Dedup.incrementalNearDup(fresh, "doc_id", "text", index, 16, 4, 4)
      val keep = fresh.join(probed.filter(!col("dup_of_corpus"))
        .select("id"), col("doc_id") === col("id"), "left_semi")
      Ops.tokenBudgetSample(keep, "doc_id", "lang", "text",
        Map("en" -> 1500L, "zh" -> 500L, "es" -> 400L))
    }),
    "q_minhash" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(size(Text.tokens(col("text"))) > 0)
      Dedup.minhashSignature(docs, "doc_id", "text", 4)
        .select(col("id").as("doc_id"), col("sig")(0).as("h0"), col("sig")(1).as("h1"),
          col("sig")(2).as("h2"), col("sig")(3).as("h3"))
    }),
    "q_simhash" -> ((s, dir) => Dedup.simhash(T(s, dir, "documents"), "doc_id", "text")),
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(
        Dedup.simhash(T(s, dir, "documents"), "doc_id", "text"), maxHamming = 3)),
    "q_lsh_pairs" -> ((s, dir) => {
      val sig = Dedup.minhashSignature(T(s, dir, "documents"), "doc_id", "text", 16)
      // maxBucket=256: docs sharing a whole signature band by the hundreds
      // are exact-duplicate territory (q_dedup_exact handles them upstream);
      // capping keeps LSH at its O(n·bands) design point instead of
      // degenerating to n² inside mega-buckets.
      Dedup.lshPairs(sig, bands = 4, rowsPerBand = 4, maxBucket = 256)
    }),
    // LSH operating-point QA: measured banding recall vs exact Jaccard
    // ground truth at tau=0.5 — the bands×rows tuning report, all-integer.
    // Run on a deterministic 1/4 sample, as documented: exact Jaccard is
    // the quadratic-family ground truth and belongs on samples.
    "q_lsh_recall" -> ((s, dir) =>
      Dedup.lshRecallReport(
        T(s, dir, "documents").filter(col("doc_id") % 4 === 0),
        "doc_id", "text",
        k = 3, tau = 0.5, numHashes = 16, bands = 4, rowsPerBand = 4)),
    // incremental near-dedup: the delta (doc_id % 13 = 5) probes the LSH
    // index built over the rest of the corpus — corpus text read once
    "q_incremental_neardup" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val index = Dedup.bandKeysOf(d.filter(col("doc_id") % 13 =!= 5),
        "doc_id", "text", 16, 4, 4)
      Dedup.incrementalNearDup(d.filter(col("doc_id") % 13 === 5),
        "doc_id", "text", index, 16, 4, 4)
    }),
    // LSH-index maintenance (G40): one generation step of the daily-crawl
    // loop — retire removed/changed ids from the gen-A index, append the
    // admitted docs' band keys. The ORACLE rebuilds the gen-B index from
    // scratch in SQL: maintained ≡ rebuilt is the maintenance identity,
    // checked independently per row rather than assumed.
    "q_index_delta" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val genA = d.filter(col("doc_id") % 11 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val diff = graft.operators.Ops.snapshotDiff(genA, d, "doc_id", "text")
      val retired = diff.filter(col("status").isin("removed", "changed"))
        .select("id")
      val admitted = d.join(
        diff.filter(col("status").isin("added", "changed")).select("id"),
        col("doc_id") === col("id"), "left_semi")
      Dedup.indexDelta(Dedup.bandKeysOf(genA, "doc_id", "text", 16, 4, 4),
        admitted, "doc_id", "text", retired, 16, 4, 4)
    }),
    // incremental substring-contamination probe: the delta (doc_id % 10 = 0)
    // probes the winnow-prints index built over the rest of the corpus —
    // index streamed, delta-print set broadcast (the G40 build-side law
    // extended to the winnow family)
    "q_winnow_probe" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val index = Dedup.winnowedPrints(d.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", k = 8, w = 4)
      Dedup.winnowProbe(d.filter(col("doc_id") % 10 === 0), "doc_id", "text",
          index, k = 8, w = 4, minHits = 1)
        .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
    }),
    // prints-index maintenance: retire removed/changed ids, append admitted
    // docs' prints — the ORACLE rebuilds the gen-B prints from scratch;
    // maintained ≡ rebuilt is the maintenance identity, row for row
    "q_winnow_index_delta" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val genA = d.filter(col("doc_id") % 11 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val diff = graft.operators.Ops.snapshotDiff(genA, d, "doc_id", "text")
      val retired = diff.filter(col("status").isin("removed", "changed"))
        .select("id")
      val admitted = d.join(
        diff.filter(col("status").isin("added", "changed")).select("id"),
        col("doc_id") === col("id"), "left_semi")
      Dedup.winnowIndexDelta(
          Dedup.winnowedPrints(genA, "doc_id", "text", k = 8, w = 4),
          admitted, "doc_id", "text", retired, k = 8, w = 4)
        .select(col("id").as("doc_id"), col("pos"), col("print"))
    }),
    // STREAMING prints-index MAINTENANCE (the q_stream_lexmaintain device,
    // winnow edition — the last delta-bearing family to get its crawl
    // loop online): admitted docs drain as a file stream; each
    // micro-batch anti-joins the retire set off the LIVE prints and
    // appends its own docs' winnowed prints, swap-written back. Retire
    // set disjoint from the admits and idempotent ⇒ batch-split
    // invariant; the oracle re-derives every print of the final
    // membership from scratch.
    "q_stream_winnowmaintain" -> ((s, dir) => withStreamShuffle(s) {
      val d = T(s, dir, "documents").select("doc_id", "text")
      val stored = d.filter(col("doc_id") % 10 =!= 0)
      val admitted = d.filter(col("doc_id") % 10 === 0)
      val retired = d.filter(col("doc_id") % 13 === 0 && col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("id"))
      val base = java.nio.file.Files.createTempDirectory("graft_stream_wnm").toString
      val inDir = s"$base/in"; val idxDir = s"$base/index"; val ckpt = s"$base/ckpt"
      Dedup.winnowedPrints(stored, "doc_id", "text", k = 8, w = 4)
        .write.mode("overwrite").parquet(idxDir)
      admitted.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(admitted.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
        availableNow = true) { (batch, _) =>
        if (!batch.isEmpty) {
          // restart step: finish any swap a crashed generation stranded
          // BEFORE listing the prints dir (winnowIndexDelta takes the
          // frame, so the loop owns the read — and the recovery)
          graft.operators.Sinks.recoverSwap(s, idxDir)
          val idx = graft.streaming.Streams.readIndex(s, idxDir, recursive = false)
          graft.operators.Sinks.swapWrite(
            Dedup.winnowIndexDelta(idx, batch, "doc_id", "text", retired,
              k = 8, w = 4), idxDir)
        }
      }
      q.awaitTermination()
      graft.streaming.Streams.readIndex(s, idxDir, recursive = false)
        .select(col("id").as("doc_id"), col("pos"), col("print"))
    }),
    "q_cosine_neardup" -> ((s, dir) =>
      Dedup.cosineNearDup(
        T(s, dir, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding", 0.2)),
    // scale path: hyperplane-LSH candidates + exact cosine verify; the
    // oracle rebuilds the identical md5-derived planes in SQL
    "q_cosine_neardup_lsh" -> ((s, dir) =>
      Dedup.cosineNearDupLsh(
        T(s, dir, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding",
        tau = 0.2, dim = 64)),
    // pruned variant: stop-shingles dropped from BOTH intersections and set
    // sizes (consistent approximate Jaccard over the pruned universe)
    "q_jaccard_pruned" -> ((s, dir) =>
      Dedup.ngramJaccard(T(s, dir, "documents"), "doc_id", "text", k = 3, tau = 0.5,
        maxShingleDf = 10)),
    // lossless prefix filter (AllPairs/PPJoin): candidates only from
    // rarest-shingle prefixes, exact-verified — the high-tau scale path
    "q_jaccard_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPrefix(T(s, dir, "documents"), "doc_id", "text",
        k = 3, tau = 0.8)),
    // fuzzy short-string dedup: 2-token blocks, exact levenshtein verify
    "q_editdist" -> ((s, dir) =>
      Dedup.editDistancePairs(T(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 12, blockTokens = 2, maxBlock = 64)),
    // cross-source record linkage: part names vs a second "vendor feed"
    // (same parts, last name-word dropped) — blocked equi-join + exact
    // levenshtein verify, never a cartesian
    "q_fuzzy_join" -> ((s, dir) => {
      val l = T(s, dir, "part").select(col("p_partkey").as("l_id"),
        col("p_name").as("l_name"))
      val r = T(s, dir, "part").filter(col("p_partkey") % 20 === 0)
        .select((col("p_partkey") + 1000000).as("r_id"),
          regexp_replace(col("p_name"), " [a-z]+$", "").as("r_name"))
      Dedup.fuzzyJoin(l, r, "l_name", "r_name", maxDist = 12, blockTokens = 1)
    }),

    // ---- similarity (G6/G7) ----
    "q_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Ann.bruteForceTopK(emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 3)
        .select("query_id", "rank", "neighbor_id")
    }),
    // exhaustive IVF (nprobe == nlist) must reproduce brute-force exactly —
    // shares q_ann's oracle by construction
    "q_ann_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Ann.ivfTopK(emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 3,
          nlist = 16, nprobe = 16)
        .select("query_id", "rank", "neighbor_id")
    }),
    // G52: scalar quantization (SQ8) — per-dim affine byte codes, queries
    // answered by asymmetric distance against the reconstructions; the
    // 1 B/dim point between the float corpus and PQ's m B/vector. All-long
    // arithmetic after the quantize floor, so the oracle replays
    // train → encode → reconstruct → rank bit-for-bit
    "q_sq_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val scales = graft.similarity.Sq.trainScales(emb, "embedding", dim = 64)
      graft.similarity.Sq.sqTopK(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", scales, topK = 3)
    }),
    // exhaustive IVF-SQ (nprobe == nlist) must reproduce sqTopK exactly —
    // shares q_sq_topk's oracle by construction (the q_pq_ivf device)
    "q_sq_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val scales = graft.similarity.Sq.trainScales(emb, "embedding", dim = 64)
      graft.similarity.Sq.ivfSqTopK(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", scales, topK = 3, nlist = 16, nprobe = 16)
    }),
    // SQ shortlist + exact re-rank: the recall lever is SHARED machinery —
    // Pq.rerank is shortlist-agnostic, so byte-code search composes with
    // exact settling the same way ADC does (search wide on 1 B/dim codes,
    // pay |Q|·m exact dots, never |Q|·|C|)
    "q_sq_rerank" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val scales = graft.similarity.Sq.trainScales(emb, "embedding", dim = 64)
      val short = graft.similarity.Sq.sqTopK(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", scales, topK = 8)
      graft.similarity.Pq.rerank(short, emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", topK = 3)
    }),
    // persistent IVF-SQ index: probe at nprobe == nlist is the exhaustive
    // scan over the stored codes — the store/load round trip shares
    // q_sq_topk's oracle bit for bit (the G47 device, byte-code edition)
    "q_sq_index_probe" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val base = java.nio.file.Files.createTempDirectory("graft_sqidx_p").toString
      graft.similarity.Sq.writeIndex(emb, "vec_id", "embedding",
        dim = 64, dir = base, nlist = 16, trained = true)
      graft.similarity.Sq.probeIndex(emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", base, topK = 3, nprobe = 16)
    }),
    // IVF-SQ index maintenance under the FROZEN model: retire + encode
    // the delta with the stored scales — maintained ≡ re-encoded from
    // scratch (encoding is a deterministic projection; out-of-range delta
    // values saturate by the clamp contract, which the oracle replays).
    // Output exploded to (vec_id, pos, code) scalars for the hash compare.
    "q_sq_index_delta" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val base = java.nio.file.Files.createTempDirectory("graft_sqidx_d").toString
      graft.similarity.Sq.writeIndex(emb.filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", dim = 64, dir = base, nlist = 8)
      graft.similarity.Sq.indexCodesDelta(
          emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", base,
          emb.filter(col("vec_id") % 13 === 0).select(col("vec_id").as("id")))
        .select(col("id").as("vec_id"),
          posexplode(col("codes")).as(Seq("pos", "code")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("code").cast("long").as("code"))
    }),
    // G53: Johnson–Lindenstrauss sign projection — 64 → 16 dims with the
    // deterministic md5-parity ±1 matrix, then brute-force cosine top-k in
    // the REDUCED space; the oracle rebuilds the same matrix from the md5
    // recipe and replays projection (list_dot_product + CAST AS REAL ≡
    // MatVecMul's accumulate-then-narrow) and ranking in SQL
    "q_jl_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.similarity.Jl.jlTopK(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "embedding", dim = 64, outDim = 16, k = 3)
        .select("query_id", "rank", "neighbor_id")
    }),
    // G59: late-interaction MaxSim (ColBERT) — every 5 consecutive vec_ids
    // form one multi-vector "document" (pos = vec_id % 5); every 20th
    // document is a query. Quantized token vectors make each score an
    // EXACT BIGINT the oracle replays bit-for-bit (stronger than the
    // cosine families' order-only parity)
    "q_maxsim" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      graft.similarity.MaxSim.maxSimTopK(
        toks, toks.filter(col("id") % 20 === 0), "id", "pos", "embedding", k = 3)
    }),
    // two-stage ColBERT: SUM-pooled single-vector screen to an mShort=8
    // shortlist, exact MaxSim re-rank to top-3 — pooling, both scores and
    // both rank cuts are exact integers, so the full two-stage composition
    // replays in SQL (the Pq.rerank device at matrix granularity)
    "q_maxsim_rerank" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      graft.similarity.MaxSim.maxSimTopKPooled(
        toks, toks.filter(col("id") % 20 === 0), "id", "pos", "embedding",
        k = 3, mShort = 8)
    }),
    // PERSISTENT late-interaction index (the ColBERT gathered layout with
    // pooled-vector cell routing): build once — the corpus gather exchange
    // paid at build time — probe with nprobe == nlist, so the result is
    // exactly the two-stage pooled composition over the indexed corpus and
    // q_maxsim_rerank's oracle replays it bit-for-bit (Pq.probeIndex's
    // identity law at matrix granularity)
    "q_maxsim_index" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val idx = java.nio.file.Files.createTempDirectory("graft_msidx").toString
      graft.similarity.MaxSim.writeIndex(toks, "id", "pos", "embedding",
        idx, nlist = 8, trained = true)
      graft.similarity.MaxSim.probeIndex(toks.filter(col("id") % 20 === 0),
        "id", "pos", "embedding", idx, k = 3, nprobe = 8, mShort = 8)
    }),
    // G59 at-scale composition (the scaladoc promise made real): when |Q|
    // outgrows the broadcast budget, candidates come from a stored
    // single-vector index over the TOKEN vectors (G47) — each query token
    // probes for its nearest corpus tokens, hits vote per document, and
    // exact MaxSim settles only the top-voted candidates (Pq.rerank's
    // recall lever at matrix granularity). nprobe = nlist keeps the probe
    // ≡ exhaustive ADC, so the trained-centroid routing needs no SQL
    // replay while the full plumbing (stored index, probe, votes, rerank)
    // runs for real.
    "q_maxsim_ann_candidates" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val idx = java.nio.file.Files.createTempDirectory("graft_mscand").toString
      graft.similarity.Pq.writeIndex(emb, "vec_id", "embedding",
        dim = 64, m = 2, k = 4, dir = idx, nlist = 8, trained = true)
      val qTokVecs = emb.filter(expr("vec_id DIV 5 % 20 = 0"))
      val hits = graft.similarity.Pq.probeIndex(qTokVecs, "vec_id",
        "embedding", idx, topK = 5, nprobe = 8)
      val cand = graft.similarity.MaxSim.voteCandidates(
        hits.select(expr("query_id DIV 5").as("query_id"),
          expr("neighbor_id DIV 5").as("neighbor_id")), topN = 8)
      graft.similarity.MaxSim.rerank(cand, toks,
        toks.filter(col("id") % 20 === 0), "id", "pos", "embedding", k = 3)
    }),
    // MaxSim index maintenance under the FROZEN model: retire ids, gather +
    // pool + route the admitted docs with the stored scale/centroids — the
    // index builds with the TRAINED coarse quantizer (the r12 default),
    // whose k-means means are not SQL-replayable, so the oracle reads the
    // centroids back from the stored model/coarse parquet (the model IS
    // the frozen contract) and re-derives everything else from scratch
    // (cosine routing, token counts, exact Frobenius digests): maintained
    // ≡ rebuilt-under-the-stored-model is checked row for row (the
    // q_ann_index_delta identity at matrix granularity)
    "q_maxsim_index_delta" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val idx = java.nio.file.Files.createTempDirectory("graft_msidx_d").toString
      msIdxDeltaDir.set(idx) // the oracle replay reads model/coarse here
      graft.similarity.MaxSim.writeIndex(toks.filter(col("id") % 10 =!= 0),
        "id", "pos", "embedding", idx, nlist = 8)
      graft.similarity.MaxSim.indexMatsDelta(
          toks.filter(col("id") % 10 === 0), "id", "pos", "embedding", idx,
          toks.filter(col("id") % 13 === 0).select(col("id")))
        .select(col("id"), col("cell"),
          size(col("mat")).cast(LongType).as("ntoks"),
          aggregate(col("mat"), lit(0.0), (acc, r) =>
            acc + aggregate(r, lit(0.0), (a, x) => a + x * x))
            .cast(LongType).as("fro"))
    }),
    // G45: cross-corpus margin-ratio mining (Artetxe–Schwenk) — even ids
    // mine their best partner among odd ids; the margin RATIO (cos over the
    // mean of both rows' k-NN neighborhoods) suppresses hub vectors that a
    // raw cosine threshold would mis-mine
    "q_margin_mine" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.similarity.Mine.marginMine(
        emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.01)
    }),
    // mutual variant: a pair survives only if it is margin-best in BOTH
    // directions — the high-precision setting of the original recipe
    "q_margin_mutual" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.similarity.Mine.marginMine(
        emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.01, mutual = true)
    }),
    // IVF-routed candidate generation with nprobe == nlist probes every
    // cell, so the mined pairs are EXACTLY q_margin_mine's (shared oracle)
    // while the plan exercises the routed join that at scale scans only
    // ~nprobe/nlist of each corpus
    "q_margin_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.similarity.Mine.marginMineIvf(
        emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.01, nlist = 16, nprobe = 16)
    }),
    // STREAMING margin mining (r9): the new-snapshot embeddings arrive as
    // a file stream; each micro-batch writes its exact forward top-k plus
    // mergeable backward candidates (files-as-state), and the drain-side
    // finish k-merges the backward lists and runs the shared margin
    // projection — identical to the batch operator under ANY batch split,
    // so it shares q_margin_mine's oracle
    "q_stream_marginmine" -> ((s, dir) => withStreamShuffle(s) {
      val emb = T(s, dir, "embeddings")
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 === 1)
      val base = java.nio.file.Files.createTempDirectory("graft_stream_mm").toString
      val inDir = s"$base/in"; val workDir = s"$base/work"; val ckpt = s"$base/ckpt"
      src.repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some(src.schema.toDDL),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.marginMineStream(stream, tgt,
        "vec_id", "embedding", k = 4, workDir, ckpt)
      q.awaitTermination()
      graft.streaming.Streams.marginMineFinish(s, workDir, k = 4, tau = 1.01)
    }),
    // STREAMING corpus-overlap (r9): side A arrives as a file stream;
    // each micro-batch writes its own KMV sketch (files-as-state), the
    // drain re-merges them (KMV mergeability ⇒ bit-identical to sketching
    // the whole corpus), then the overlap statistics vs batch-sketched B
    // — shares q_corpus_overlap's oracle under ANY batch split
    "q_stream_corpusoverlap" -> ((s, dir) => withStreamShuffle(s) {
      val docs = T(s, dir, "documents")
      val a = docs.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")
      val b = docs.filter(col("doc_id") % 3 === 0)
      val base = java.nio.file.Files.createTempDirectory("graft_stream_ov").toString
      val inDir = s"$base/in"; val workDir = s"$base/work"; val ckpt = s"$base/ckpt"
      a.repartition(3).write.mode("overwrite").parquet(inDir)
      val stream = graft.streaming.Streams.watchDirectory(s, inDir,
        format = "parquet", schemaDdl = Some("doc_id BIGINT, text STRING"),
        maxFilesPerTrigger = 1)
      val q = graft.streaming.Streams.kmvSketchStream(stream, "text", workDir,
        ckpt, ngram = 5, sketchK = 256)
      q.awaitTermination()
      Dedup.corpusOverlapFromSketches(
        graft.streaming.Streams.kmvSketchFinish(s, workDir, 256),
        Dedup.kmvShingleSketch(b, "text", 5, 256), 256)
    }),
    // G48: the PCA/OPQ input — the embedding scatter matrix as EXACT
    // integer sums (floor-quantized components), one corpus pass through
    // a d²-long aggregate buffer; the oracle replays the same quantized
    // products and integer sums, so the hash matches at any partitioning
    "q_gram" -> ((s, dir) =>
      graft.similarity.Pca.gram(T(s, dir, "embeddings"), "embedding", dim = 64)),
    // G46: k-center greedy (farthest-point) diversity selection — k corpus
    // scans against literal centers, zero corpus shuffle; radius traces the
    // coverage objective
    "q_kcenter" -> ((s, dir) =>
      graft.similarity.Clustering.kCenterGreedy(
        T(s, dir, "embeddings"), "vec_id", "embedding", k = 4)),
    // salted two-phase agg must equal the direct group-by (skew path)
    "q_salted_agg" -> ((s, dir) =>
      Ops.saltedAgg(T(s, dir, "lineitem"), Seq("l_returnflag"), Seq(
          (sum(dec(col("l_quantity"))).as("sq"), "sq", "sum"),
          (count(lit(1)).as("n_rows"), "n_rows", "count"),
          (min(col("l_quantity")).as("min_qty"), "min_qty", "min"),
          (max(col("l_quantity")).as("max_qty"), "max_qty", "max")),
          saltBuckets = 8)
        .select(col("l_returnflag"), col("sq").cast(DoubleType).as("sum_qty"),
          col("n_rows"), col("min_qty"), col("max_qty"))),

    // ---- training-data assembly (G13/G14) ----
    // sequence packing: contiguous token-budget bins per language (one
    // shuffle; see Ops.packByBudget for the global-order caveat)
    "q_pack" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(Text.tokens(col("text"))).cast(LongType).as("n_tokens"))
      Ops.packByBudget(docs, Seq("lang"), Seq("doc_id"), "n_tokens", 1000L)
        .select("doc_id", "lang", "n_tokens", "bin_id")
    }),
    // deterministic weighted sampling: keep probability ∝ token count
    "q_weighted_sample" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(Text.tokens(col("text"))).cast(LongType).as("n_tokens"))
        .withColumn("p", col("n_tokens").cast(DoubleType) / 500.0)
      Ops.weightedSample(d, "doc_id", "p").select("doc_id", "lang", "n_tokens")
    }),
    // reproducible 90/10 train-val split: md5-derived bucket, no RNG state
    "q_split" -> ((s, dir) =>
      Ops.hashSplit(T(s, dir, "documents"), "doc_id", 90)
        .select("doc_id", "lang", "split")),
    // per-language token-count quartiles (exact interpolated percentile;
    // the quality-threshold primitive)
    "q_quantiles" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("lang"),
        size(Text.tokens(col("text"))).cast(DoubleType).as("nt"))
      Ops.percentiles(d, Seq("lang"), "nt",
        Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
    }),
    // threshold filtering: keep docs above their language's p25 token count —
    // the thresholds table is group-count sized, so it BROADCASTS and the
    // filter costs one map-side join, no extra shuffle of the corpus
    "q_quality_filter" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(Text.tokens(col("text"))).cast(DoubleType).as("nt"))
      val th = Ops.percentiles(d, Seq("lang"), "nt", Seq(0.25 -> "p25"))
      d.join(broadcast(th), "lang")
        .filter(col("nt") > col("p25")).select("doc_id", "lang")
    }),

    // flagship composition — the full training-data prep flow in library
    // ops: per-language quality floor (broadcast threshold) → exact dedup
    // (keep min id) → reproducible train split → per-language sequence
    // packing. One corpus scan feeds it; the only corpus-sized shuffles are
    // the dedup group-by and the packing window.
    "q_llm_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"),
        size(Text.tokens(col("text"))).cast(LongType).as("n_tokens"))
      val th = Ops.percentiles(
        docs.select(col("lang"), col("n_tokens").cast(DoubleType).as("nt")),
        Seq("lang"), "nt", Seq(0.25 -> "p25"))
      val q = docs.join(broadcast(th), "lang")
        .filter(col("n_tokens").cast(DoubleType) > col("p25"))
      val keep = Dedup.exact(q, "doc_id", "text").select(col("keep_id").as("doc_id"))
      val d = q.join(keep, "doc_id")
      val tr = Ops.hashSplit(d, "doc_id", 90).filter(col("split") === "train")
      Ops.packByBudget(tr, Seq("lang"), Seq("doc_id"), "n_tokens", 1000L)
        .select("doc_id", "lang", "n_tokens", "bin_id")
    }),

    // ---- text analysis (G8-G11) ----
    "q_langid" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))),
    "q_quality" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id") +: Text.qualityFeatures(col("text")): _*)),
    "q_tokens" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id") +: Text.tokenStats(col("text")): _*)),
    // corpus DATA CARD (r13): the per-language rollup a training run's
    // datasheet needs — docs, exact-dup count, char/token totals, and
    // derived ratios — in ONE aggregation pass over per-row projections
    // (langid + tokenStats + md5 are all codegen; no join: copies of a
    // text share the text, hence the language, so per-lang dup count is
    // n_docs − distinct hashes). Ratios divide two EXACT integers once,
    // so the doubles are engine-identical (the SURVEY §6 int÷int rule);
    // scale shape: one partial-agged groupBy(lang) with a distinct-count
    // expansion — no window, no collect
    "q_corpus_report" -> ((s, dir) => {
      val per = T(s, dir, "documents").select(
        Seq(md5(col("text")).as("h"), Text.langId(col("text")).as("lang")) ++
          Text.tokenStats(col("text")): _*)
      per.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          (count(lit(1)) - countDistinct(col("h"))).as("n_dup_docs"),
          sum("n_chars").as("total_chars"),
          sum("n_ws_tokens").as("total_ws_tokens"),
          sum("n_bpeish_tokens").as("total_bpeish_tokens"))
        .select(col("lang"), col("n_docs"), col("n_dup_docs"),
          col("total_chars"), col("total_ws_tokens"),
          col("total_bpeish_tokens"),
          (col("n_dup_docs").cast(DoubleType) /
            col("n_docs").cast(DoubleType)).as("dup_ratio"),
          (col("total_ws_tokens").cast(DoubleType) /
            col("n_docs").cast(DoubleType)).as("ws_tokens_per_doc"))
    }),
    "q_fingerprint" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))),
    // Pure-SQL front end through the correctness gate: a config/notebook
    // user's stopword count written as the natural HOF shape. In a
    // GraftSession/Verify session the FuseCountInSet rule rewrites it to
    // the native fused expression (SqlExtensionsSpec pins the plan); in a
    // vanilla session the HOF form computes the same values — the rule is
    // a pure performance rewrite, never a correctness dependency.
    "q_sql_stopwords" -> ((s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("graft_sql_docs")
      s.sql(
        """SELECT doc_id,
          |  CAST(size(filter(toks, t ->
          |    array_contains(array('the', 'and', 'of', 'to', 'a', 'in'), t)))
          |    AS BIGINT) AS n_stop,
          |  CAST(size(toks) AS BIGINT) AS n_toks
          |FROM (SELECT doc_id, filter(split(text, ' '), t -> t <> '') AS toks
          |      FROM graft_sql_docs)""".stripMargin)
    })
  )

  // ---------------------------------------------------------------------
  // oracle SQL (DuckDB) — must match queries' column names & exact values
  // ---------------------------------------------------------------------

  /** Shared SQL fragments, kept in one place so Spark/DuckDB stay in sync. */
  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** DuckDB replay of [[graft.functions.Text.tokenStats]] — ONE spelling,
    * shared by q_tokens and the q_corpus_report rollup (the per-doc
    * integers the report sums are exactly these).
    */
  private val tokenStatsOracle: String =
    s"""SELECT doc_id,
       | CAST(length(text) AS BIGINT) AS n_chars,
       | CAST(len($toksSql) AS BIGINT) AS n_ws_tokens,
       | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish_tokens
       |FROM documents""".stripMargin

  // shared by q_substring_dedup and its streaming twin: sliding 16-token
  // window ownership + gaps-and-islands maximal-span merge, per-doc rollup
  private lazy val substringDedupOracle: String =
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
       |agg AS (SELECT doc_id, COUNT(*) AS n_dup_spans, CAST(SUM(e - s) AS BIGINT) AS dup_tokens
       |        FROM sp GROUP BY 1)
       |SELECT b.doc_id, b.n_tokens,
       |  CAST(COALESCE(a.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       |  CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CASE WHEN b.n_tokens > 0
       |       THEN CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
       |       ELSE 0.0 END AS dup_frac
       |FROM base b LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Heavy-hitters oracle — shared by q_heavy_hitters (sketch candidates +
    * exact verify ≡ the full GROUP BY) and its streaming twin (running
    * counts compact exactly; the threshold applies at drain).
    */
  private lazy val heavyHittersOracle: String =
    s"""WITH tk AS (SELECT unnest($toksSql) AS value FROM documents),
       |n AS (SELECT COUNT(*) AS n FROM tk)
       |SELECT value, COUNT(*) AS cnt FROM tk CROSS JOIN n
       |GROUP BY value, n.n HAVING COUNT(*) * 1000 > n.n * 33""".stripMargin

  /** Winnowed-dedup oracle — shared by q_winnow and its streaming twin
    * (per-print min-(id, pos) ownership commutes, so the drained changelog
    * compacts to the batch answer exactly).
    */
  private lazy val winnowOracle: String =
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
       |pr AS (SELECT doc_id, CAST(p AS BIGINT) AS pos, hs[CAST(p + 1 AS INT)] AS print FROM pr0),
       |o AS (SELECT doc_id, pos,
       |      row_number() OVER (PARTITION BY print ORDER BY doc_id, pos) AS rn FROM pr),
       |agg AS (SELECT doc_id, COUNT(*) AS n_prints,
       |        CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_prints
       |        FROM o GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(COALESCE(a.n_prints, 0) AS BIGINT) AS n_prints,
       |  CAST(COALESCE(a.n_dup_prints, 0) AS BIGINT) AS n_dup_prints,
       |  CASE WHEN COALESCE(a.n_prints, 0) > 0
       |       THEN CAST(a.n_dup_prints AS DOUBLE) / CAST(a.n_prints AS DOUBLE)
       |       ELSE 0.0 END AS dup_frac
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** G49 corpus-overlap oracle — shared by the batch operator and its
    * streaming twin (KMV mergeability ⇒ the drained sketch is the batch
    * sketch). The k smallest DISTINCT shingle hashes per side are a pure
    * function of the shingle sets, so DISTINCT/ORDER BY/LIMIT reproduces
    * the bounded KmvSet aggregate bit-for-bit.
    */
  private lazy val corpusOverlapOracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(range(0, len(tk) - 4),
       |       i -> array_to_string(list_slice(tk, CAST(i + 1 AS INT), CAST(i + 5 AS INT)), ' '))) AS s
       |       FROM toks WHERE len(tk) >= 5),
       |h AS (SELECT doc_id, ('0x' || substring(md5(s), 1, 15))::BIGINT AS h FROM sh),
       |ka AS (SELECT DISTINCT h FROM h WHERE doc_id % 3 <> 0 ORDER BY h LIMIT 256),
       |kb AS (SELECT DISTINCT h FROM h WHERE doc_id % 3 = 0 ORDER BY h LIMIT 256),
       |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) u ORDER BY h LIMIT 256),
       |m AS (SELECT
       |  (SELECT COUNT(*) FROM ku) AS k_used,
       |  (SELECT COUNT(*) FROM ku k JOIN ka a ON k.h = a.h) AS m_a,
       |  (SELECT COUNT(*) FROM ku k JOIN kb b ON k.h = b.h) AS m_b,
       |  (SELECT COUNT(*) FROM ku k JOIN ka a ON k.h = a.h JOIN kb b ON k.h = b.h) AS m_both,
       |  (SELECT MAX(h) FROM ku) AS vk)
       |SELECT CAST(k_used AS BIGINT) AS k_used,
       |  CAST(m_both AS BIGINT) AS m_both,
       |  CAST(m_a AS BIGINT) AS m_a,
       |  CAST(m_b AS BIGINT) AS m_b,
       |  CAST(CASE WHEN k_used > 0 THEN m_both * 1000 // k_used ELSE 0 END AS BIGINT) AS jaccard_permille,
       |  CAST(CASE WHEN m_a > 0 THEN m_both * 1000 // m_a ELSE 0 END AS BIGINT) AS containment_a_permille,
       |  CAST(CASE WHEN m_b > 0 THEN m_both * 1000 // m_b ELSE 0 END AS BIGINT) AS containment_b_permille,
       |  CAST(CASE WHEN k_used < 256 THEN k_used
       |       ELSE CAST(floor((255.0 * 1152921504606846976.0) / CAST(vk AS DOUBLE)) AS BIGINT) END AS BIGINT) AS d_union_est
       |FROM m""".stripMargin

  /** Decontamination oracle — shared verbatim by q_decontaminate, its Bloom
    * scale path (no false negatives + exact verify ⇒ identical output), and
    * the streaming twin (per-doc counts depend only on doc + static bench).
    */
  private lazy val decontaminateOracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |csh AS (SELECT DISTINCT doc_id,
       |        unnest(list_transform(range(0, len(tk) - 4),
       |               i -> array_to_string(list_slice(tk, i + 1, i + 5), ' '))) AS shingle
       |        FROM toks WHERE len(tk) >= 5),
       |bsh AS (SELECT DISTINCT shingle FROM csh WHERE doc_id % 97 = 0),
       |hits AS (SELECT c.doc_id, COUNT(*) AS n_hits
       |         FROM csh c JOIN bsh USING (shingle) GROUP BY 1)
       |SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       |       COALESCE(h.n_hits, 0) >= 1 AS contaminated
       |FROM documents d LEFT JOIN hits h USING (doc_id)""".stripMargin
  private def stopIn(words: Seq[String]) = words.map(w => s"'$w'").mkString("(", ", ", ")")
  private def langScore(words: Seq[String]) =
    s"CAST(len(list_filter(tk, t -> t IN ${stopIn(words)})) AS DOUBLE) / " +
      "CAST(greatest(len(tk), 1) AS DOUBLE)"

  private val simhashOracle: String = {
    val sums = (0 until 60).map(b =>
      s"SUM(CASE WHEN (h & ${1L << b}) <> 0 THEN 1 ELSE 0 END) AS v$b").mkString(", ")
    val fp = (0 until 60).map(b =>
      s"(CASE WHEN v$b * 2 > n THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM documents),
       |h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM t),
       |v AS (SELECT doc_id, COUNT(*) AS n, $sums FROM h GROUP BY doc_id)
       |SELECT doc_id AS id, CAST($fp AS BIGINT) AS simhash FROM v""".stripMargin
  }

  /** DuckDB replay of BATCHED BPE training (q_bpe_merges): the CTE chain
    * unrolls `bpeRounds` job rounds of `bpeMergesPerRound` merges each —
    * pair counts from the padded-string segmentation, then the greedy
    * top-R SYMBOL-DISJOINT selection down the (n DESC, l, r) order (each
    * slot's scalar CTE excludes every symbol used by earlier slots of the
    * same round), then the R literal replaces nested in selection order —
    * exactly the rounds [[graft.functions.Bpe.train]] runs with
    * mergesPerRound = R and maxRounds = `bpeRounds`. Per round, the
    * greedy SYMBOL-DISJOINT selection is ONE recursive CTE (each step a
    * LATERAL argmin over the pair table excluding the accumulated `used`
    * symbol list — no candidate left ends the recursion, mirroring a
    * short round), and the R replaces apply through a second recursive
    * CTE stepping slot by slot (a LEFT JOIN per step so an empty slot is
    * a no-op). Both the SQL text and its expression depth are LINEAR in
    * rounds and CONSTANT in R — the r5 form inlined every earlier slot's
    * exclusion into every later one and nested all R replaces in one
    * expression, which at R=32 blew DuckDB's default 1000 expression-depth
    * limit and cost 78 s; this form binds in default config and runs in
    * ~2 s. Corpus = customer names (the richest vocabulary in the
    * testdata — 268 merges at sf0.01; documents.text exhausts at 89
    * merges). `bpeRounds` × `bpeMergesPerRound` must match the q_bpe_*
    * entries.
    */
  private val bpeRounds = 17
  private val bpeMergesPerRound = 32
  private val bpeVocabCtes: String = {
    val R = bpeMergesPerRound
    val sb = new StringBuilder
    sb.append(
      s"""w AS MATERIALIZED (SELECT tok AS word, COUNT(*) AS cnt
         |      FROM (SELECT unnest(list_filter(string_split(c_name, ' '), t -> t <> '')) AS tok
         |            FROM customer) GROUP BY 1),
         |v0 AS MATERIALIZED (SELECT word, cnt,
         |       ' ' || array_to_string(list_transform(range(1, len(word) + 1),
         |                i -> substring(word, i, 1)), '  ') || ' ' AS syms
         |       FROM w)""".stripMargin)
    for (i <- 1 to bpeRounds) {
      sb.append(
        s""",
           |p$i AS MATERIALIZED (SELECT p.l AS l, p.r AS r, SUM(cnt) AS n FROM (
           |        SELECT cnt, unnest(list_transform(range(0, len(s) - 1),
           |               i -> {'l': s[i + 1], 'r': s[i + 2]})) AS p
           |        FROM (SELECT cnt, string_split(trim(syms), '  ') AS s FROM v${i - 1})
           |       ) GROUP BY 1, 2),
           |sel$i AS MATERIALIZED (
           |  WITH RECURSIVE g(slot, l, r, n, used) AS (
           |    SELECT 1, l, r, n, [l, r]
           |    FROM (SELECT * FROM p$i ORDER BY n DESC, l, r LIMIT 1)
           |    UNION ALL
           |    SELECT g.slot + 1, c.l, c.r, c.n, g.used || [c.l, c.r]
           |    FROM g, LATERAL (SELECT l, r, n FROM p$i
           |             WHERE NOT list_contains(g.used, l)
           |               AND NOT list_contains(g.used, r)
           |             ORDER BY n DESC, l, r LIMIT 1) c
           |    WHERE g.slot < $R
           |  ) SELECT slot, l, r, n FROM g),
           |v$i AS MATERIALIZED (
           |  WITH RECURSIVE a(j, word, cnt, syms) AS (
           |    SELECT 0, word, cnt, syms FROM v${i - 1}
           |    UNION ALL
           |    SELECT a.j + 1, a.word, a.cnt,
           |           CASE WHEN s.l IS NULL THEN a.syms
           |                ELSE replace(a.syms, ' ' || s.l || '  ' || s.r || ' ',
           |                             ' ' || s.l || s.r || ' ') END
           |    FROM a LEFT JOIN sel$i s ON s.slot = a.j + 1
           |    WHERE a.j < $R
           |  ) SELECT word, cnt, syms FROM a WHERE j = $R)""".stripMargin)
    }
    sb.toString
  }
  private val bpeMergesOracle: String = {
    val slots = (1 to bpeRounds)
      .map(i => s"SELECT $i AS round, slot, l, r, n FROM sel$i")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE $bpeVocabCtes
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY round, slot) AS BIGINT) AS rank,
       |       l, r, l || r AS merged, CAST(n AS BIGINT) AS n
       |FROM ($slots)""".stripMargin
  }
  private val bpeSegmentOracle: String =
    s"""WITH RECURSIVE $bpeVocabCtes,
       |tok AS (SELECT c_custkey, unnest(list_filter(string_split(c_name, ' '), t -> t <> '')) AS token
       |        FROM customer)
       |SELECT c_custkey, token,
       |  array_to_string(string_split(trim(v.syms), '  '), ' ') AS syms_str,
       |  CAST(len(string_split(trim(v.syms), '  ')) AS BIGINT) AS n_syms
       |FROM tok JOIN v$bpeRounds v ON v.word = tok.token""".stripMargin

  /** DuckDB replay of batch-perceptron training (q_train_classifier): a
    * fixed-epoch unroll — each epoch derives integer margins under the
    * previous weights (LEFT joins + COALESCE so zero-feature docs and
    * never-updated buckets read 0), the misclassified set (y·(margin+bias)
    * ≤ 0 — the zero cold start makes epoch 1 update on every doc), and the
    * bucket/bias updates. All BIGINT, so the replay is bit-exact.
    */
  private val perceptronEpochs = 3
  private val perceptronDim = 512
  private val trainClassifierOracle: String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |f AS MATERIALIZED (SELECT doc_id,
         |    ('0x' || substring(md5(tok), 1, 15))::BIGINT % $perceptronDim AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
         |yy AS MATERIALIZED (SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y FROM documents),
         |w0 AS (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w FROM f),
         |b0 AS (SELECT CAST(0 AS BIGINT) AS b)""".stripMargin)
    for (i <- 1 to perceptronEpochs) {
      sb.append(
        s""",
           |m$i AS MATERIALIZED (SELECT doc_id, SUM(tf * COALESCE(w, 0)) AS m
           |     FROM f LEFT JOIN w${i - 1} USING (bucket) GROUP BY doc_id),
           |mis$i AS MATERIALIZED (SELECT yy.doc_id, yy.y FROM yy
           |     LEFT JOIN m$i USING (doc_id)
           |     WHERE y * (COALESCE(m, 0) + (SELECT b FROM b${i - 1})) <= 0),
           |u$i AS MATERIALIZED (SELECT bucket, CAST(SUM(y * tf) AS BIGINT) AS du
           |     FROM f JOIN mis$i USING (doc_id) GROUP BY bucket),
           |w$i AS MATERIALIZED (SELECT bucket, CAST(w + COALESCE(du, 0) AS BIGINT) AS w
           |     FROM w${i - 1} LEFT JOIN u$i USING (bucket)),
           |b$i AS (SELECT CAST((SELECT b FROM b${i - 1}) +
           |     COALESCE((SELECT CAST(SUM(y) AS BIGINT) FROM mis$i), 0) AS BIGINT) AS b)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT bucket, w AS weight FROM w$perceptronEpochs
         |UNION ALL SELECT CAST(-1 AS BIGINT) AS bucket, b AS weight FROM b$perceptronEpochs""".stripMargin)
    sb.toString
  }

  /** Shared SQL scaffolding for every minhash/LSH oracle: the 16
    * per-seed MIN(md5(seed:token)) aggregates and the 4-band md5 band-key
    * CASE — ONE definition so the banding scheme cannot silently drift
    * between oracles (7 copies before r7).
    */
  private val minhashMinsSql: String =
    (0 until 16).map(s => s"MIN(md5('$s:' || tok)) AS h$s").mkString(", ")
  private val bandKeySql: String = (0 until 4).map { b =>
    val cols = (b * 4 until b * 4 + 4).map(i => s"h$i").mkString(" || '|' || ")
    s"WHEN ${b} THEN md5($cols)"
  }.mkString(" ")

  /** DuckDB mirror of minhash(16) → 4-band LSH buckets (2..256) → in-bucket
    * pairs. Same md5 band keys; same maxBucket cap as q_lsh_pairs.
    */
  private val lshPairsOracle: String = {
    val mins = minhashMinsSql; val bandKey = bandKeySql
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM documents),
       |s AS (SELECT doc_id, $mins FROM t GROUP BY doc_id),
       |banded AS (SELECT doc_id, b.band,
       |           CASE b.band $bandKey END AS band_key
       |           FROM s, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |buckets AS (SELECT band, band_key, list_sort(list(doc_id)) AS ids
       |            FROM banded GROUP BY 1, 2
       |            HAVING COUNT(*) BETWEEN 2 AND 256)
       |SELECT DISTINCT x.a AS id_a, y.c AS id_b
       |FROM buckets, unnest(ids) x(a), unnest(ids) y(c) WHERE x.a < y.c""".stripMargin
  }

  /** Soft-dedup weights (q_soft_dedup and its streaming twin): the
    * [[lshPairsOracle]] pair list closed by the recursive CTE, cluster
    * sizes rolled up, every doc kept with weight_permille = 1000 // n.
    */
  private val softDedupOracle: String =
    s"""WITH RECURSIVE lp AS (SELECT id_a, id_b FROM (
       |$lshPairsOracle) q),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM lp
       |          UNION SELECT id_b, id_a FROM lp),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |canon AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical
       |          FROM reach GROUP BY src),
       |sizes AS (SELECT canonical, COUNT(*) AS n FROM canon GROUP BY canonical)
       |SELECT d.doc_id,
       |  COALESCE(c.canonical, d.doc_id) AS cluster,
       |  CAST(COALESCE(s.n, 1) AS BIGINT) AS n_copies,
       |  CAST(1000 // COALESCE(s.n, 1) AS BIGINT) AS weight_permille
       |FROM documents d
       |LEFT JOIN canon c USING (doc_id)
       |LEFT JOIN sizes s ON s.canonical = c.canonical""".stripMargin

  /** DuckDB mirror of the incremental near-dedup probe: the same
    * minhash(16) → 4-band md5 band keys as [[lshPairsOracle]], built
    * separately over the corpus (doc_id % 13 <> 5) and the delta
    * (doc_id % 13 = 5); a delta doc is dup_of_corpus iff any band key
    * joins an indexed key. No bucket cap on either side (the index is a
    * plain key set — [[graft.dedup.Dedup.bandKeysOf]] doesn't cap).
    */
  private val incrementalNearDupOracle: String = {
    val mins = minhashMinsSql; val bandKey = bandKeySql
    s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 5),
       |fresh AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 = 5),
       |ct AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM corpus),
       |cs AS (SELECT doc_id, $mins FROM ct GROUP BY doc_id),
       |cb AS (SELECT DISTINCT b.band, CASE b.band $bandKey END AS band_key
       |       FROM cs, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |ft AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM fresh),
       |fs AS (SELECT doc_id, $mins FROM ft GROUP BY doc_id),
       |fb AS (SELECT doc_id, b.band, CASE b.band $bandKey END AS band_key
       |       FROM fs, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |hit AS (SELECT DISTINCT fb.doc_id FROM fb JOIN cb USING (band, band_key))
       |SELECT f.doc_id AS id, (h.doc_id IS NOT NULL) AS dup_of_corpus
       |FROM fresh f LEFT JOIN hit h ON f.doc_id = h.doc_id""".stripMargin
  }

  /** DuckDB mirror of the LSH-index MAINTENANCE identity (q_index_delta):
    * the Spark side computes the maintained index (retire removed/changed,
    * append admitted) from the gen-A index; the oracle computes the gen-B
    * index FROM SCRATCH — the same minhash(16) → 4-band md5 keys as
    * [[lshPairsOracle]] over the full `documents` table. Equality of the
    * two is `Dedup.indexDelta`'s contract, so the oracle checks the
    * maintenance algebra itself, not a replay of the same arithmetic.
    */
  private val indexDeltaOracle: String = {
    val mins = minhashMinsSql; val bandKey = bandKeySql
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM documents),
       |s AS (SELECT doc_id, $mins FROM t GROUP BY doc_id)
       |SELECT doc_id AS id, b.band, CASE b.band $bandKey END AS band_key
       |FROM s, (SELECT unnest([0, 1, 2, 3]) AS band) b""".stripMargin
  }

  /** DuckDB mirror of the LSH recall report (q_lsh_recall): exact-Jaccard
    * ground truth (the q_jaccard shingle replay at tau=0.5) vs UNCAPPED
    * banded candidates (the q_lsh_pairs replay without the bucket cap);
    * counts and the integer permille are engine-exact.
    */
  private val lshRecallOracle: String = {
    val mins = minhashMinsSql; val bandKey = bandKeySql
    s"""WITH smp AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
       |toks AS (SELECT doc_id, $toksSql AS tk FROM smp),
       |sh AS (SELECT DISTINCT doc_id,
       |       unnest(list_transform(range(0, len(tk) - 2),
       |              i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))) AS shingle
       |       FROM toks WHERE len(tk) >= 3),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |it AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
       |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |truth AS (SELECT id_a, id_b FROM it
       |          JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |          WHERE CAST(n_inter AS DOUBLE) /
       |                CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.5),
       |mt AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM smp),
       |ms AS (SELECT doc_id, $mins FROM mt GROUP BY doc_id),
       |banded AS (SELECT doc_id, b.band, CASE b.band $bandKey END AS band_key
       |           FROM ms, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |buckets AS (SELECT band, band_key, list_sort(list(doc_id)) AS ids
       |            FROM banded GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |cand AS (SELECT DISTINCT x.a AS id_a, y.c AS id_b
       |         FROM buckets, unnest(ids) x(a), unnest(ids) y(c) WHERE x.a < y.c),
       |hit AS (SELECT t.id_a, t.id_b FROM truth t JOIN cand c
       |        ON t.id_a = c.id_a AND t.id_b = c.id_b)
       |SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       |       (SELECT COUNT(*) FROM cand) AS n_candidates,
       |       (SELECT COUNT(*) FROM hit) AS n_hit,
       |       CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 0
       |            ELSE 1000 * (SELECT COUNT(*) FROM hit) //
       |                 (SELECT COUNT(*) FROM truth) END AS recall_permille""".stripMargin
  }

  /** DuckDB mirror of the STREAMING index-maintenance loop
    * (q_stream_idxmaintain). The streamed delta is the uncapped
    * keepCanonical survivors of doc_id%13=5 — pairwise band-disjoint, so
    * admission is batch-split independent and replayable in one SQL pass:
    * delta canonical = the recursive-CTE component replay (as in
    * q_neardup_pipeline, restricted to the delta, no bucket cap);
    * a survivor is admitted iff NO band key joins the corpus index;
    * final index = corpus band keys ∪ admitted survivors' band keys.
    */
  private val streamIdxMaintainOracle: String = {
    val mins = minhashMinsSql; val bandKey = bandKeySql
    s"""WITH RECURSIVE delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 = 5),
       |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 5),
       |dt AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM delta),
       |ds AS (SELECT doc_id, $mins FROM dt GROUP BY doc_id),
       |db AS (SELECT doc_id, b.band, CASE b.band $bandKey END AS band_key
       |       FROM ds, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |pairs AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b FROM db x
       |          JOIN db y ON x.band = y.band AND x.band_key = y.band_key
       |          AND x.doc_id < y.doc_id),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (SELECT src, dst FROM edges UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |canon AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical
       |          FROM reach GROUP BY src),
       |surv AS (SELECT d.doc_id FROM delta d LEFT JOIN canon c USING (doc_id)
       |         WHERE c.canonical IS NULL OR c.canonical = d.doc_id),
       |ct AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM corpus),
       |cs AS (SELECT doc_id, $mins FROM ct GROUP BY doc_id),
       |cb AS (SELECT doc_id, b.band, CASE b.band $bandKey END AS band_key
       |       FROM cs, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |hit AS (SELECT DISTINCT sb.doc_id FROM db sb
       |        JOIN surv USING (doc_id)
       |        JOIN cb ON sb.band = cb.band AND sb.band_key = cb.band_key)
       |SELECT doc_id AS id, band, band_key FROM cb
       |UNION ALL
       |SELECT sb.doc_id AS id, sb.band, sb.band_key FROM db sb
       |JOIN surv USING (doc_id)
       |WHERE sb.doc_id NOT IN (SELECT doc_id FROM hit)""".stripMargin
  }

  /** DuckDB mirror of the r6 incremental-curation flagship
    * (q_incremental_pipeline) — the component oracles composed end to end:
    * snapshot diff = md5 full-outer join (q_snapshot_diff's replay; here
    * old = docs minus id%11=3 with texts perturbed at id%7=0, new = ALL
    * docs, so `removed` never occurs and fresh = added ∪ changed =
    * {id%11=3} ∪ {id%7=0}), probe = the band-key semi-join of
    * [[incrementalNearDupOracle]] with the index built over the UNCHANGED
    * corpus, token budget = q_token_budget's per-group cumulative-sum
    * window at en→1500/zh→500/es→400.
    */
  private val incrementalPipelineOracle: String = {
    val mins = minhashMinsSql; val bandKey = bandKeySql
    s"""WITH old AS (SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
       |  FROM documents WHERE doc_id % 11 <> 3),
       |o AS (SELECT doc_id AS id, md5(text) AS old_hash FROM old),
       |n AS (SELECT doc_id AS id, md5(text) AS new_hash FROM documents),
       |diff AS (SELECT COALESCE(o.id, n.id) AS id,
       |  CASE WHEN old_hash IS NULL THEN 'added'
       |       WHEN new_hash IS NULL THEN 'removed'
       |       WHEN old_hash = new_hash THEN 'unchanged'
       |       ELSE 'changed' END AS status
       |  FROM o FULL OUTER JOIN n ON o.id = n.id),
       |fresh AS (SELECT d.doc_id, d.text, d.lang FROM documents d
       |          JOIN diff ON diff.id = d.doc_id
       |          WHERE diff.status IN ('added', 'changed')),
       |corpus AS (SELECT d.doc_id, d.text FROM documents d
       |           JOIN diff ON diff.id = d.doc_id
       |           WHERE diff.status = 'unchanged'),
       |ct AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM corpus),
       |cs AS (SELECT doc_id, $mins FROM ct GROUP BY doc_id),
       |cb AS (SELECT DISTINCT b.band, CASE b.band $bandKey END AS band_key
       |       FROM cs, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |ft AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM fresh),
       |fs AS (SELECT doc_id, $mins FROM ft GROUP BY doc_id),
       |fb AS (SELECT doc_id, b.band, CASE b.band $bandKey END AS band_key
       |       FROM fs, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |hit AS (SELECT DISTINCT fb.doc_id FROM fb JOIN cb USING (band, band_key)),
       |keep AS (SELECT f.doc_id, f.text, f.lang FROM fresh f
       |         LEFT JOIN hit h ON f.doc_id = h.doc_id WHERE h.doc_id IS NULL),
       |c AS (SELECT doc_id AS id, lang AS grp,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR)) AS ord
       |  FROM keep WHERE lang IN ('en', 'zh', 'es')),
       |w AS (SELECT id, grp, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY grp ORDER BY ord, id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior FROM c)
       |SELECT id, grp, n_tokens FROM w WHERE prior <
       |  CASE grp WHEN 'en' THEN 1500 WHEN 'zh' THEN 500 ELSE 400 END""".stripMargin
  }

  /** DuckDB mirror of the streaming LSH bucket path (q_stream_neardup):
    * same minhash(16) → 4-band md5 buckets as [[lshPairsOracle]], but
    * UNCAPPED (the streaming state holds only (min_id, n) per bucket —
    * no member lists, so no mega-bucket hazard and no cap to mirror).
    * Canonical per doc = min doc_id over its buckets (membership includes
    * self, so canonical <= doc_id); duplicate iff canonical < doc_id.
    */
  private val streamNearDupOracle: String = {
    val mins = minhashMinsSql; val bandKey = bandKeySql
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM documents),
       |s AS (SELECT doc_id, $mins FROM t GROUP BY doc_id),
       |banded AS (SELECT doc_id, b.band,
       |           CASE b.band $bandKey END AS band_key
       |           FROM s, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |buckets AS (SELECT band, band_key, MIN(doc_id) AS min_id
       |            FROM banded GROUP BY 1, 2)
       |SELECT doc_id, MIN(min_id) AS canonical, MIN(min_id) < doc_id AS is_dup
       |FROM banded JOIN buckets USING (band, band_key) GROUP BY doc_id""".stripMargin
  }

  /** DuckDB mirror of the fake-media decode: md5-derived bytes, exact sums,
    * int÷int mean (see Multimodal.fakeMedia/fakeDecode).
    */
  private val multimodalOracle: String =
    """WITH m AS (SELECT doc_id AS id, md5('media:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
      |b AS (SELECT id, h,
      |      list_sum(list_transform(range(0, 16),
      |                i -> ('0x' || substring(h, i * 2 + 1, 2))::BIGINT)) AS md5sum
      |      FROM m)
      |SELECT id,
      | CASE (id % 3) WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'mp4' END AS format,
      | CAST(256 + (id % 64) * 16 AS INTEGER) AS n_bytes,
      | CAST((16 + id % 64) * md5sum AS BIGINT) AS byte_sum,
      | CAST((16 + id % 64) * md5sum AS DOUBLE) / CAST(256 + (id % 64) * 16 AS DOUBLE) AS mean_byte,
      | CAST(CASE WHEN id % 3 = 2 THEN (8 + id % 16 + 1) // 2 ELSE 1 END AS INTEGER) AS n_sampled
      |FROM b""".stripMargin

  /** DuckDB mirror of simhash banding: pairs sharing any 15-bit band with
    * hamming ≤ 3 (distinct, id_a < id_b). Builds on the simhash fingerprint
    * CTEs.
    */
  private val simhashPairsOracle: String = {
    val sums = (0 until 60).map(b =>
      s"SUM(CASE WHEN (h & ${1L << b}) <> 0 THEN 1 ELSE 0 END) AS v$b").mkString(", ")
    val fp = (0 until 60).map(b =>
      s"(CASE WHEN v$b * 2 > n THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM documents),
       |h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM t),
       |v AS (SELECT doc_id, COUNT(*) AS n, $sums FROM h GROUP BY doc_id),
       |f AS (SELECT doc_id AS id, CAST($fp AS BIGINT) AS fp FROM v),
       |banded AS (SELECT id, fp, b.band, (fp >> (b.band * 15)) & 32767 AS bkey
       |           FROM f, (SELECT unnest([0, 1, 2, 3]) AS band) b)
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin
  }

  /** DuckDB mirror of hyperplane-LSH cosine near-dup: identical md5-derived
    * planes (15-hex-digit prefix → [-1,1) doubles — see Ann.hyperplanes),
    * identical sign-pattern band keys, then exact cosine ≥ tau on in-bucket
    * pairs. 2^59 = 576460752303423488.
    */
  private val cosineLshOracle: String = {
    val planeExpr =
      """list_transform(range(0, 64), j ->
        | CAST(('0x' || substring(md5('42:' || CAST(p.range AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
        |  / 576460752303423488.0 - 1.0)""".stripMargin
    s"""WITH planes AS (SELECT p.range AS pid, $planeExpr AS plane FROM range(0, 8) p),
       |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 200),
       |bits AS (SELECT e.id, planes.pid,
       |         CASE WHEN list_dot_product(e.v, planes.plane) >= 0 THEN 1 ELSE 0 END AS bit
       |         FROM e, planes),
       |sig AS (SELECT id, list(bit ORDER BY pid) AS s FROM bits GROUP BY id),
       |banded AS (SELECT id, b.band,
       |           array_to_string(list_slice(s, b.band * 4 + 1, b.band * 4 + 4), ',') AS bkey
       |           FROM sig, (SELECT unnest([0, 1]) AS band) b),
       |buckets AS (SELECT band, bkey, list_sort(list(id)) AS ids
       |            FROM banded GROUP BY 1, 2 HAVING COUNT(*) > 1),
       |cand AS (SELECT DISTINCT x.a AS id_a, y.c AS id_b
       |         FROM buckets, unnest(ids) x(a), unnest(ids) y(c) WHERE x.a < y.c),
       |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
       |SELECT * FROM (
       |  SELECT id_a, id_b,
       |    CASE WHEN a.nrm * b.nrm = 0 THEN 0
       |         ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END AS cosine
       |  FROM cand JOIN n a ON a.id = id_a JOIN n b ON b.id = id_b
       |) WHERE cosine >= 0.2""".stripMargin
  }

  /** Brute-force cosine top-3; also the oracle of exhaustive IVF. */
  /** Shared CTEs for the margin-mining oracles: directional brute-force
    * top-4 lists (`ft`/`gt`), rank-pivoted neighborhood means (`fa`/`ga` —
    * the four cosines add in RANK order, replaying the operator's sorted
    * fold bit-for-bit; absent ranks COALESCE to 0.0, which is exact for a
    * double fold, so queries with fewer than k neighbors keep their mean
    * instead of going NULL and dropping out), and per-direction
    * margin-best tables (`mb`/`mb2`).
    */
  private val marginCtes: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |a AS (SELECT * FROM n WHERE vec_id % 2 = 0),
      |b AS (SELECT * FROM n WHERE vec_id % 2 = 1),
      |f AS (SELECT a.vec_id AS src, b.vec_id AS tgt,
      |      CASE WHEN a.nrm * b.nrm = 0 THEN 0
      |           ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END AS cos
      |      FROM a CROSS JOIN b),
      |fr AS (SELECT src, tgt, cos,
      |       row_number() OVER (PARTITION BY src ORDER BY cos DESC, tgt) AS rnk FROM f),
      |ft AS (SELECT * FROM fr WHERE rnk <= 4),
      |fa AS (SELECT src, (COALESCE(max(CASE WHEN rnk = 1 THEN cos END), 0.0)
      |                  + COALESCE(max(CASE WHEN rnk = 2 THEN cos END), 0.0)
      |                  + COALESCE(max(CASE WHEN rnk = 3 THEN cos END), 0.0)
      |                  + COALESCE(max(CASE WHEN rnk = 4 THEN cos END), 0.0))
      |                 / CAST(count(*) AS DOUBLE) AS avgc FROM ft GROUP BY src),
      |g AS (SELECT b.vec_id AS tgt, a.vec_id AS src,
      |      CASE WHEN b.nrm * a.nrm = 0 THEN 0
      |           ELSE list_dot_product(b.v, a.v) / (b.nrm * a.nrm) END AS cos
      |      FROM b CROSS JOIN a),
      |gr AS (SELECT tgt, src, cos,
      |       row_number() OVER (PARTITION BY tgt ORDER BY cos DESC, src) AS rnk FROM g),
      |gt AS (SELECT * FROM gr WHERE rnk <= 4),
      |ga AS (SELECT tgt, (COALESCE(max(CASE WHEN rnk = 1 THEN cos END), 0.0)
      |                  + COALESCE(max(CASE WHEN rnk = 2 THEN cos END), 0.0)
      |                  + COALESCE(max(CASE WHEN rnk = 3 THEN cos END), 0.0)
      |                  + COALESCE(max(CASE WHEN rnk = 4 THEN cos END), 0.0))
      |                 / CAST(count(*) AS DOUBLE) AS avgc FROM gt GROUP BY tgt),
      |m AS (SELECT ft.src, ft.tgt, ft.cos / ((fa.avgc + ga.avgc) / 2.0) AS mg
      |      FROM ft JOIN fa ON fa.src = ft.src JOIN ga ON ga.tgt = ft.tgt
      |      WHERE (fa.avgc + ga.avgc) / 2.0 > 0),
      |mb AS (SELECT src, tgt, mg,
      |       row_number() OVER (PARTITION BY src ORDER BY mg DESC, tgt) AS r FROM m),
      |m2 AS (SELECT gt.tgt, gt.src, gt.cos / ((ga.avgc + fa.avgc) / 2.0) AS mg
      |       FROM gt JOIN ga ON ga.tgt = gt.tgt JOIN fa ON fa.src = gt.src
      |       WHERE (ga.avgc + fa.avgc) / 2.0 > 0),
      |mb2 AS (SELECT tgt, src, mg,
      |        row_number() OVER (PARTITION BY tgt ORDER BY mg DESC, src) AS r FROM m2)""".stripMargin

  private val marginOracle: String =
    s"""$marginCtes
       |SELECT src AS src_id, tgt AS tgt_id,
       |       CAST(floor(mg * 1000000.0) AS BIGINT) AS margin_ppm
       |FROM mb WHERE r = 1 AND mg >= 1.01""".stripMargin

  private val marginMutualOracle: String =
    s"""$marginCtes
       |SELECT mb.src AS src_id, mb.tgt AS tgt_id,
       |       CAST(floor(mb.mg * 1000000.0) AS BIGINT) AS margin_ppm
       |FROM mb WHERE mb.r = 1 AND mb.mg >= 1.01
       |  AND EXISTS (SELECT 1 FROM mb2 WHERE mb2.r = 1 AND mb2.mg >= 1.01
       |              AND mb2.src = mb.src AND mb2.tgt = mb.tgt)""".stripMargin

  /** K-center greedy unrolled for k = 4: each `cN` picks the farthest row
    * (mind DESC, id) from the previous rounds' centers; distances are exact
    * integral doubles (floor-quantized vectors, same contract as
    * `kmeansCtes`), so ties and radii are engine-exact.
    */
  private val kcenterOracle: String =
    """WITH q AS (SELECT vec_id,
      |     list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1048576.0)) AS qv
      |     FROM embeddings),
      |c1 AS (SELECT vec_id, qv FROM q
      |       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
      |d1 AS (SELECT t.vec_id, t.qv, list_dot_product(t.d, t.d) AS mind
      |       FROM (SELECT q.vec_id, q.qv,
      |             list_transform(range(1, 65), i -> q.qv[i] - c1.qv[i]) AS d
      |             FROM q CROSS JOIN c1) t),
      |c2 AS (SELECT vec_id, qv, mind FROM d1 ORDER BY mind DESC, vec_id LIMIT 1),
      |d2 AS (SELECT t.vec_id, t.qv, least(t.mind, list_dot_product(t.d, t.d)) AS mind
      |       FROM (SELECT d1.vec_id, d1.qv, d1.mind,
      |             list_transform(range(1, 65), i -> d1.qv[i] - c2.qv[i]) AS d
      |             FROM d1 CROSS JOIN c2) t),
      |c3 AS (SELECT vec_id, qv, mind FROM d2 ORDER BY mind DESC, vec_id LIMIT 1),
      |d3 AS (SELECT t.vec_id, t.qv, least(t.mind, list_dot_product(t.d, t.d)) AS mind
      |       FROM (SELECT d2.vec_id, d2.qv, d2.mind,
      |             list_transform(range(1, 65), i -> d2.qv[i] - c3.qv[i]) AS d
      |             FROM d2 CROSS JOIN c3) t),
      |c4 AS (SELECT vec_id, mind FROM d3 ORDER BY mind DESC, vec_id LIMIT 1)
      |SELECT CAST(1 AS BIGINT) AS step, (SELECT vec_id FROM c1) AS center_id,
      |       CAST(NULL AS DOUBLE) AS radius
      |UNION ALL SELECT 2, (SELECT vec_id FROM c2), (SELECT mind FROM c2)
      |UNION ALL SELECT 3, (SELECT vec_id FROM c3), (SELECT mind FROM c3)
      |UNION ALL SELECT 4, (SELECT vec_id FROM c4), (SELECT mind FROM c4)""".stripMargin

  private val annOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      |s AS (SELECT query_id, neighbor_id,
      |  CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0 THEN 0
      |       ELSE list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) END AS cos
      | FROM q, c WHERE query_id <> neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM r WHERE rank <= 3""".stripMargin

  /** DuckDB replay of scalar quantization (q_sq_topk): per-dim min/max
    * scales over the quantized corpus, byte codes via clamp-then-truncating-
    * divide (every division non-negative, so `//` ≡ Java long division ≡
    * floor — the SqEncode/SqAdcDist contract), reconstructions, and the
    * exact-long squared distance. Parameters match the q_sq_topk entry:
    * dim=64, scale=2^16, queries vec_id < 8, topK=3.
    */
  private val sqScoredCtes: String =
    """WITH q AS MATERIALIZED (SELECT vec_id,
      |     list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0) AS BIGINT)) AS qv
      |     FROM embeddings),
      |poss AS (SELECT unnest(range(1, 65)) AS pos),
      |mm AS MATERIALIZED (SELECT pos, MIN(qv[pos]) AS lo, MAX(qv[pos]) - MIN(qv[pos]) AS w
      |     FROM q CROSS JOIN poss GROUP BY pos),
      |rv AS MATERIALIZED (SELECT vec_id,
      |     list(CASE WHEN w = 0 THEN lo
      |               ELSE lo + ((((least(greatest(qv[pos], lo), lo + w) - lo) * 255) // w) * w) // 255
      |          END ORDER BY pos) AS rvec
      |     FROM q CROSS JOIN poss JOIN mm USING (pos) GROUP BY vec_id),
      |scored AS (SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
      |     CAST(list_dot_product(
      |       list_transform(range(1, 65), i -> CAST(qq.qv[i] - cc.rvec[i] AS DOUBLE)),
      |       list_transform(range(1, 65), i -> CAST(qq.qv[i] - cc.rvec[i] AS DOUBLE))) AS BIGINT) AS sq2
      |     FROM (SELECT vec_id, qv FROM q WHERE vec_id < 8) qq
      |     CROSS JOIN rv cc WHERE qq.vec_id <> cc.vec_id)""".stripMargin

  private val sqOracle: String =
    s"""$sqScoredCtes
      |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, sq2 FROM (
      |  SELECT query_id, neighbor_id, sq2,
      |         row_number() OVER (PARTITION BY query_id ORDER BY sq2, neighbor_id) AS rnk
      |  FROM scored) WHERE rnk <= 3""".stripMargin

  /** SQ top-8 shortlist, then exact-L2 re-rank to top-3 — the same
    * (q·q + c·c) − 2·q·c replay as `pqRerankOracle` (the shared
    * `Pq.rerank` recall lever over an SQ shortlist).
    */
  private val sqRerankOracle: String =
    s"""$sqScoredCtes,
       |short AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sq2, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= 8),
       |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, d2 FROM (
       |  SELECT query_id, neighbor_id, d2,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY d2, neighbor_id) AS rnk
       |  FROM (SELECT sh.query_id, sh.neighbor_id,
       |        list_dot_product(qq.v, qq.v) + list_dot_product(cc.v, cc.v)
       |        - 2 * list_dot_product(qq.v, cc.v) AS d2
       |        FROM short sh JOIN ev qq ON qq.vec_id = sh.query_id
       |        JOIN ev cc ON cc.vec_id = sh.neighbor_id))
       |WHERE rnk <= 3""".stripMargin

  /** DuckDB replay of late-interaction MaxSim (q_maxsim): quantize every
    * token vector with the same floor(x·2^16) the Column API applies, take
    * per-(query, query-token, doc) maxima of the EXACT integer dots, sum
    * per (query, doc), and rank — all arithmetic integral below 2^53, so
    * the BIGINT scores hash-match bit-for-bit.
    */
  private val maxSimOracle: String =
    """WITH e AS (SELECT vec_id // 5 AS id, vec_id % 5 AS pos,
      |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 65536.0)) AS qv
      |  FROM embeddings),
      |pm AS (SELECT q.id AS query_id, q.pos AS qpos, d.id AS neighbor_id,
      |  max(CAST(list_dot_product(q.qv, d.qv) AS BIGINT)) AS m
      | FROM e q JOIN e d ON q.id % 20 = 0 AND q.id <> d.id
      | GROUP BY 1, 2, 3),
      |sc AS (SELECT query_id, neighbor_id, CAST(SUM(m) AS BIGINT) AS maxsim
      | FROM pm GROUP BY 1, 2)
      |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, maxsim FROM (
      |  SELECT query_id, neighbor_id, maxsim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY maxsim DESC, neighbor_id) AS rnk
      |  FROM sc) WHERE rnk <= 3""".stripMargin

  /** DuckDB replay of two-stage MaxSim (q_maxsim_rerank): pool by
    * per-component sums over each document's quantized token vectors
    * (the sqScoredCtes positional-subscript device), screen to the top-8
    * pooled-dot candidates, then replay the exact MaxSim interaction on
    * shortlist pairs only — every stage integral below 2^53.
    */
  private val maxSimRerankOracle: String =
    """WITH e AS MATERIALIZED (SELECT vec_id // 5 AS id, vec_id % 5 AS pos,
      |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 65536.0)) AS qv
      |  FROM embeddings),
      |pool AS (SELECT id, list(comp ORDER BY j) AS pv FROM (
      |    SELECT id, j, SUM(qv[j]) AS comp
      |    FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS j) GROUP BY id, j)
      |  GROUP BY id),
      |short AS (SELECT query_id, neighbor_id FROM (
      |    SELECT q.id AS query_id, d.id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.id
      |        ORDER BY CAST(list_dot_product(q.pv, d.pv) AS BIGINT) DESC, d.id)
      |        AS rnk
      |    FROM pool q JOIN pool d ON q.id % 20 = 0 AND q.id <> d.id)
      |  WHERE rnk <= 8),
      |pm AS (SELECT s.query_id, q.pos AS qpos, s.neighbor_id,
      |  max(CAST(list_dot_product(q.qv, d.qv) AS BIGINT)) AS m
      | FROM short s JOIN e q ON q.id = s.query_id
      |   JOIN e d ON d.id = s.neighbor_id
      | GROUP BY 1, 2, 3),
      |sc AS (SELECT query_id, neighbor_id, CAST(SUM(m) AS BIGINT) AS maxsim
      | FROM pm GROUP BY 1, 2)
      |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, maxsim FROM (
      |  SELECT query_id, neighbor_id, maxsim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY maxsim DESC, neighbor_id) AS rnk
      |  FROM sc) WHERE rnk <= 3""".stripMargin

  /** The index dir the current session's q_maxsim_index_delta run wrote —
    * the oracle replay reads the TRAINED coarse centroids back from this
    * stored model (k-means means are not SQL-replayable; the stored model
    * is the frozen contract both engines must share). [[Verify]] dumps
    * `oracleSql` AFTER running every query in the same JVM, so the path
    * is always bound by dump time; the never-written fallback keeps the
    * SQL well-formed if the map is rendered without a prior run.
    */
  private val msIdxDeltaDir = new java.util.concurrent.atomic.AtomicReference[String](
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_msidx_delta_unset")

  /** Replay of q_maxsim_index_delta's maintained matrix table: pooled
    * vectors per document (exact integer sums of the quantized token
    * components), centroids READ FROM THE STORED MODEL ([[msIdxDeltaDir]]
    * — the build trains them with k-means, which SQL cannot replay; what
    * the oracle checks is maintenance under the frozen model, and the
    * model/coarse parquet IS that model), routing = argmax cosine over
    * the pooled doubles with the (cos DESC, cent_id ASC) ProbeCells order
    * (dots are exact integers; sqrt/division are correctly-rounded IEEE
    * on both engines, so the cosines are bit-identical), membership =
    * (indexed − retired) ∪ admitted (retire applies to stored rows only:
    * `id % 13 <> 0 OR id % 10 = 0`). ntoks pins each matrix's shape and
    * fro (the exact integer Σ_tokens ⟨t,t⟩ Frobenius digest) pins its
    * content — the identity being checked is maintained ≡
    * re-gathered-from-scratch under the stored model.
    */
  private def maxSimIndexDeltaOracle: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id // 5 AS id, vec_id % 5 AS pos,
      |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 65536.0)) AS qv
      |  FROM embeddings),
      |pool AS MATERIALIZED (SELECT id, list(comp ORDER BY j) AS pv FROM (
      |    SELECT id, j, SUM(qv[j]) AS comp
      |    FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS j) GROUP BY id, j)
      |  GROUP BY id),
      |stats AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS ntoks,
      |    CAST(SUM(list_dot_product(qv, qv)) AS BIGINT) AS fro
      |  FROM e GROUP BY id),
      |cents AS MATERIALIZED (SELECT cent_id, CAST(cent_vec AS DOUBLE[]) AS cv
      |  FROM read_parquet('${msIdxDeltaDir.get}/model/coarse/*.parquet')),
      |asg AS (SELECT id, cent_id AS cell FROM (
      |    SELECT p.id, c.cent_id,
      |      row_number() OVER (PARTITION BY p.id ORDER BY
      |        CASE WHEN sqrt(list_dot_product(p.pv, p.pv))
      |                  * sqrt(list_dot_product(c.cv, c.cv)) = 0 THEN 0.0
      |             ELSE list_dot_product(p.pv, c.cv)
      |                  / (sqrt(list_dot_product(p.pv, p.pv))
      |                     * sqrt(list_dot_product(c.cv, c.cv))) END DESC,
      |        c.cent_id) AS rnk
      |    FROM pool p CROSS JOIN cents c) WHERE rnk = 1)
      |SELECT a.id, a.cell, s.ntoks, s.fro
      |FROM asg a JOIN stats s USING (id)
      |WHERE a.id % 13 <> 0 OR a.id % 10 = 0""".stripMargin

  /** Replay of q_manifest / q_stream_manifest: the corpus_shuffle shard
    * derivation, then per-shard count / char sum / bit_xor of the 60-bit
    * md5 prefix over id ∥ chr(1) ∥ text. The streaming twin converges to
    * the same table because all three measures are mergeable.
    */
  private val manifestOracle: String =
    """WITH k AS (SELECT doc_id, text,
      |  md5('7|' || CAST(doc_id AS VARCHAR)) AS key FROM documents),
      |s AS (SELECT doc_id, text,
      |  ('0x' || substring(key, 1, 15))::BIGINT % 8 AS shard FROM k),
      |h AS (SELECT shard, length(text) AS len,
      |  ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || chr(1) || text), 1, 15))::BIGINT AS h
      |  FROM s)
      |SELECT shard, COUNT(*) AS n_rows, CAST(SUM(len) AS BIGINT) AS n_chars,
      |       bit_xor(h) AS content_xor
      |FROM h GROUP BY shard""".stripMargin

  /** DuckDB replay of the JL projection top-k (q_jl_topk): the ±1 sign
    * matrix rebuilt from the md5-parity recipe (`Jl.signMatrix` seed=42,
    * 16×64), projection as `list_dot_product` + `CAST(… AS REAL)` (≡
    * MatVecMul's left-to-right double accumulate narrowed once), then the
    * annOracle cosine/rank replay in the reduced space.
    */
  private val jlOracle: String =
    """WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sgn AS MATERIALIZED (SELECT i,
      |     list(CASE WHEN ('0x' || substring(md5('42:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |               THEN 1.0 ELSE -1.0 END ORDER BY j) AS srow
      |     FROM (SELECT unnest(range(0, 16)) AS i) CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
      |     GROUP BY i),
      |p AS MATERIALIZED (SELECT vec_id,
      |     list(CAST(list_dot_product(srow, v) AS REAL) ORDER BY i) AS pv
      |     FROM e CROSS JOIN sgn GROUP BY vec_id),
      |q AS (SELECT vec_id AS query_id, CAST(pv AS DOUBLE[]) AS qv FROM p WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id, CAST(pv AS DOUBLE[]) AS cv FROM p),
      |s AS (SELECT query_id, neighbor_id,
      |  CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0 THEN 0
      |       ELSE list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) END AS cos
      | FROM q, c WHERE query_id <> neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM r WHERE rank <= 3""".stripMargin

  /** Replay of q_sq_index_delta's maintained code table: scales train on
    * the 90% generation (`vec_id % 10 <> 0` — the indexed corpus), codes
    * derive for the MAINTAINED membership ((indexed − retired) ∪ admitted
    * — retire applies to stored rows only, single-call replace) under
    * those FROZEN scales — the 10% delta's out-of-range components
    * saturate via the same clamp-then-divide.
    */
  private val sqIndexDeltaOracle: String =
    """WITH q AS MATERIALIZED (SELECT vec_id,
      |     list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0) AS BIGINT)) AS qv
      |     FROM embeddings),
      |poss AS (SELECT unnest(range(1, 65)) AS pos),
      |mm AS MATERIALIZED (SELECT pos, MIN(qv[pos]) AS lo, MAX(qv[pos]) - MIN(qv[pos]) AS w
      |     FROM (SELECT * FROM q WHERE vec_id % 10 <> 0) CROSS JOIN poss GROUP BY pos)
      |SELECT vec_id, pos - 1 AS pos,
      |       CASE WHEN w = 0 THEN 0
      |            ELSE ((least(greatest(qv[pos], lo), lo + w) - lo) * 255) // w
      |       END AS code
      |FROM q CROSS JOIN poss JOIN mm USING (pos)
      |WHERE vec_id % 13 <> 0 OR vec_id % 10 = 0""".stripMargin

  private val langidOracle: String = {
    val codes = Text.stopwords.keys.toSeq.sorted // de, en, es, fr
    val scores = codes.map(c => s"${langScore(Text.stopwords(c))} AS s_$c").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |sc AS (SELECT doc_id, $scores FROM t)
       |SELECT doc_id, CASE
       |  WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |  WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |  WHEN s_es >= s_fr THEN 'es'
       |  ELSE 'fr' END AS lang_pred FROM sc""".stripMargin
  }

  /** Gap sessionization as three window passes — shared by the window-fn
    * and flatMapGroupsWithState forms (they must agree exactly). A break row
    * is never timestamp-tied with its predecessor (break needs diff > gap >
    * 0), so the cumulative-sum session ids are deterministic under ties.
    */
  /** The gap-sessionization CTE prefix (e → lag/brk → running-sum sid)
    * shared by sessionizeOracle, the q_stream_sessions oracle (Spark's
    * `session_window` closes at `>=` gap where sessionize breaks at `>`
    * — the comparator is the ONE sanctioned difference, passed in), and
    * the q_dialogue_pack oracle (which carries event_type through and
    * filters null utterances) — one spelling of the chain, so a gap or
    * brk edit cannot silently fork one replay from its siblings.
    */
  private def sessionCtesSql(cmp: String, extraCols: String = "",
                             eWhere: String = ""): String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us$extraCols FROM events$eWhere),
       |d AS (SELECT user_id, ts_us$extraCols,
       |      CASE WHEN lag(ts_us) OVER w IS NULL
       |                OR ts_us - lag(ts_us) OVER w $cmp 600000000 THEN 1 ELSE 0 END AS brk
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
       |s AS (SELECT user_id, ts_us$extraCols,
       |      SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid
       |      FROM d)""".stripMargin

  private val sessionizeOracle: String =
    s"""${sessionCtesSql(">")}
       |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       | MIN(ts_us) AS session_start, MAX(ts_us) AS session_end, COUNT(*) AS n_events
       |FROM s GROUP BY user_id, sid""".stripMargin

  /** Exhaustive shingle-Jaccard at a given tau — oracles both the bucket
    * (q_jaccard) and prefix-filtered (q_jaccard_prefix) implementations,
    * since prefix filtering is lossless.
    */
  private def jaccardOracle(tau: String): String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |       unnest(list_transform(range(0, len(tk) - 2),
       |              i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))) AS shingle
       |       FROM toks WHERE len(tk) >= 3),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |it AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
       |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT id_a, id_b, n_inter,
       | CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
       |FROM it JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= $tau""".stripMargin

  /** Shared CTE chain for the k-means oracles: quantize → md5 seeds (c0) →
    * assign (a1) → mean update (c1) → re-assign (a2). Mirrors
    * `Clustering.lloydCentroids`/`withCluster` at k=4, rounds=2, dim=64,
    * scale=2^20 — every arithmetic step is either exact (integral-double
    * sums, int÷int division) or an identically-ordered IEEE fold
    * (`list_dot_product` ≡ the operator's left-to-right aggregate).
    */
  private val kmeansCtes: String =
    """WITH q AS (SELECT vec_id,
      |     list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1048576.0)) AS qv
      |     FROM embeddings),
      |s AS (SELECT vec_id, qv,
      |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM q),
      |c0 AS (SELECT rn - 1 AS cid, qv AS cv FROM s WHERE rn <= 4),
      |a1 AS (SELECT vec_id, qv, cid, list_dot_product(d, d) AS dist2,
      |       row_number() OVER (PARTITION BY vec_id
      |                          ORDER BY list_dot_product(d, d), cid) AS rnk
      |       FROM (SELECT vec_id, qv, cid,
      |             list_transform(range(1, 65), i -> qv[i] - cv[i]) AS d
      |             FROM q CROSS JOIN c0)),
      |m1 AS (SELECT vec_id, qv, cid FROM a1 WHERE rnk = 1),
      |c1 AS (SELECT cid, list(sv ORDER BY pos) AS cv FROM
      |       (SELECT cid, pos, SUM(qv[pos]) / CAST(COUNT(*) AS DOUBLE) AS sv
      |        FROM m1 CROSS JOIN (SELECT unnest(range(1, 65)) AS pos)
      |        GROUP BY cid, pos)
      |       GROUP BY cid),
      |a2 AS (SELECT vec_id, cid, list_dot_product(d, d) AS dist2,
      |       row_number() OVER (PARTITION BY vec_id
      |                          ORDER BY list_dot_product(d, d), cid) AS rnk
      |       FROM (SELECT vec_id, qv, cid,
      |             list_transform(range(1, 65), i -> qv[i] - cv[i]) AS d
      |             FROM q CROSS JOIN c1))""".stripMargin

  /** DuckDB replay of product quantization (q_pq): per-subspace Lloyd
    * training (same seeding/quantization as `kmeansCtes`), corpus codes,
    * query distance tables, ADC scores — all relational joins. Parameters
    * must match the q_pq entry: dim=64, m=2 (sub=32), k=4, rounds=2,
    * queries vec_id < 8, topK=3. `vecExpr` is the embedding expression the
    * whole replay quantizes — `list_reverse(embedding)` replays the fixed
    * reversal ROTATION of q_ann_index_opq (an orthonormal permutation, so
    * MatVecMul's double-accumulate-then-narrow reproduces the permuted
    * floats EXACTLY and the rotated replay stays bit-deterministic).
    */
  private def pqScoredCtesFor(vecExpr: String,
                              queryWhere: String = "vec_id < 8"): String = {
    val (m, sub, k) = (2, 32, 4)
    val perSub = (0 until m).map { j =>
      val lo = j * sub + 1; val hi = (j + 1) * sub
      s"""sq$j AS MATERIALIZED (SELECT vec_id, list_slice(qv, $lo, $hi) AS sv FROM q),
         |sc0$j AS MATERIALIZED (SELECT rn - 1 AS cid, list_slice(qv, $lo, $hi) AS cv
         |        FROM s WHERE rn <= $k),
         |sm1$j AS MATERIALIZED (SELECT vec_id, sv, cid FROM (
         |        SELECT vec_id, sv, cid,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY list_dot_product(d, d), cid) AS rnk
         |        FROM (SELECT vec_id, sv, cid,
         |              list_transform(range(1, ${sub + 1}), i -> sv[i] - cv[i]) AS d
         |              FROM sq$j CROSS JOIN sc0$j)) WHERE rnk = 1),
         |sc1$j AS MATERIALIZED (SELECT cid, list(sval ORDER BY pos) AS cv FROM
         |        (SELECT cid, pos, SUM(sv[pos]) / CAST(COUNT(*) AS DOUBLE) AS sval
         |         FROM sm1$j CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS pos)
         |         GROUP BY cid, pos) GROUP BY cid),
         |cod$j AS MATERIALIZED (SELECT vec_id, cid FROM (
         |        SELECT vec_id, cid,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY list_dot_product(d, d), cid) AS rnk
         |        FROM (SELECT vec_id, cid,
         |              list_transform(range(1, ${sub + 1}), i -> sv[i] - cv[i]) AS d
         |              FROM sq$j CROSS JOIN sc1$j)) WHERE rnk = 1),
         |dt$j AS MATERIALIZED (SELECT query_id, cid, list_dot_product(d, d) AS d2 FROM (
         |        SELECT qq.vec_id AS query_id, cid,
         |               list_transform(range(1, ${sub + 1}), i -> qq.sv[i] - cv[i]) AS d
         |        FROM (SELECT vec_id, sv FROM sq$j WHERE $queryWhere) qq
         |        CROSS JOIN sc1$j))""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (SELECT vec_id,
       |     list_transform($vecExpr, x -> floor(CAST(x AS DOUBLE) * 1048576.0)) AS qv
       |     FROM embeddings),
       |s AS MATERIALIZED (SELECT vec_id, qv,
       |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM q),
       |$perSub,
       |scored AS (SELECT dt0.query_id, co0.vec_id AS neighbor_id,
       |           dt0.d2 + dt1.d2 AS adc2
       |           FROM cod0 co0 JOIN cod1 co1 USING (vec_id)
       |           JOIN dt0 ON dt0.cid = co0.cid
       |           JOIN dt1 ON dt1.cid = co1.cid AND dt1.query_id = dt0.query_id
       |           WHERE dt0.query_id <> co0.vec_id)""".stripMargin
  }
  private val pqScoredCtes: String = pqScoredCtesFor("embedding")

  /** Replay of q_maxsim_ann_candidates: the pqScoredCtes ADC chain with
    * the query-TOKEN predicate (every token of every 20th document), cut
    * to top-5 corpus tokens per query token (nprobe = nlist ⇒ exhaustive
    * ADC — no cell replay needed), votes per (query doc, corpus doc),
    * top-8 candidates by (votes DESC, doc ASC), then the exact MaxSim
    * interaction (the maxSimOracle arithmetic) over candidate pairs only.
    */
  private val maxSimAnnCandOracle: String =
    s"""${pqScoredCtesFor("embedding", "vec_id // 5 % 20 = 0")},
       |hits AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc2, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= 5),
       |votes AS (SELECT query_id // 5 AS qdoc, neighbor_id // 5 AS ndoc,
       |          COUNT(*) AS v
       |          FROM hits WHERE query_id // 5 <> neighbor_id // 5
       |          GROUP BY 1, 2),
       |cand AS (SELECT qdoc, ndoc FROM (
       |  SELECT qdoc, ndoc, row_number() OVER (PARTITION BY qdoc
       |         ORDER BY v DESC, ndoc) AS rnk FROM votes) WHERE rnk <= 8),
       |e AS (SELECT vec_id // 5 AS id, vec_id % 5 AS pos,
       |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 65536.0)) AS tv
       |  FROM embeddings),
       |pm AS (SELECT c.qdoc AS query_id, q2.pos AS qpos, c.ndoc AS neighbor_id,
       |  max(CAST(list_dot_product(q2.tv, d.tv) AS BIGINT)) AS m
       | FROM cand c JOIN e q2 ON q2.id = c.qdoc JOIN e d ON d.id = c.ndoc
       | GROUP BY 1, 2, 3),
       |sc AS (SELECT query_id, neighbor_id, CAST(SUM(m) AS BIGINT) AS maxsim
       | FROM pm GROUP BY 1, 2)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, maxsim FROM (
       |  SELECT query_id, neighbor_id, maxsim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY maxsim DESC, neighbor_id) AS rnk
       |  FROM sc) WHERE rnk <= 3""".stripMargin
  private val pqOracle: String =
    s"""$pqScoredCtes
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, adc2 FROM (
       |  SELECT query_id, neighbor_id, adc2,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc2, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= 3""".stripMargin
  /** q_ann_index_opq: the same replay over the REVERSED embedding — the
    * stored rotation is the coordinate-reversal permutation, so training,
    * codes, and ADC all happen in the rotated space on both engines.
    */
  private val pqOpqOracle: String =
    s"""${pqScoredCtesFor("list_reverse(embedding)")}
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, adc2 FROM (
       |  SELECT query_id, neighbor_id, adc2,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc2, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= 3""".stripMargin
  /** ADC top-8 shortlist, then exact-L2 re-rank to top-3 — the same
    * (q·q + c·c) − 2·q·c double arithmetic as `Pq.rerank` (float→double
    * casts are exact; both engines sum products sequentially).
    */
  private val pqRerankOracle: String =
    s"""$pqScoredCtes,
       |short AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc2, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= 8),
       |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, d2 FROM (
       |  SELECT query_id, neighbor_id, d2,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY d2, neighbor_id) AS rnk
       |  FROM (SELECT sh.query_id, sh.neighbor_id,
       |        list_dot_product(qq.v, qq.v) + list_dot_product(cc.v, cc.v)
       |        - 2 * list_dot_product(qq.v, cc.v) AS d2
       |        FROM short sh JOIN ev qq ON qq.vec_id = sh.query_id
       |        JOIN ev cc ON cc.vec_id = sh.neighbor_id))
       |WHERE rnk <= 3""".stripMargin

  /** Replay of q_ann_index_delta's maintained PQ code table: codebooks
    * train on the 90% generation (`vec_id % 10 <> 0` — the indexed
    * corpus), codes derive for the MAINTAINED membership ((indexed −
    * retired) ∪ admitted — retire applies to stored rows only, so
    * `vec_id % 13 <> 0 OR vec_id % 10 = 0`). Same per-subspace
    * Lloyd/assignment CTEs
    * as `pqScoredCtes`, parameterized by the two filters — the identity
    * being checked is maintained ≡ re-encoded-from-scratch under the
    * frozen model.
    */
  private val annIndexDeltaOracle: String = {
    val (m, sub, k) = (2, 32, 4)
    val trainWhere = "vec_id % 10 <> 0"
    // maintained membership = (indexed − retired) ∪ admitted: retire
    // applies to stored rows only, admitted always enters (the
    // single-call-replace contract) — ids in both sets stay
    val codeWhere = "(vec_id % 13 <> 0 OR vec_id % 10 = 0)"
    val perSub = (0 until m).map { j =>
      val lo = j * sub + 1
      s"""sq$j AS MATERIALIZED (SELECT vec_id, list_slice(qv, $lo, ${j * sub + sub}) AS sv FROM q),
         |sc0$j AS MATERIALIZED (SELECT rn - 1 AS cid, list_slice(qv, $lo, ${j * sub + sub}) AS cv
         |        FROM s WHERE rn <= $k),
         |sm1$j AS MATERIALIZED (SELECT vec_id, sv, cid FROM (
         |        SELECT vec_id, sv, cid,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY list_dot_product(d, d), cid) AS rnk
         |        FROM (SELECT vec_id, sv, cid,
         |              list_transform(range(1, ${sub + 1}), i -> sv[i] - cv[i]) AS d
         |              FROM (SELECT * FROM sq$j WHERE $trainWhere) CROSS JOIN sc0$j))
         |        WHERE rnk = 1),
         |sc1$j AS MATERIALIZED (SELECT cid, list(sval ORDER BY pos) AS cv FROM
         |        (SELECT cid, pos, SUM(sv[pos]) / CAST(COUNT(*) AS DOUBLE) AS sval
         |         FROM sm1$j CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS pos)
         |         GROUP BY cid, pos) GROUP BY cid),
         |cod$j AS MATERIALIZED (SELECT vec_id, cid FROM (
         |        SELECT vec_id, cid,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY list_dot_product(d, d), cid) AS rnk
         |        FROM (SELECT vec_id, cid,
         |              list_transform(range(1, ${sub + 1}), i -> sv[i] - cv[i]) AS d
         |              FROM (SELECT * FROM sq$j WHERE $codeWhere) CROSS JOIN sc1$j))
         |        WHERE rnk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (SELECT vec_id,
       |     list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1048576.0)) AS qv
       |     FROM embeddings),
       |s AS MATERIALIZED (SELECT vec_id, qv,
       |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |      FROM q WHERE $trainWhere),
       |$perSub
       |SELECT cod0.vec_id AS vec_id, CAST(cod0.cid AS BIGINT) AS code0,
       |       CAST(cod1.cid AS BIGINT) AS code1
       |FROM cod0 JOIN cod1 USING (vec_id)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
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
      """WITH l AS (SELECT p_partkey AS l_id, p_name AS l_name,
        |  array_to_string(list_slice(list_filter(string_split(p_name, ' '), t -> t <> ''), 1, 1), ' ') AS blk
        |  FROM part),
        |r0 AS (SELECT p_partkey + 1000000 AS r_id,
        |  regexp_replace(p_name, ' [a-z]+$', '') AS r_name FROM part
        |  WHERE p_partkey % 20 = 0),
        |r AS (SELECT r_id, r_name,
        |  array_to_string(list_slice(list_filter(string_split(r_name, ' '), t -> t <> ''), 1, 1), ' ') AS blk
        |  FROM r0)
        |SELECT l_id, l_name, r_id, r_name,
        | CAST(levenshtein(l_name, r_name) AS BIGINT) AS dist
        |FROM l JOIN r USING (blk)
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
