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

/** Shared fixtures and helpers behind the SparkEntry registries (r15 —
  * the 6,100-line single file split by family per the r14 verdict):
  * table loaders, the bucketed/Derby fixtures, the synthesized-message
  * SQL shared verbatim by both engines, and the flagship joins. Every
  * member was SparkEntry-private before the split; `private[graft]`
  * only widens visibility to the sibling registry objects.
  */
object EntryFixtures {

  private[graft] def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DECIMAL(18,2) accumulator cast — the exact-money-math workhorse. */
  private[graft] def dec(c: Column): Column = c.cast(DecimalType(18, 2))

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
  private[graft] val bucketedBases =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, (String, String)]()
  private[graft] val bktSuffixes =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  private[graft] def bktTable(s: SparkSession, side: String): String = {
    val sfx = bktSuffixes.computeIfAbsent(s, _ =>
      java.util.UUID.randomUUID().toString.replace("-", "").take(8))
    s"graft_bkt_${side}_$sfx"
  }
  private[graft] lazy val bucketedTmpRoot: java.nio.file.Path = {
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
  private[graft] def bucketedFixture(s: SparkSession, dir: String): String =
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
  private[graft] lazy val derbyEngineProps: Unit = {
    System.setProperty("derby.stream.error.path", "/tmp/derby.log")
    System.setProperty("derby.storage.tempDirectory",
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
  }

  private[graft] def derbyJarFixture(df: DataFrame, tag: String, table: String,
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
  private[graft] def withStreamShuffle[T](s: SparkSession, n: Int = 4)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Flagship query on sf=0.001: revenue per nation (broadcast dims). */

  /** lineitem ⋈ orders ⋈ customer ⋈ (broadcast) nation ⋈ (broadcast) region;
    * decimal-exact revenue. The dims are broadcast so the only shuffles are
    * the two fact-side join keys + the final group-by.
    */
  private[graft] def revenuePerNation(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def orderDoc(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] val htmlPre = "<html><head><title>t</title><SCRIPT type=\"text/javascript\">\nvar n = 1;\nif (n < 2) { n = 2; }\n</SCRIPT><style>\np { color: red; }\n</style></head>\n<body><h1>Doc &#39;"
  private[graft] val htmlMid = "&#39;</h1><!-- crawl\nartifact --><p>"
  private[graft] val htmlPost = "</p>\n<p>a &amp;&amp; b &lt;tag&gt; &quot;q&quot;&nbsp;end &amp;lt;raw&amp;gt;</p><a href=\"http://x/1\">l1</a> <a\nhref=\"/y\">l2</a></body></html>"

  private[graft] def syntheticHtml: Column =
    concat(lit(htmlPre), col("doc_id").cast(StringType),
      lit(htmlMid), col("text"), lit(htmlPost))

  /** SQL single-quoted literal (quote-doubled). */
  private[graft] def sqlQ(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Non-Latin salts for q_script_stats: (doc_id modulus, fragment,
    * repeat count). The oracle rebuilds each fragment from code points via
    * chr() — source-encoding-independent on the SQL side.
    */
  private[graft] val scriptSalts: Seq[(Int, String, Int)] = Seq(
    (3, "Привет мир", 1),
    (5, "Γειά σου", 1),
    (7, "مرحبا", 1),
    (11, "好世界", 200)) // 600 CJK chars — outweighs any doc's Latin body

  /** The salted-text expression in DuckDB SQL — same fragments. */
  private[graft] def scriptSaltSql: String = {
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
  private[graft] def scriptStatsOracle: String = {
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
  private[graft] val bm25ManyQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "vector", "customer"),
    1L -> Seq("spark", "window"),
    2L -> Seq("merge", "batch"))

  /** Multi-query BM25 oracle: the bm25CtesSql scoring chain per (query,
    * doc) with the term sets from [[bm25ManyQueries]] as a VALUES list.
    * Carries the df-ceiling keep CTE at 990‰ — the r12 default
    * [[graft.similarity.Search.bm25ManyFromIndex]] now applies — so both
    * engines drop the same stop terms at any scale factor.
    */
  private[graft] def bm25ManyOracle: String = {
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
  private[graft] def bm25CtesSql: String = bm25CtesSql(1000)
  private[graft] def bm25CtesSql(maxDfPermille: Int): String = {
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
    * null, the enum/multipleOf value checks stay typed-guarded. r16
    * `if`/`then`/`else` at all three depths: the ROOT conditional
    * (if priority present then tags required, else value required)
    * fires `then:$` on shape 2 (priority, no tags — alongside the
    * equivalent dependentRequired's `dep:$.tags`, pinning the two
    * devices agree) and `else:$` on shape 4 (no priority, no value);
    * the `priority` path conditional (integer → max 5, else null)
    * fires `then:$.priority` on shape 1 (9) and `else:$.priority` on
    * shape 3 ("high"); the element-depth conditional (qty present →
    * dims required) fires `then:$.items[]` on shape 2's element. r16
    * DISCRIMINATED `oneOf` on `ref` (integer ≥ 0 | string minLength
    * 2): shape 0's 7 passes, shape 1's "x" fires `oneof:$.ref`, shape
    * 3's true fires the synthesized union `type:$.ref`. r16
    * `patternProperties` at all three depths WITH the closed-object
    * interplay: the root selector `^_` means shape 4's `_debug` is no
    * longer `extra:$` but its true value fires `pprop:$.type` (and
    * the propertyNames `propname:$` still fires); the user selector
    * `^ro` admits shape 2's `role` key (no `extra:$.user` anymore)
    * while "admin" fires `pprop:$.user.enum`; the element-depth meta
    * selector `^w` re-validates the DECLARED `w` key — shape 1's
    * "heavy" fires `pprop:$.items[].meta.type` alongside the
    * properties-side `type:$.items[].meta.w` (both apply, the spec's
    * rule). r16 disjunction/negation: `anyOf` on `mode` (shape 1's 7
    * fails both members → `anyof:$.mode`; shape 0's "bulk" passes),
    * DYNAMIC `oneOf` on `level` (overlapping integer members: shape
    * 1's 7 satisfies BOTH → `oneof:$.level`, shape 2's "x" satisfies
    * NEITHER → same tag, shape 0's 3 exactly one → pass), `not` at the
    * root (shape 4's `_debug` satisfies `required: [_debug]` →
    * `not:$`), at a path (shape 1's priority 9 satisfies
    * integer+multipleOf 3 → `not:$.priority`) and at two-level element
    * depth (shape 1's dims element 9 satisfies `const: 9` →
    * `not:$.items[].dims[]`), and root `dependentSchemas`
    * (priority present requires `ref`: shape 2's null priority IS
    * present and ref is absent → `depschema:$.priority`). r16
    * `additionalProperties` SCHEMA form on `ext` (any undeclared key's
    * value must be an integer): shape 3's `"b": "x"` fires
    * `aprop:$.ext.type` where shape 0's `{"a": 2}` passes. The valid
    * shape's first tag is the ASTRAL-bearing string
    * 𝒳abcdefg (8 code points — exactly the items maxLength boundary;
    * spelled as JSON \u escapes so the fixture file itself is
    * locale-proof): valid under correct UTF-8 handling, 11 "chars"
    * under the ASCII-locale variant mangling r13 found and fixed
    * (build.sbt file.encoding) — a locale regression now FAILS the
    * driver's DuckDB gate instead of lurking.
    */
  private[graft] val jsonSynthSql: String =
    """CASE WHEN event_id % 7 = 0 THEN '{broken'
      | ELSE CASE CAST(event_id % 5 AS INT)
      |  WHEN 0 THEN '{"user": {"id": ' || CAST(user_id AS STRING) || ', "name": "u' || CAST(user_id AS STRING) || '"}, "type": "' || event_type || '", "value": ' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || ', "tags": ["\ud835\udcb3abcdefg", "b"], "priority": 2, "ref": 7, "mode": "bulk", "level": 3, "ext": {"a": 2}, "items": [{"sku": 5, "qty": 2, "lot": 1, "dims": [1, 2], "meta": {"w": 1.5}}]}'
      |  WHEN 1 THEN '{"user": {"id": ' || CAST(user_id AS STRING) || '}, "type": "' || event_type || '", "value": "' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || '", "tags": ["ok", 3, "ok"], "priority": 9, "ref": "x", "mode": 7, "level": 7, "items": [{"sku": "x", "qty": 1, "lot": 2, "dims": [9, -2, "x"], "meta": {"w": "heavy", "unit": "kg"}}]}'
      |  WHEN 2 THEN '{"user": {"name": "u' || CAST(user_id AS STRING) || '", "role": "admin"}, "type": "' || event_type || '", "value": ' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || ', "priority": null, "level": "x", "items": [{"qty": 0, "meta": {}}]}'
      |  WHEN 3 THEN '{"user": {"id": ' || CAST(user_id AS STRING) || '}, "type": "badtype", "value": ' || CAST(CAST(value AS DECIMAL(18,2)) AS STRING) || ', "tags": ["a", null, null], "priority": "high", "ref": true, "ext": {"a": 1, "b": "x"}, "items": []}'
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
    * element-depth `meta`. r16: `if`/`then`/`else` at the root (presence
    * implication), at a path (type-discriminated bound on `priority`),
    * and at element depth (qty → dims); a discriminated `oneOf` on
    * `ref`; `patternProperties` at the root (`^_`), the nested `user`
    * (`^ro`), and the element-depth `meta` (`^w`) — each sitting beside
    * `additionalProperties: false`, so the matched-by-neither rule is
    * driver-pinned every round. r16 disjunction/negation: `anyOf` on
    * `mode`, a DYNAMIC (overlapping-member) `oneOf` on `level` beside
    * the discriminated one on `ref`, `not` at the root / on `priority`
    * / on the dims elements (two-level element depth), and root
    * `dependentSchemas` (priority → ref) beside the equivalent-shape
    * dependentRequired — every satisfaction-evaluator keyword
    * driver-pinned against the DuckDB replay each round; and the
    * `additionalProperties` SCHEMA form on `ext` (the complement
    * selector: undeclared keys' values validate, `aprop:$.ext.type`).
    */
  private[graft] val jsonSchemaDemo: String =
    """{"type": "object", "required": ["user", "type", "value"],
      | "additionalProperties": false,
      | "propertyNames": {"pattern": "^[a-z]+$"},
      | "dependentRequired": {"priority": ["tags"]},
      | "if": {"required": ["priority"]},
      | "then": {"required": ["tags"]},
      | "else": {"required": ["value"]},
      | "not": {"required": ["_debug"]},
      | "dependentSchemas": {"priority": {"required": ["ref"]}},
      | "patternProperties": {"^_": {"type": "string"}},
      | "$defs": {"money": {"type": "number", "minimum": 0, "maximum": 15}},
      | "properties": {
      |  "user": {"type": "object", "required": ["id"],
      |           "additionalProperties": false,
      |           "propertyNames": {"pattern": "^(id|name)$"},
      |           "patternProperties": {"^ro": {"enum": ["user", "guest"]}},
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
      |               "multipleOf": 2,
      |               "if": {"type": "integer"},
      |               "then": {"maximum": 5},
      |               "else": {"type": "null"},
      |               "not": {"type": "integer", "multipleOf": 3}},
      |  "ref": {"oneOf": [{"type": "integer", "minimum": 0},
      |                    {"type": "string", "minLength": 2}]},
      |  "mode": {"anyOf": [{"type": "string", "minLength": 3},
      |                     {"type": "integer", "multipleOf": 2}]},
      |  "ext": {"type": "object",
      |          "additionalProperties": {"type": "integer"}},
      |  "level": {"oneOf": [{"type": "integer", "minimum": 5},
      |                      {"type": "integer", "maximum": 10}]},
      |  "items": {"type": "array", "minItems": 1,
      |            "contains": {"required": ["sku"]},
      |            "items": {"type": "object", "required": ["sku", "lot"],
      |                      "if": {"required": ["qty"]},
      |                      "then": {"required": ["dims"]},
      |                      "properties": {
      |                        "sku": {"type": "integer"},
      |                        "qty": {"type": "integer", "minimum": 1},
      |                        "dims": {"type": "array", "maxItems": 2,
      |                                 "contains": {"type": "integer",
      |                                              "minimum": 1,
      |                                              "maximum": 5},
      |                                 "items": {"type": "integer",
      |                                           "minimum": 0,
      |                                           "not": {"const": 9}}},
      |                        "meta": {"type": "object", "required": ["w"],
      |                                 "additionalProperties": false,
      |                                 "propertyNames": {"pattern": "^[a-z]$"},
      |                                 "patternProperties": {"^w": {"type": "number"}},
      |                                 "minProperties": 1,
      |                                 "properties": {
      |                                   "w": {"type": "number"}}}}}}}}""".stripMargin

  /** The [[syntheticHtml]] expression in DuckDB SQL — same fragments. */
  private[graft] def htmlExprSql: String =
    s"${sqlQ(htmlPre)} || CAST(doc_id AS VARCHAR) || ${sqlQ(htmlMid)} || text || ${sqlQ(htmlPost)}"

  /** DuckDB replay of [[graft.functions.Text.htmlToText]] over a column
    * named `html` — identical regex chain (inline flags, shared syntax) and
    * the SAME entity list ([[graft.functions.Text.htmlEntities]] renders to
    * the replace chain, so the two implementations cannot drift).
    */
  private[graft] def htmlCleanSql: String = {
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
  private[graft] def lexTopKRanked(docs: DataFrame): DataFrame =
    Search.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "vector", "customer"), k = 10)
      .select(lit(0L).as("query_id"), col("id"), col("score"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("id").asc)).cast(LongType))
      .select("query_id", "id", "rank")

  /** Shared SQL fragments + the query->oracle side channel, kept in one
    * place so Spark/DuckDB stay in sync across the registry files. */
  private[graft] val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"
  private[graft] val msIdxDeltaDir = new java.util.concurrent.atomic.AtomicReference[String](
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_msidx_delta_unset")
}
