package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch sources — the generator nodes of the reference re-expressed as
  * DataFrame scans.
  *
  * Reference surfaces covered (all in `metalpipe/node.py`):
  *  - `LocalFileReader` (node.py:1463)    → [[textLines]] / [[wholeFiles]]
  *  - `CSVReader` (node.py:1488)          → [[csv]]
  *  - `ConstantEmitter` (node.py:1432)    → [[constant]]
  *  - `SequenceEmitter` (node.py:1091)    → [[sequence]]
  *  - `CounterOfThings` (node.py:978)     → [[counter]]
  *  - `GetEnvironmentVariables` (node.py:1145) → [[envVars]]
  *
  * Every source is a lazy scan/plan, not a driver-side loop: a file source is
  * a distributed read; emitters are `spark.range` projections that parallelize
  * across executors, so a 10^12-row counter costs nothing on the driver.
  */
object Sources {

  /** One row per line, column `value` (reference: serialize=true read). */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** One row per file: (path, modificationTime, length, content). */
  def wholeFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** CSV with header; schema inference optional (pass explicit DDL at scale —
    * inference is an extra pass over the data).
    */
  def csv(spark: SparkSession, path: String,
          header: Boolean = true, inferSchema: Boolean = true,
          schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schemaDdl match {
      case Some(ddl) => r.schema(ddl).csv(path)
      case None      => r.option("inferSchema", inferSchema.toString).csv(path)
    }
  }

  /** Emit `n` copies of a constant record (reference pulses thingies forever;
    * batch semantics = a bounded count). Columns from the literal map.
    */
  def constant(spark: SparkSession, record: Map[String, Any], n: Long = 1): DataFrame =
    record.foldLeft(spark.range(n).select(col("id").as("_emit_id"))) {
      case (df, (k, v)) => df.withColumn(k, lit(v))
    }

  /** Repeat a typed sequence of values `repeats` times, column `value`;
    * `seq_no` tracks the repetition (reference `max_sequences`).
    */
  def sequence[T: scala.reflect.ClassTag](spark: SparkSession, values: Seq[T],
                                          repeats: Long = 1): DataFrame = {
    val arr = lit(values.toArray)
    spark.range(repeats).select(col("id").as("seq_no"), explode(arr).as("value"))
  }

  /** Monotonic counter [start, end) — distributed, not a driver loop. */
  def counter(spark: SparkSession, start: Long, end: Long): DataFrame =
    spark.range(start, end).withColumnRenamed("id", "n")

  /** Environment variables as a single config row (driver-side by nature;
    * reference: GetEnvironmentVariables mapping env → message keys).
    */
  def envVars(spark: SparkSession, vars: Seq[String]): DataFrame = {
    val cols: Seq[Column] = vars.map(v => lit(sys.env.getOrElse(v, null)).as(v))
    spark.range(1).select(cols: _*)
  }

  /** JDBC option set for a partitioned table read (reference
    * `StreamMySQLTable`, node.py:1346, which pages through a MySQL table).
    * The Spark equivalent of its paging is the four-way partitioned read:
    * every executor pulls its own key range. Pure function so the plumbing
    * is unit-testable without a database.
    */
  def jdbcOptions(url: String, table: String,
                  partitionColumn: Option[String] = None,
                  lowerBound: Long = 0L, upperBound: Long = 0L,
                  numPartitions: Int = 1,
                  extra: Map[String, String] = Map.empty): Map[String, String] = {
    val base = Map("url" -> url, "dbtable" -> table)
    val part = partitionColumn.fold(Map.empty[String, String]) { c =>
      Map("partitionColumn" -> c,
        "lowerBound" -> lowerBound.toString,
        "upperBound" -> upperBound.toString,
        "numPartitions" -> numPartitions.toString)
    }
    base ++ part ++ extra
  }

  /** Partitioned JDBC table read. No database exists in the test env;
    * options assembly is covered by [[jdbcOptions]]'s spec.
    */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                partitionColumn: Option[String] = None,
                lowerBound: Long = 0L, upperBound: Long = 0L,
                numPartitions: Int = 1,
                extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .options(jdbcOptions(url, table, partitionColumn, lowerBound, upperBound,
        numPartitions, extra))
      .load()

  /** Driver-side JDBC column introspection (reference `StreamMySQLTable`,
    * node.py:1346: reads the table's schema from `information_schema`
    * before streaming it). Returns (name, typeString) in ordinal order,
    * the typeString in the MySQL-ish form [[graft.schema.SchemaInfer.mysqlType]]
    * parses — "varchar(128)", "decimal(12,2)", "blob". Uses JDBC's own
    * `DatabaseMetaData.getColumns` rather than raw `information_schema`
    * SQL so the same call works on MySQL, Derby (the test stand-in), or
    * any compliant driver; introspection is schema-sized and driver-side
    * by nature. Unquoted identifiers upper-case in many databases, so a
    * miss on the exact table name retries upper-cased.
    */
  def jdbcColumns(url: String, table: String,
                  props: Map[String, String] = Map.empty): Seq[(String, String)] = {
    props.get("driver").foreach(Class.forName(_))
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, p)
    try {
      val md = conn.getMetaData
      // getColumns treats its table argument as a LIKE pattern: an
      // unescaped '_' or '%' in the name (e.g. "customer_ty") matches OTHER
      // tables too and would interleave their columns into one wrong
      // schema. Escape both wildcards with the driver's escape string AND
      // keep only rows whose TABLE_NAME is exactly the requested table —
      // belt and braces because some drivers ignore the escape.
      val esc = Option(md.getSearchStringEscape).getOrElse("\\")
      def escapePattern(t: String): String =
        t.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      def cols(t: String): Seq[(Int, String, String)] = {
        val rs = md.getColumns(null, null, escapePattern(t), null)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
        while (rs.next()) {
          // case-INSENSITIVE exact match: drivers on case-insensitive
        // databases (MySQL on such filesystems) report the stored case
        // ("Orders") for a lower-case pattern; an exact == would filter
        // every row out and fail a read that used to work. Wildcard-merged
        // OTHER tables still differ letterwise and stay excluded.
        if (rs.getString("TABLE_NAME").equalsIgnoreCase(t)) {
            val tn = rs.getString("TYPE_NAME").toLowerCase
            val size = rs.getInt("COLUMN_SIZE")
            val dec = rs.getInt("DECIMAL_DIGITS")
            val ts = tn match {
              case "varchar" | "char"    => s"$tn($size)"
              case "decimal" | "numeric" => s"$tn($size,$dec)"
              case other                 => other
            }
            buf += ((rs.getInt("ORDINAL_POSITION"), rs.getString("COLUMN_NAME"), ts))
          }
        }
        buf.sortBy(_._1).toSeq
      }
      val found = { val e = cols(table); if (e.nonEmpty) e else cols(table.toUpperCase) }
      require(found.nonEmpty, s"jdbcColumns: no columns found for table '$table'")
      found.map { case (_, n, t) => (n, t) }
    } finally conn.close()
  }

  /** Typed JDBC table read: apply an introspected (name, mysqlType) schema
    * ([[jdbcColumns]] → [[graft.schema.SchemaInfer.mysqlSchema]]) as casts
    * over the partitioned scan, and surface each binary column additionally
    * hex-encoded as `<name>_hex`. The reference hex-casts blobs INSIDE its
    * SQL (node.py:1375: its client chokes on raw bytes); Spark reads bytes
    * natively, so the hex is a codegen projection with the same output and
    * no per-database HEX() dialect.
    */
  def jdbcTyped(spark: SparkSession, url: String, table: String,
                cols: Seq[(String, String)],
                partitionColumn: Option[String] = None,
                lowerBound: Long = 0L, upperBound: Long = 0L,
                numPartitions: Int = 1,
                extra: Map[String, String] = Map.empty): DataFrame = {
    val schema = graft.schema.SchemaInfer.mysqlSchema(cols)
    val raw = jdbcTable(spark, url, table, partitionColumn, lowerBound,
      upperBound, numPartitions, extra)
    val casts = schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    schema.fields.filter(_.dataType == org.apache.spark.sql.types.BinaryType)
      .foldLeft(raw.select(casts.toSeq: _*)) { (d, f) =>
        d.withColumn(s"${f.name}_hex", hex(col(f.name)))
      }
  }

  /** Push an arbitrary SQL query to the database and read the result
    * (reference `civis_nodes.py` CivisSQLExecute / FindValue: run SQL
    * remotely, stream the rows back). The query executes INSIDE the
    * database — Spark scans only the result set, so a selective WHERE
    * never crosses the wire.
    */
  def jdbcQuery(spark: SparkSession, url: String, sql: String,
                extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("query", sql)
      .options(extra).load()

  /** Paginated GET source (reference `network_nodes.py:172,244`
    * `PaginatedHttpGetRequest`): plan the page space up front, fetch pages
    * DISTRIBUTED via a pluggable (serializable) fetch function — each
    * executor pulls its own page range, nothing loops on the driver.
    * Output: (page, body) one row per returned payload. Tests inject a
    * deterministic fake fetch; production injects a real HTTP client.
    */
  def paginatedApi(spark: SparkSession, pages: Long,
                   fetch: Long => Seq[String],
                   partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val nPart = if (partitions > 0) partitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, pages, 1, nPart).as[Long]
      .flatMap(p => fetch(p).map(body => (p, body)))
      .toDF("page", "body")
  }

  /** Retry wrapper for any fetch function (reference `network_nodes.py:64`
    * `get_with_retry`: loop up to `retries`, sleep, double the backoff).
    * Returns a function safe to hand to [[paginatedApi]]/[[httpTemplate]] —
    * it is serializable as long as `f` and `sleep` are, so retries run ON
    * THE EXECUTORS, not the driver. Backoff doubles from `initialBackoffMs`
    * and caps at `maxBackoffMs` (the reference's hibernate loop, bounded);
    * `sleep` is injectable so specs assert the schedule without waiting.
    * After `maxRetries` failed retries the LAST cause is rethrown wrapped —
    * a permanently dead endpoint fails the job loudly, never silently
    * yields fewer rows.
    */
  def withRetries[A, B](f: A => B, maxRetries: Int = 5,
                        initialBackoffMs: Long = 100L,
                        maxBackoffMs: Long = 5000L,
                        sleep: Long => Unit = (ms: Long) => Thread.sleep(ms)): A => B =
    (a: A) => {
      var attempt = 0
      var delay = initialBackoffMs
      var out: Option[B] = None
      var last: Throwable = null
      while (out.isEmpty && attempt <= maxRetries) {
        try out = Some(f(a))
        catch {
          case scala.util.control.NonFatal(e) =>
            last = e
            attempt += 1
            if (attempt <= maxRetries) {
              sleep(delay)
              delay = math.min(delay * 2, maxBackoffMs)
            }
        }
      }
      out.getOrElse(throw new RuntimeException(
        s"fetch failed after $maxRetries retries: $a", last))
    }

  /** Offset-chased pagination (reference `network_nodes.py:97`
    * `PaginatedHttpGetRequest.responses`): fetch the first page with
    * `firstOffset`, then repeatedly extract the next offset from the
    * returned body (`nextOffset`, e.g. [[jsonKey]]) and fetch again,
    * terminating when the offset is ABSENT/empty (the reference's KeyError
    * break), when it repeats (cycle guard — the reference collects its
    * `offset_set` but never checks it; a looping API would page forever),
    * or at `maxPages` (fail-fast: hitting the cap raises rather than
    * silently truncating).
    *
    * The page WALK is driver-side by nature — each offset is data in the
    * previous response, an inherently serial chain the reference also walks
    * one request at a time. Driver MEMORY is not walk-length-bounded,
    * though: bodies spill to a temp parquet directory every `flushEvery`
    * pages, so peak driver accumulation is `flushEvery` bodies regardless
    * of page count — `maxPages` is a runaway-walk backstop, not a memory
    * bound, so its default stays at the pre-spill 100k (cutting it would
    * break existing long walks for no safety gain). The spill directory
    * backs the RETURNED frame (parquet reads are lazy) and is deleted on
    * JVM exit. Everything downstream of the returned frame (JSON
    * parse, explode, joins) is a distributed plan. For offset-ARITHMETIC
    * APIs (page=0,1,2,…) use [[paginatedApi]], which fetches all pages in
    * parallel on the executors. Wrap `fetch` in [[withRetries]] for flaky
    * endpoints.
    *
    * Output: (page, offset, body, cycled) — one row per fetched page.
    * `cycled` is true on EVERY row iff the walk terminated because an
    * offset repeated: a looping API is thereby distinguishable in-band
    * from normal end-of-pages (it also logs a warning) instead of
    * returning a silently truncated frame.
    */
  def paginatedApiChase(spark: SparkSession, urlFor: String => String,
                        fetch: String => String,
                        nextOffset: String => Option[String],
                        firstOffset: String = "",
                        maxPages: Int = 100000,
                        flushEvery: Int = 1024): DataFrame = {
    import spark.implicits._
    require(flushEvery > 0, s"flushEvery must be positive, got $flushEvery")
    lazy val spill = {
      val dir = java.nio.file.Files.createTempDirectory("graft_chase_spill")
      // the returned frame reads this dir lazily — reclaim on JVM exit
      // (covers the maxPages failure path too, which otherwise leaks it)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import java.nio.file.{Files, Path}
          import java.util.Comparator
          Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => Files.deleteIfExists(p))
        } catch { case scala.util.control.NonFatal(_) => () }))
      dir.toString
    }
    var spilled = false
    val chunk = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    def flush(): Unit = if (chunk.nonEmpty) {
      chunk.toSeq.toDF("page", "offset", "body")
        .write.mode("append").parquet(spill)
      spilled = true
      chunk.clear()
    }
    val seen = scala.collection.mutable.Set.empty[String]
    var offset: Option[String] = Some(firstOffset)
    var page = 0L
    var cycled = false
    while (offset.isDefined && !cycled) {
      if (!seen.add(offset.get)) cycled = true
      else {
        require(page < maxPages,
          s"paginatedApiChase exceeded maxPages=$maxPages; raise the cap if the " +
            "API genuinely has more pages (memory stays flat — bodies spill)")
        val body = fetch(urlFor(offset.get))
        chunk += ((page, offset.get, body))
        page += 1
        if (chunk.size >= flushEvery) flush()
        offset = nextOffset(body).filter(_.nonEmpty)
      }
    }
    if (cycled)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"paginatedApiChase: offset '${offset.get}' repeated after $page pages " +
          "- cycling API; returning the fetched pages with cycled=true")
    val out =
      if (spilled) { flush(); spark.read.parquet(spill) }
      else chunk.toSeq.toDF("page", "offset", "body")
    out.withColumn("cycled", lit(cycled))
  }

  /** Driver-side JSON key lookup with recursive descent for
    * [[paginatedApiChase]]'s `nextOffset`: returns the value of the FIRST
    * occurrence of `key` found depth-first in the body (APIs bury the
    * next-page cursor at varying depths — `{"paging": {"next": …}}`).
    * None when the key is missing, null, or the body isn't JSON — all of
    * which mean "no more pages".
    */
  def jsonKey(key: String)(body: String): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def find(n: com.fasterxml.jackson.databind.JsonNode): Option[com.fasterxml.jackson.databind.JsonNode] =
      if (n.has(key)) Some(n.get(key))
      else {
        val it = n.elements()
        var found: Option[com.fasterxml.jackson.databind.JsonNode] = None
        while (found.isEmpty && it.hasNext) found = find(it.next())
        found
      }
    try find(mapper.readTree(body)).filterNot(_.isNull).map(_.asText)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-row templated GET (reference `network_nodes.py:172`
    * `HttpGetRequest`: `endpoint_template.format_map(message)`): fill
    * `{field}` placeholders in the URL template from each incoming row,
    * fetch with a pluggable (serializable) function, one output row per
    * returned payload.
    *
    * The URL is built as a codegen'd `concat` projection (placeholders
    * resolve against the schema at PLAN time — unknown fields fail fast,
    * like the reference's SafeMap leaves them unfilled); only the fetch
    * itself runs as imperative per-partition code, which is exactly the
    * per-row network I/O Spark cannot express relationally. Extra keys in
    * `constants` fill placeholders that aren't row fields (the reference's
    * `endpoint_dict`).
    *
    * Output: input row fields in `keep` + (url, body).
    */
  def httpTemplate(df: DataFrame, template: String,
                   fetch: String => Seq[String],
                   keep: Seq[String] = Nil,
                   constants: Map[String, String] = Map.empty): DataFrame = {
    val parts = "\\{[A-Za-z0-9_.]+\\}".r
    // Split the template into literal/placeholder segments → one concat.
    val segments = scala.collection.mutable.Buffer[Column]()
    var last = 0
    parts.findAllMatchIn(template).foreach { m =>
      if (m.start > last) segments += lit(template.substring(last, m.start))
      val name = template.substring(m.start + 1, m.end - 1)
      segments += constants.get(name).map(lit(_): Column)
        .getOrElse(col(name).cast(StringType))
      last = m.end
    }
    if (last < template.length) segments += lit(template.substring(last))
    val withUrl = df.withColumn("url",
      if (segments.isEmpty) lit(template) else concat(segments.toSeq: _*))
    val keepCols = keep.map(col) :+ col("url")
    val projected = withUrl.select(keepCols: _*)
    val schema = projected.schema
    val urlIdx = schema.fieldNames.length - 1
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(StructType(
        schema.fields :+ StructField("body", StringType)))
    projected.flatMap { row =>
      fetch(row.getString(urlIdx)).map(body => Row.fromSeq(row.toSeq :+ body))
    }
  }
}
