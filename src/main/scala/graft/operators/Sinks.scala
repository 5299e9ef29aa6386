package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, col, expr, lit, max, min}

/** Sink nodes (reference `PrinterOfThings` node.py:1412, `BlackHole`
  * node.py:1705, recorder `metalpipe_recorder.py`).
  *
  * In Spark a "sink" is an action; everything upstream stays a lazy plan.
  */
object Sinks {

  /** Print up to `n` rows (reference PrinterOfThings). */
  def printer(df: DataFrame, n: Int = 20, truncate: Boolean = false): Unit =
    df.show(n, truncate)

  /** Consume fully without keeping anything (reference BlackHole) — forces
    * materialization of the whole plan; returns the row count it swallowed.
    */
  def blackHole(df: DataFrame): Long = df.count()

  /** Append-mode parquet event log (reference `metalpipe_recorder.py`):
    * every message that reaches the sink is durably recorded; re-runs append.
    */
  def recorder(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Streaming recorder: exactly-once append log for a stream (the
    * reference's recorder replays messages; checkpointed parquet append is
    * the durable cluster equivalent). Returns the started query.
    */
  def recorderStream(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()

  /** CSV file sink (reference `civis_nodes.py:429` `CivisToCSV`; the
    * reference's Civis upload path at `civis_nodes.py:28` is file-mediated
    * through exactly this artifact). Header row on by default; Spark quotes
    * any field carrying the delimiter, quote, or newline, so arbitrary text
    * columns survive. For a TYPED re-read, pass the frame's own schema to
    * [[graft.sources.Sources.csv]] (`schemaDdl = Some(df.schema.toDDL)`) —
    * CSV itself is untyped text, and re-inference can drift (e.g. a
    * decimal column re-read as double); fields written with embedded
    * newlines additionally need `multiLine=true` on the read.
    */
  def csvWrite(df: DataFrame, path: String, header: Boolean = true,
               mode: String = "overwrite",
               options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).option("header", header.toString)
      .options(options).csv(path)

  /** Graph export (reference `cypher_neo4j.py:8` Neo4j writer): node tables
    * per entity label + edge tables, as parquet — the bulk-import layout
    * every graph store ingests. Entity/edge DataFrames come from
    * `TreeWalk.entities` / `TreeWalk.relations` / `MtlParser`.
    */
  def graphExport(nodes: Map[String, DataFrame], edges: Map[String, DataFrame],
                  dir: String): Unit = {
    nodes.foreach { case (label, df) =>
      df.write.mode("overwrite").parquet(s"$dir/nodes_$label")
    }
    edges.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/edges_$name")
    }
  }

  /** Cypher MERGE statements for an edge table (src_id, dst_id, rel) — the
    * textual form the reference's Neo4j node emits, generated distributed as
    * a column (no driver loop); feed to any bolt client.
    */
  def cypherStatements(edges: DataFrame, srcLabel: String, dstLabel: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Values interpolate between single quotes, so backslashes and quotes
    // in the DATA must escape (Cypher string rules) — an id like "O'Brien"
    // would otherwise emit a syntactically broken (and injectable)
    // statement.
    def esc(c: Column): Column = {
      val bs = call_function("replace", c.cast("string"), lit("\\"), lit("\\\\"))
      call_function("replace", bs, lit("'"), lit("\\'"))
    }
    // Relation types and property KEYS interpolate outside quotes, where no
    // string escaping can contain them — and although graft's own callers
    // feed parser-generated identifiers, both are DataFrame columns, so any
    // data-derived value is an injection vector. Enforce the identifier
    // grammar per row and fail loudly on violations (a silently mangled
    // MERGE is worse than an aborted export).
    def ident(c: Column): Column =
      when(c.rlike("^[A-Za-z_][A-Za-z0-9_]*$"), c)
        .otherwise(raise_error(concat(
          lit("cypherStatements: non-identifier relation/property name: '"),
          c, lit("'"))))
    // A `props` column (array<struct<k,v>> from MtlParser relation
    // assertions) renders as SET clauses on the relationship — the
    // reference's RelationshipPropertyAssertion merge schema
    // (nft_nodes.py:834: MERGE ... SET r.{prop} = $value). Null-valued
    // properties are skipped (a null inside concat would otherwise null
    // out the whole SET block and silently drop every property).
    if (edges.columns.contains("props"))
      edges.select(concat(
        lit(s"MERGE (a:$srcLabel {id: '"), esc(col("src_id")),
        lit(s"'}) MERGE (b:$dstLabel {id: '"), esc(col("dst_id")),
        lit("'}) MERGE (a)-[r:"), ident(col("rel")), lit("]->(b)"),
        array_join(transform(
          filter(col("props"), p => p.getField("v").isNotNull),
          p => concat(lit(" SET r."), ident(p.getField("k")),
            lit(" = '"), esc(p.getField("v")), lit("'"))), ""),
        lit(";")).as("cypher"))
    else
      edges.select(concat(
        lit(s"MERGE (a:$srcLabel {id: '"), esc(col("src_id")),
        lit(s"'}) MERGE (b:$dstLabel {id: '"), esc(col("dst_id")),
        lit("'}) MERGE (a)-[:"), ident(col("rel")), lit("]->(b);")).as("cypher"))
  }

  /** Minimal bolt-session surface [[cypherExecute]] drives — the three
    * calls the reference makes on its neo4j session (`cypher_neo4j.py:24`:
    * run inside a transaction, commit, close). Production adapts the real
    * Neo4j java driver behind it; no driver ships in this environment, so
    * specs inject a counting fake through the same seam.
    */
  trait CypherSession extends AutoCloseable {
    def run(statement: String): Unit
    def commit(): Unit
  }

  /** Cypher statement executor (reference `cypher_neo4j.py:8`
    * `Neo4JExecutor`): drive a `cypher` statement column (from
    * [[cypherStatements]]) through a pluggable session factory with
    * `foreachPartition` — one session per PARTITION (the reference holds
    * one per node thread), statements grouped into transactions of
    * `batchSize` (the reference commits per message; batching is the
    * documented knob it exposes but never uses). The factory must be
    * serializable — it is constructed ON the executors, where the
    * connections must live; a driver-side session would funnel the whole
    * graph write through one machine. Returns the executed-statement
    * count (accumulator, exact on success; like all foreach-style sinks,
    * task RETRIES can replay statements — MERGE-style idempotent cypher
    * is the contract, same as the reference's).
    */
  def cypherExecute(statements: DataFrame,
                    sessionFactory: () => CypherSession,
                    batchSize: Int = 100): Long = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val acc = statements.sparkSession.sparkContext.longAccumulator("cypher_statements")
    statements.select(col("cypher").cast(org.apache.spark.sql.types.StringType))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val s = sessionFactory()
        try {
          var inBatch = 0
          while (it.hasNext) {
            s.run(it.next().getString(0))
            acc.add(1)
            inBatch += 1
            if (inBatch >= batchSize) { s.commit(); inBatch = 0 }
          }
          if (inBatch > 0) s.commit()
        } finally s.close()
      }
    acc.value
  }

  /** Partition-layout parquet write: one directory per value of the
    * partition columns. THE storage practice for big corpora — a reader
    * filtering on the partition key scans only matching directories
    * (partition pruning, asserted in PlanSpec), so `WHERE lang = 'en'`
    * over 100 TB touches only the English shard. Partition by LOW
    * cardinality columns only (each value is a directory).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.write.partitionBy(partitionCols: _*).mode(mode).parquet(path)

  /** Clustered parquet write: directory partitioning + in-file row
    * ordering + bounded file sizes — the full data-layout contract for
    * scan-time skipping at 100 TB. `sortCols` cluster rows WITHIN each
    * output file so parquet row-group min/max statistics become selective
    * (a filter on a sort column skips whole row groups);
    * `maxRecordsPerFile` caps file size without an extra shuffle.
    */
  def writeClustered(df: DataFrame, path: String, partitionCols: Seq[String],
                     sortCols: Seq[String], maxRecordsPerFile: Long = 0L,
                     mode: String = "overwrite",
                     bloomFilterCols: Seq[String] = Nil,
                     bloomNdv: Long = 0L): Unit = {
    val sorted = df.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    var w = sorted.write.partitionBy(partitionCols: _*).mode(mode)
    if (maxRecordsPerFile > 0) w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    // parquet BLOOM FILTERS on the named columns — the point-lookup lever
    // for columns that are NOT the sort key: directory partitioning and
    // row-group min/max stats only prune on clustered dimensions, but a
    // probe `WHERE id = x` on a scattered column (the dedup/index id
    // lookup shape) must otherwise read every row group. The reader
    // (parquet-mr under Spark's pushed filters) tests each row group's
    // bloom before decoding a page — measured 7-9× on a 2M-row point
    // probe (plans/LAYOUT.md r11). Size `bloomNdv` near the DISTINCT
    // count per row group (not the table): an oversized bloom is pure
    // footer bytes (bench: ndv=|table| on 62k-row files more than
    // doubled the file size; right-sized it is ~2%).
    bloomFilterCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
      if (bloomNdv > 0)
        w = w.option(s"parquet.bloom.filter.expected.ndv#$c", bloomNdv.toString)
    }
    w.parquet(path)
  }

  /** Hive-bucketed table write (r13) — the CO-LOCATED-JOIN layout: both
    * sides of a recurring equi-join written `bucketBy(n, key)` with the
    * SAME bucket count join WITHOUT a shuffle (Spark's bucketed scan
    * reports the hash partitioning, so the SortMergeJoin's Exchange
    * requirement is already satisfied — plan-pinned by PlanBudgetSpec /
    * LayoutSpec). At 100 TB this converts the fact⋈fact join that
    * dominates a recurring pipeline from two corpus shuffles per RUN
    * into one bucketed write per INGEST — the bucketing lever the
    * [[writeClustered]] scaladoc's row-group story does not cover
    * (min/max stats prune scans; bucketing removes exchanges).
    *
    * `sortCols` pre-sorts within buckets (Spark still per-partition
    * sorts the SMJ inputs when files-per-bucket > 1; the in-file order
    * still buys row-group selectivity on the key). Bucketed layouts are
    * TABLES (the bucket spec lives in the catalog, not the directory),
    * so the write is `saveAsTable` with an explicit `path` — readers use
    * `spark.table(name)`; a plain parquet read of the path sees the same
    * rows without the bucketing metadata (correctness never depends on
    * the layout).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCols: Seq[String], buckets: Int,
                    sortCols: Seq[String] = Nil,
                    mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed: bucketCols must be non-empty")
    require(buckets > 0, s"writeBucketed: buckets must be positive, got $buckets")
    var w = df.write.mode(mode).format("parquet").option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Atomic-swap parquet rewrite — the safe way to write an index-delta
    * result BACK over the live directory it was read from (the
    * [[graft.streaming.Streams.compactIndex]] device, generalized to any
    * parquet dir): materialize to `<dir>.next`, then two renames swap it
    * in, so no reader ever sees a half-written directory and a crash at
    * ANY point leaves either the old data or a completed `.next` (marked
    * `_SWAP_READY` once its write job finishes) that [[recoverSwap]] —
    * the restart step, run before delta frames are built — promotes, so
    * completed-but-unswapped deltas are kept rather than redone. The in-place
    * alternative — `mode("overwrite")` onto `dir` — deletes the input
    * BEFORE the job that reads it finishes planning, and a failure
    * mid-write loses the index outright.
    *
    * The only residual window is the microseconds between the two
    * renames, during which a CONCURRENT reader's file listing can miss
    * the dir — the single-writer cadence (or the one-shot listing retry,
    * [[graft.streaming.Streams]]' readIndex recipe) covers it. The four
    * stored-index families' delta functions ([[graft.similarity.Pq
    * .indexCodesDelta]], `Sq.indexCodesDelta`, `Search.lexIndexDelta`,
    * [[graft.similarity.MaxSim.indexMatsDelta]]) all say "the caller
    * writes the result back" — this is the writer they mean.
    *
    * NOTE: the maintained frame READS from `dir`, so it must be fully
    * materialized before `dir` can move — the write to `.next` does that;
    * the renames run after the job completes.
    *
    * CONSTRAINT (r14): the two-rename protocol requires an ATOMIC, O(1)
    * `FileSystem.rename` — HDFS, POSIX local, viewfs, Ozone. On S3-class
    * object stores (s3a, gs, abfs, wasb, oss, …) rename is COPY+DELETE:
    * non-atomic (a crash mid-copy leaves a half-copied destination that
    * the marker protocol would trust) and O(data) (the swap costs a full
    * index copy per generation). For those, [[swapWrite]] automatically
    * switches to the generation-POINTER protocol (immutable `gen-N/`
    * directories + a tiny `_CURRENT` pointer file — no directory ever
    * moves; see [[resolveLive]]); force either via the
    * `spark.graft.swap.protocol` conf (`rename` | `pointer` | `auto`).
    * A directory already in pointer layout stays pointer regardless of
    * the conf. plans/LAYOUT.md states the full deployment matrix.
    *
    * Pointer-protocol retention honors `spark.graft.swap.keepGenerations`
    * (count, default 2) AND `spark.graft.swap.keepMinAgeMs` (time floor,
    * default 0): a ready generation is retired only when beyond the
    * count bound and older than the floor — the reader SLA "any scan
    * that resolved `_CURRENT` within the last keepMinAgeMs finds every
    * file it listed", which the count bound alone cannot promise under
    * back-to-back maintain bursts.
    */
  def swapWrite(df: DataFrame, dir: String,
                partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    // siblings derive from the NORMALIZED path (Path strips trailing
    // slashes): raw `dir + ".next"` on "/data/idx/" would put .next
    // INSIDE the live directory and the swap would silently no-op
    val d = new Path(dir)
    val next = new Path(d.getParent, d.getName + ".next")
    val old = new Path(d.getParent, d.getName + ".old")
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // r14: the two-rename protocol below assumes `FileSystem.rename` is
    // ATOMIC and O(1) — true on HDFS/POSIX, FALSE on S3-class object
    // stores (rename = copy+delete, non-atomic, O(data)). There, the
    // generation-POINTER protocol is used instead: no directory ever
    // moves. Dispatch: an existing pointer LAYOUT always stays pointer
    // (the on-disk truth outranks configuration), else the
    // `spark.graft.swap.protocol` conf / filesystem scheme decides.
    if (swapProtocol(spark, fs, d) == "pointer") {
      swapWritePointer(df, dir, partitionCols)
      return
    }
    // every rename/delete result is CHECKED: Hadoop FileSystem signals
    // most failures by returning false, not throwing — an unchecked
    // false here would return "success" with the live dir still holding
    // old data and the only copy of the update stranded in .next, which
    // the NEXT call's cleanup would then delete
    def renameOrDie(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"swapWrite: rename $from -> $to failed")
    def deleteOrDie(p: Path): Unit =
      require(!fs.exists(p) || fs.delete(p, true),
        s"swapWrite: delete $p failed")
    // recovery: a stranded swap from a crashed earlier run finishes first
    // when the live dir is GONE and the .next carries its _SWAP_READY
    // marker (the between-renames crash window — post-marker writes
    // always carry it through that window). The marker is REQUIRED even
    // with the live dir missing: a FIRST-generation swapWrite runs its
    // write job with no live dir existing at all, so a crash mid-write
    // leaves an unmarked partial .next beside a missing live dir —
    // promoting that carcass would hand every downstream delta a
    // partial index. Unmarked .next falls through to the cleanup delete
    // below. A completed .next BESIDE a live dir (crash after the write
    // job, before the first rename) is NOT promoted here either: the
    // caller's input frame was already constructed against the live dir,
    // and Spark file indexes list eagerly — renaming the live dir away
    // now would fail that frame's tasks on deleted files mid-job.
    // [[recoverSwap]], run BEFORE delta frames are built, is the path
    // that promotes it; reaching this line without it means the caller
    // recomputed the same deterministic delta against the unchanged live
    // generation, so discarding the stranded copy costs the redo but
    // never correctness.
    if (!fs.exists(d) && fs.exists(next) && fs.exists(markerPath(next)))
      renameOrDie(next, d)
    deleteOrDie(markerPath(d))
    deleteOrDie(old)
    deleteOrDie(next)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(next.toString)
    // the marker commits the write: from here on, recovery PROMOTES this
    // .next instead of redoing the delta (an underscore file — the
    // _SUCCESS convention — so parquet readers never see it)
    fs.create(markerPath(next), true).close()
    if (fs.exists(d)) renameOrDie(d, old)
    renameOrDie(next, d)
    deleteOrDie(markerPath(d))
    deleteOrDie(old)
  }

  /** The `_SWAP_READY` marker a completed-but-unswapped `<dir>.next`
    * carries (written by [[swapWrite]] after its write job finishes,
    * removed once the swap lands).
    */
  private def markerPath(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p, "_SWAP_READY")

  /** Finish a [[swapWrite]] interrupted by a crash — the RESTART step a
    * maintenance loop runs BEFORE constructing its delta frames. Promotes
    * a completed `<dir>.next` — identified by its `_SWAP_READY` marker,
    * which is REQUIRED: post-marker writes carry it through every window
    * a promotable .next can exist in (including between the two renames,
    * when the live dir is briefly missing), so a marker-less .next is
    * always a mid-write carcass, never a completed swap. The one case a
    * missing live dir does NOT imply a completed write is exactly the
    * dangerous one — a FIRST-generation swapWrite (no live dir exists
    * during its write job) that crashed mid-write: promoting that
    * unmarked partial would hand the maintenance loop a half-written
    * index to build every subsequent delta on. Such a carcass beside a
    * missing live dir is deleted here (there is no old data to preserve
    * and [[swapWrite]]'s own cleanup would delete it anyway); a carcass
    * beside a LIVE dir is left for swapWrite's cleanup. Returns true
    * when a stranded swap was promoted.
    *
    * Ordering matters: promoting moves the live directory, so frames
    * already listed against it would fail on deleted files — which is why
    * [[swapWrite]] itself cannot do this once the caller's inputs exist.
    */
  def recoverSwap(spark: SparkSession, dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val d = new Path(dir)
    val next = new Path(d.getParent, d.getName + ".next")
    val old = new Path(d.getParent, d.getName + ".old")
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a pointer-layout dir recovers via the pointer protocol (layout
    // outranks conf — the residues on disk are pointer-shaped)
    if (isPointerLayout(fs, d)) return recoverSwapPointer(fs, d)
    def renameOrDie(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"recoverSwap: rename $from -> $to failed")
    def deleteOrDie(p: Path): Unit =
      require(!fs.exists(p) || fs.delete(p, true),
        s"recoverSwap: delete $p failed")
    val stranded = fs.exists(next) && fs.exists(markerPath(next))
    // first-generation mid-write carcass: unmarked .next, no live dir —
    // delete rather than promote (see scaladoc)
    if (!stranded && !fs.exists(d) && fs.exists(next)) deleteOrDie(next)
    if (stranded) {
      deleteOrDie(old)
      if (fs.exists(d)) renameOrDie(d, old)
      renameOrDie(next, d)
      deleteOrDie(markerPath(d))
      deleteOrDie(old)
    }
    stranded
  }

  // -------------------------------------------------------------------
  // generation-pointer swap protocol (r14) — the object-store-safe form
  // -------------------------------------------------------------------

  /** The pointer file naming a live generation (`gen-N`) inside a
    * pointer-layout directory, and the per-generation completion marker.
    * Both underscore-prefixed so parquet readers never see them.
    */
  val PointerFile = "_CURRENT"
  val GenReadyMarker = "_GEN_READY"
  private val GenPrefix = "gen-"

  /** Filesystems whose `rename` is atomic and O(1) — the two-rename
    * protocol's requirement. Everything else (s3a, gs, abfs, wasb, oss,
    * …: rename = copy+delete) gets the pointer protocol under `auto`.
    */
  private val renameAtomicSchemes =
    Set("file", "hdfs", "viewfs", "o3fs", "ofs", "alluxio")

  /** Protocol for one swap target: an existing pointer LAYOUT always
    * stays pointer (the on-disk state outranks configuration — flipping
    * the conf must not strand readers of `_CURRENT`); otherwise the
    * `spark.graft.swap.protocol` conf decides (`rename` | `pointer` |
    * default `auto` = by filesystem scheme).
    */
  private def swapProtocol(spark: SparkSession,
                           fs: org.apache.hadoop.fs.FileSystem,
                           d: org.apache.hadoop.fs.Path): String =
    if (isPointerLayout(fs, d)) "pointer"
    else spark.conf.get("spark.graft.swap.protocol", "auto") match {
      case "auto" =>
        if (renameAtomicSchemes(Option(fs.getScheme).getOrElse("file")))
          "rename"
        else "pointer"
      case p @ ("rename" | "pointer") => p
      case other => throw new IllegalArgumentException(
        s"spark.graft.swap.protocol must be rename|pointer|auto, got $other")
    }

  private def isPointerLayout(fs: org.apache.hadoop.fs.FileSystem,
                              d: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(d, PointerFile)) ||
      (fs.exists(d) && fs.listStatus(d).exists(st =>
        st.isDirectory && genNumber(st.getPath.getName).isDefined))

  private def genNumber(name: String): Option[Long] =
    if (name.startsWith(GenPrefix)) name.drop(GenPrefix.length).toLongOption
    else None

  /** generation directories under `d`, numerically ascending. */
  private def listGens(fs: org.apache.hadoop.fs.FileSystem,
                       d: org.apache.hadoop.fs.Path)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.filter(_.isDirectory)
      .flatMap(st => genNumber(st.getPath.getName).map(_ -> st.getPath))
      .sortBy(_._1)

  private def genReady(fs: org.apache.hadoop.fs.FileSystem,
                       p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(p, GenReadyMarker))

  /** the generation number `_CURRENT` names, if the pointer exists and
    * parses (a torn/empty pointer — impossible under atomic PUT, handled
    * defensively — reads as absent and readers fall back to the newest
    * READY generation, which is never older than a valid pointer). The
    * exists→open pair is not atomic: a writer's delete→rename update can
    * land between the two calls, so a vanished pointer reads as absent
    * too — the same fallback covers it.
    */
  private def readPointer(fs: org.apache.hadoop.fs.FileSystem,
                          d: org.apache.hadoop.fs.Path): Option[Long] = {
    val pf = new org.apache.hadoop.fs.Path(d, PointerFile)
    if (!fs.exists(pf)) None
    else {
      try {
        val in = fs.open(pf)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        genNumber(txt)
      } catch {
        case _: java.io.FileNotFoundException => None
      }
    }
  }

  /** Atomically re-point `_CURRENT` at `gen`: write `_CURRENT.tmp`,
    * delete the old pointer, rename the tmp in. On an object store each
    * step is a single small-OBJECT operation (atomic PUT / DELETE / a
    * one-object copy) — never an O(data) directory move; the only
    * residue window is a missing pointer between the delete and the
    * rename, which readers resolve by falling back to the newest READY
    * generation (= the one this pointer names).
    */
  private def writePointer(fs: org.apache.hadoop.fs.FileSystem,
                           d: org.apache.hadoop.fs.Path, gen: Long): Unit = {
    val pf = new org.apache.hadoop.fs.Path(d, PointerFile)
    val tmp = new org.apache.hadoop.fs.Path(d, PointerFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$GenPrefix$gen".getBytes("UTF-8")) finally out.close()
    require(!fs.exists(pf) || fs.delete(pf, false),
      s"writePointer: delete $pf failed")
    require(fs.rename(tmp, pf), s"writePointer: rename $tmp -> $pf failed")
  }

  /** Resolve the directory a READER should scan: for a pointer-layout
    * dir, the live `gen-N` subdirectory (`_CURRENT`, falling back to the
    * newest READY generation when the pointer is mid-update); for a
    * rename-layout (or not-yet-existing) dir, the dir itself. Every
    * stored-index read goes through here (via
    * [[graft.streaming.Streams.readIndex]]), so the two protocols are
    * interchangeable to readers.
    */
  def resolveLive(spark: SparkSession, dir: String): String = {
    import org.apache.hadoop.fs.Path
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!isPointerLayout(fs, d)) dir
    else {
      val target = readPointer(fs, d)
        .map(n => new Path(d, s"$GenPrefix$n"))
        .filter(fs.exists(_))
        .orElse(listGens(fs, d).filter(g => genReady(fs, g._2))
          .lastOption.map(_._2))
      target.fold(dir)(_.toString)
    }
  }

  /** The pointer-protocol form of [[swapWrite]]: write the frame into a
    * FRESH immutable `gen-N/` (no live data is touched — the maintained
    * frame keeps reading its own generation throughout), mark it
    * `_GEN_READY` once the job commits, atomically re-point `_CURRENT`,
    * then retire all but the newest `keepGens` ready generations (the
    * retained predecessor covers readers that resolved the previous
    * pointer and are still scanning — the pointer protocol's analogue of
    * the rename protocol's between-renames listing retry, but a full
    * GENERATION wide instead of microseconds). Unready carcasses from
    * crashed writes are cleaned at entry; a legacy FLAT (rename-layout)
    * dir migrates: its old content is deleted only after the pointer
    * lands.
    *
    * Crash windows (each green in PointerSwapSpec):
    *  - mid-write: an unready `gen-N` carcass, pointer unchanged — next
    *    entry cleans it, the replayed generation lands as `gen-N+1`;
    *  - post-ready, pre-pointer: recovery ([[recoverSwap]]) PROMOTES the
    *    newest ready generation by re-pointing — no data moves;
    *  - mid-pointer-update (pointer deleted, tmp not yet renamed):
    *    readers fall back to the newest ready generation; recovery
    *    rewrites the pointer.
    */
  private def swapWritePointer(df: DataFrame, dir: String,
                               partitionCols: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keepGens = spark.conf.get("spark.graft.swap.keepGenerations", "2").toInt
    require(keepGens >= 1, s"keepGenerations must be >= 1, got $keepGens")
    // legacy RENAME-protocol residue (a protocol switch mid-life): finish
    // a stranded two-rename swap first — a MARKED sibling `.next` is a
    // completed generation that must be promoted, not orphaned — then
    // clear carcass siblings; the pointer protocol never looks at them
    // again
    val next = new Path(d.getParent, d.getName + ".next")
    val old = new Path(d.getParent, d.getName + ".old")
    if (!fs.exists(d) && fs.exists(next) && fs.exists(markerPath(next)))
      require(fs.rename(next, d), s"swapWritePointer: rename $next -> $d failed")
    def deleteOrDie(p: Path): Unit =
      require(!fs.exists(p) || fs.delete(p, true),
        s"swapWritePointer: delete $p failed")
    deleteOrDie(markerPath(d))
    deleteOrDie(old)
    deleteOrDie(next)
    val cur = readPointer(fs, d)
    val legacyFlat = fs.exists(d) && !isPointerLayout(fs, d)
    // clean unready carcasses (a crashed write's partial generation is
    // referenced by nothing; the pointed generation is never touched)
    listGens(fs, d).filterNot { case (n, p) =>
      cur.contains(n) || genReady(fs, p)
    }.foreach { case (_, p) => deleteOrDie(p) }
    val nextN =
      (listGens(fs, d).map(_._1) ++ cur).foldLeft(-1L)(_ max _) + 1
    val gen = new Path(d, s"$GenPrefix$nextN")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(gen.toString)
    fs.create(new Path(gen, GenReadyMarker), true).close()
    writePointer(fs, d, nextN)
    // retention: the new generation + its keepGens-1 newest predecessors
    // always survive; `spark.graft.swap.keepMinAgeMs` (default 0 = count
    // only) is a TIME floor on top — a generation is retired only when
    // BOTH beyond keepGenerations AND it was SUPERSEDED more than the
    // floor ago. The count bound covers "a reader resolved the previous
    // pointer and is still scanning"; the floor turns that into an
    // explicit reader SLA ("any scan that resolved _CURRENT in the last
    // N ms finds every file it listed") that survives bursts of
    // back-to-back maintains (contract: plans/LAYOUT.md). The floor
    // clock starts at SUPERSESSION, not at the generation's own
    // readiness: reader exposure ends when the pointer moves OFF a
    // generation, which happens the instant its oldest READY successor's
    // marker lands (writePointer immediately follows the marker).
    // Measuring from the candidate's own _GEN_READY mtime (the r14 form)
    // broke the SLA exactly for long-lived generations: one current for
    // hours and then superseded by two back-to-back maintains was past
    // both bounds at the second maintain and vanished milliseconds after
    // it stopped being current (ADVICE r15). A candidate whose successor
    // marker cannot be read counts as just-superseded (age 0) and
    // survives any positive floor — conservative, never the reverse.
    val keepMinAgeMs =
      spark.conf.get("spark.graft.swap.keepMinAgeMs", "0").toLong
    val nowMs = System.currentTimeMillis()
    val readyGens = listGens(fs, d).filter { case (_, p) => genReady(fs, p) }
    def readyMtime(p: Path): Option[Long] =
      try Some(fs.getFileStatus(new Path(p, GenReadyMarker))
        .getModificationTime)
      catch { case _: java.io.FileNotFoundException => None }
    def supersededAgeMs(n: Long): Long =
      readyGens.find(_._1 > n).flatMap(g => readyMtime(g._2))
        .map(nowMs - _).getOrElse(0L)
    readyGens.filter(_._1 != nextN)
      .dropRight(keepGens - 1)
      .filter { case (n, _) => supersededAgeMs(n) >= keepMinAgeMs }
      .foreach { case (_, p) => deleteOrDie(p) }
    // legacy flat content (a rename-protocol life before the protocol
    // switch) is retired only now — the input frame read those files and
    // the write job above fully materialized before anything is deleted
    // (the same ordering contract the rename protocol's .next gives)
    if (legacyFlat)
      fs.listStatus(d).foreach { st =>
        val n = st.getPath.getName
        if (genNumber(n).isEmpty && n != PointerFile &&
          n != PointerFile + ".tmp") deleteOrDie(st.getPath)
      }
  }

  /** [[recoverSwap]]'s pointer-protocol arm: promote the newest READY
    * generation when the pointer is stale or mid-update — a pure pointer
    * rewrite, no data moves, so (unlike the rename protocol's promotion)
    * it is safe even with reader frames already listed against the old
    * generation: their files stay on disk until retention. Returns true
    * when a promotion happened.
    */
  private def recoverSwapPointer(fs: org.apache.hadoop.fs.FileSystem,
                                 d: org.apache.hadoop.fs.Path): Boolean = {
    val newestReady = listGens(fs, d).filter(g => genReady(fs, g._2))
      .lastOption.map(_._1)
    val cur = readPointer(fs, d)
    newestReady match {
      case Some(n) if !cur.contains(n) => writePointer(fs, d, n); true
      case _ => false
    }
  }

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(bytes / targetBytes)` files at `outDir`. Streaming ingest and
    * per-batch appends accrete thousands of KB-sized files; at scale the
    * file COUNT becomes the bottleneck (driver listing, task scheduling,
    * open-per-file overhead), so periodic compaction is standard hygiene.
    *
    * `coalesce`, not `repartition`: compaction must not pay a shuffle —
    * coalesce merges read-splits locally. Writes to a NEW directory and
    * returns (filesBefore, filesAfter); the caller swaps directories once
    * satisfied (in-place rewrites that can fail halfway are how data is
    * lost).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(conf)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) parquetFiles(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st) else Nil
      }
    // Hive-partitioned input (col=value directory levels) must rewrite with
    // the SAME partitionBy — Spark folds partition directories into ordinary
    // data columns on read, so a flat rewrite would silently destroy the
    // directory layout and every downstream reader's partition pruning.
    // The column chain is read off the directory names, one level at a time,
    // and VALIDATED: every sibling directory at a level must carry the same
    // `col=` prefix (a directory mixing hive and plain subdirs, or a data
    // dir whose name merely contains '=', must fail loudly rather than
    // rewrite with a guessed-wrong layout), and the detected chain is
    // cross-checked below against the columns Spark actually infers.
    def partitionColsOf(p: org.apache.hadoop.fs.Path): Seq[String] = {
      val dirs = fs.listStatus(p).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
      }
      val prefixes = dirs.map(_.getPath.getName.split("=", 2)).collect {
        case Array(c, _) => c
      }
      if (prefixes.isEmpty) Nil
      else {
        require(prefixes.size == dirs.size && prefixes.distinct.size == 1,
          s"compact: inconsistent partition layout under $p — sibling " +
            s"directories ${dirs.map(_.getPath.getName).mkString(", ")} do " +
            "not all share one 'col=' prefix; refusing to guess a partitionBy")
        prefixes.head +: partitionColsOf(dirs.head.getPath)
      }
    }
    val partCols = partitionColsOf(in)
    val before = parquetFiles(in)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val src = spark.read.parquet(inDir)
    require(partCols.forall(src.columns.contains),
      s"compact: directory-derived partition columns ${partCols.mkString(",")} " +
        s"not all present in Spark's inferred schema ${src.columns.mkString(",")}" +
        " — partition inference disagrees; refusing to rewrite")
    val w = src.coalesce(n).write.mode("overwrite")
    // coalesce+partitionBy yields ≤ n files PER partition value (each task
    // splits its rows by directory) — still bounded, still shuffle-free.
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(outDir)
    (before.size.toLong,
      parquetFiles(new org.apache.hadoop.fs.Path(outDir)).size.toLong)
  }

  /** Generic JDBC writer (reference civis/mysql writer nodes:
    * `civis_nodes.py` ensure-table/SQL-execute, `node.py` MySQL inserts).
    * `mode="overwrite"` drops and recreates the table (the reference's
    * ensure-table-exists + replace flow). Round-trip correctness against an
    * embedded Derby is oracled by q_jdbc_roundtrip.
    */
  def jdbcWrite(df: DataFrame, url: String, table: String,
                options: Map[String, String] = Map.empty,
                mode: String = "append"): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()

  /** Z-order cell ids for `cols`: each column linearly binned to
    * `[0, 2^bits)` with PURE INTEGER arithmetic —
    * `((v - min) * 2^bits) div (max - min + 1)` over BIGINT — then
    * round-robin bit-interleaved into one Morton key (see
    * [[org.apache.spark.sql.graftglue.InterleaveBits]]).
    *
    * Scale shape: ONE min/max aggregate job (2·d driver-side values — a
    * model-sized collect, like k-means centroids), then a zero-shuffle
    * codegen projection over the corpus. Linear binning (not
    * quantile/rank binning) keeps the mapping a pure per-row expression:
    * no second pass, no sample-based boundaries, and an SQL oracle
    * reproduces every key bit-exactly — the variant Hudi calls
    * "linear mapping" for its z-curve clustering. Skewed columns bin
    * unevenly under it; pre-transform (log, bucket id) if that matters.
    *
    * Returns `df` plus `zval`. Columns must be integral-castable;
    * `d * bits` must stay ≤ 63.
    */
  def zorderValue(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"zorderValue: ${cols.size} cols x $bits bits must be in (0, 63]")
    val nbins = 1L << bits
    val bounds = df.select(
      cols.flatMap(c => Seq(min(col(c).cast("long")), max(col(c).cast("long")))): _*)
      .head()
    // empty input / all-null column: no bounds, so no meaningful bins —
    // key everything 0 (an empty write stays empty; the plain-parquet
    // path would also have produced no clustering)
    if (cols.indices.exists(i => bounds.isNullAt(2 * i)))
      return df.withColumn("zval", lit(0L))
    val bins = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
      // the multiply must stay in BIGINT: (hi-lo)*nbins ≤ Long.Max, loudly
      // checked — a full-range column (e.g. a raw xxhash64) would silently
      // wrap into garbage bins; pre-bucket it (`v div 2^k`) before z-ordering
      require(hi - lo >= 0 && hi - lo <= Long.MaxValue / nbins - 1,
        s"zorderValue: column `$c` spans [$lo, $hi] — too wide for $bits-bit " +
          s"binning without BIGINT overflow; pre-scale it (e.g. `$c` div " +
          s"${1L << 32}) before z-ordering")
      // ((v - lo) * nbins) div (hi - lo + 1) ∈ [0, nbins) — BIGINT `div`,
      // never `/` (double rounding near exact multiples would flip bins)
      expr(s"((cast(`$c` as bigint) - (${lo}L)) * ${nbins}L) " +
        s"div ${hi - lo + 1L}L")
    }
    df.withColumn("zval", org.apache.spark.sql.graftglue.ColumnBridge.column(
      org.apache.spark.sql.graftglue.InterleaveBits(
        org.apache.spark.sql.graftglue.ColumnBridge.expression(array(bins: _*)),
        bits)))
  }

  /** Z-order clustered parquet write: Morton keys ([[zorderValue]]), range
    * partition into `numFiles` contiguous key ranges, sort within each, drop
    * the key, write. Each file then covers a small hyper-rectangle of the
    * `zCols` space, so per-file/per-row-group min/max stats prune scans for
    * predicates on ANY clustered column — where a single-column sort only
    * serves its leading column and a point/box predicate on the second
    * column touches EVERY file. THE layout for multi-predicate scans over
    * 100 TB (measured file-skip table: `plans/LAYOUT.md`).
    *
    * Cost: the min/max job plus ONE range-partition shuffle — identical
    * movement to a plain global sort; the clustering win is free beyond it.
    */
  def zorderWrite(df: DataFrame, path: String, zCols: Seq[String],
                  bits: Int = 8, numFiles: Int = 64,
                  mode: String = "overwrite"): Unit =
    zorderValue(df, zCols, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode(mode).parquet(path)

  /** Deterministic global corpus shuffle for training-order reproducibility:
    * every row lands in shard `md5(seed|id) mod numShards`, written as one
    * `shard=` directory, ordered inside by the same seeded hash. The
    * assignment is a pure function of (seed, id) — NOT of cluster
    * parallelism, input split order, or a Partitioner instance — so two
    * runs at different parallelism emit byte-identical shard contents, and
    * changing `seed` is a fresh epoch-order permutation. This is the
    * "global shuffle before training" step LLM data pipelines run after
    * curation (sequential readers then see an i.i.d.-like stream; no
    * shuffle buffer can fix a corpus written in crawl order).
    *
    * Scale shape: one hash-partition shuffle on the shard id + a per-task
    * sort — no global ordering structure, no driver state. The oracled
    * query form is [[graft.operators.Ops]]-style `corpusShuffle` in
    * `SparkEntry` (q_corpus_shuffle) pinning shard AND in-shard position.
    */
  def shuffledWrite(df: DataFrame, path: String, idCol: String,
                    seed: Long, numShards: Int,
                    mode: String = "overwrite"): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.withColumn("__key", Ops.shuffleKey(idCol, seed))
      .withColumn("shard", Ops.shuffleShard(col("__key"), numShards))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "__key")
      .drop("__key")
      .write.partitionBy("shard").mode(mode).parquet(path)
  }
}
