package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.{ColumnBridge, InterleaveBits}

import graft.operators.{Ops, Sinks}

/** Z-order layout + deterministic corpus shuffle (beyond-reference D5/G
  * extensions; oracled as q_zorder / q_corpus_shuffle).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def interleave(bits: Int, vs: Long*): Long = {
    var out = 0L
    for (i <- 0 until bits; j <- vs.indices)
      out |= ((vs(j) >>> i) & 1L) << (i * vs.size + j)
    out
  }

  test("InterleaveBits matches the reference interleave through codegen") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L),
      (200L, 13L), (255L, 0L))
    val got = rows.toDF("x", "y")
      .withColumn("z", ColumnBridge.column(InterleaveBits(
        ColumnBridge.expression(array(col("x"), col("y"))), 8)))
      .select("x", "y", "z").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == interleave(8, x, y)) }
    // dim 0 owns the even (least-significant) bit positions
    assert(interleave(8, 1L, 0L) == 1L && interleave(8, 0L, 1L) == 2L)
    // three dims, and only the low `bits` bits are read
    val z3 = Seq((5L, 6L, 7L)).toDF("a", "b", "c")
      .withColumn("z", ColumnBridge.column(InterleaveBits(
        ColumnBridge.expression(array(col("a") + 256L, col("b"), col("c"))), 8)))
      .select("z").as[Long].head()
    assert(z3 == interleave(8, 5L, 6L, 7L))
  }

  test("InterleaveBits: null element nulls out; >63 result bits throws") {
    val withNull = Seq((1L, Some(2L)), (3L, None)).toDF("x", "y")
      .withColumn("z", ColumnBridge.column(InterleaveBits(
        ColumnBridge.expression(array(col("x"), col("y"))), 8)))
    assert(withNull.select("z").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet ==
      Set(Some(interleave(8, 1L, 2L)), None))
    val e = intercept[Exception] {
      Seq((1L, 2L)).toDF("x", "y")
        .select(ColumnBridge.column(InterleaveBits(
          ColumnBridge.expression(array(col("x"), col("y"))), 32)))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("zorderValue is a zero-shuffle projection with bins in [0, 2^bits)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("cents", expr("cast(floor(o_totalprice * 100) as bigint)"))
    val z = Sinks.zorderValue(orders, Seq("o_custkey", "cents"), bits = 8)
    // the min/max pass is a separate job; the keyed frame itself must add
    // no exchange over the scan (pure codegen projection)
    assert(!z.queryExecution.executedPlan.toString.contains("Exchange"))
    // every key stays under 2^16 (8 bits per dim, 2 dims), none negative
    val (lo, hi) = z.agg(min("zval"), max("zval")).as[(Long, Long)].head()
    assert(lo >= 0L && hi < (1L << 16))
  }

  test("zorderWrite preserves content and skips files linear sort cannot") {
    val base = java.nio.file.Files.createTempDirectory("graft_zw").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("cents", expr("cast(floor(o_totalprice * 100) as bigint)"))
      .select("o_orderkey", "o_custkey", "cents")
    Sinks.zorderWrite(orders, s"$base/z", Seq("o_custkey", "cents"),
      bits = 8, numFiles = 16)
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$base/lin")
    val back = spark.read.parquet(s"$base/z")
    assert(back.columns.toSeq == orders.columns.toSeq) // zval dropped
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    def stats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min("cents").as("lp"), max("cents").as("hp"))
    // a band predicate on the SECOND dimension: a custkey-sorted layout
    // spreads cents uniformly through every file (all files candidate);
    // z-order files cover small rectangles, so most files' [min,max] miss
    val (plo, phi) = orders.agg(min("cents"), max("cents")).as[(Long, Long)].head()
    val w = (phi - plo + 1) / 8
    val (b1, b2) = (plo + 3 * w, plo + 4 * w - 1)
    def candidates(dir: String): Long =
      stats(dir).filter(col("hp") >= b1 && col("lp") <= b2).count()
    val (zc, lc) = (candidates(s"$base/z"), candidates(s"$base/lin"))
    assert(zc * 2 <= lc, s"z-order candidates $zc not < half of linear $lc")
  }

  test("corpusShuffle is invariant to input partitioning and covers shards") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(parts: Int) =
      Ops.corpusShuffle(docs.repartition(parts), "doc_id", seed = 7L,
          numShards = 8)
        .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect().toSet
    val a = run(3)
    assert(a == run(11)) // parallelism-free assignment AND order
    assert(a.map(_._2) == (0L until 8L).toSet)
    // per-shard positions are contiguous 1..n
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size)) }
    // a different seed is a different permutation
    val b = Ops.corpusShuffle(docs, "doc_id", seed = 8L, numShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect().toSet
    assert(a != b && a.map(_._1) == b.map(_._1))
  }

  test("shuffledWrite emits byte-identical shards at any parallelism") {
    val base = java.nio.file.Files.createTempDirectory("graft_sw").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    Sinks.shuffledWrite(docs.repartition(2), s"$base/a", "doc_id",
      seed = 7L, numShards = 4)
    Sinks.shuffledWrite(docs.repartition(9), s"$base/b", "doc_id",
      seed = 7L, numShards = 4)
    for (s <- 0 until 4) {
      val a = spark.read.parquet(s"$base/a/shard=$s").select("doc_id")
        .as[Long].collect().toSeq
      val b = spark.read.parquet(s"$base/b/shard=$s").select("doc_id")
        .as[Long].collect().toSeq
      assert(a.nonEmpty && a == b, s"shard $s differs across parallelism")
    }
    // and the query form pins the written MEMBERSHIP (not just sizes — a
    // drifted assignment preserving shard counts must fail here)
    val want = Ops.corpusShuffle(docs, "doc_id", 7L, 4)
      .select("shard", "doc_id").as[(Long, Long)].collect().toSet
    val wrote = spark.read.parquet(s"$base/a")
      .select(col("shard").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(wrote == want)
  }

  test("zorderValue handles empty input and refuses overflow-wide columns") {
    val base = java.nio.file.Files.createTempDirectory("graft_ze").toString
    val empty = spark.range(0).selectExpr("id AS a", "id AS b")
    Sinks.zorderWrite(empty, s"$base/e", Seq("a", "b"), bits = 8, numFiles = 4)
    assert(spark.read.parquet(s"$base/e").count() == 0L) // no NPE, empty out
    // a raw xxhash64-style full-range column must fail loudly, not wrap
    val wide = Seq(Long.MinValue, 0L, Long.MaxValue).toDF("a")
      .withColumn("b", lit(1L))
    val e = intercept[IllegalArgumentException] {
      Sinks.zorderValue(wide, Seq("a", "b"), bits = 8)
    }
    assert(e.getMessage.contains("too wide") && e.getMessage.contains("div"))
  }

  test("RunPipeline layout directives route to the Sinks writers") {
    val base = java.nio.file.Files.createTempDirectory("graft_ld").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("cents", expr("cast(floor(o_totalprice * 100) as bigint)"))
      .select("o_orderkey", "o_custkey", "cents")
    RunPipeline.writeBatch(orders, s"$base/plain", None)
    assert(spark.read.parquet(s"$base/plain").count() == orders.count())
    RunPipeline.writeBatch(orders, s"$base/z",
      Some("zorder=o_custkey,cents,8,4"))
    val z = spark.read.parquet(s"$base/z")
    assert(z.count() == orders.count() && z.columns.toSeq == orders.columns.toSeq)
    RunPipeline.writeBatch(orders, s"$base/sh",
      Some("shuffled=o_orderkey,7,4"))
    assert((0 until 4).forall(s =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/sh/shard=$s"))))
    RunPipeline.writeBatch(
      orders.withColumn("bucket", pmod(col("o_custkey"), lit(3))),
      s"$base/pt", Some("partitioned=bucket"))
    assert(spark.read.parquet(s"$base/pt").columns.contains("bucket"))
    // bucketed=table,cols,n[,sortCols] (r13): a catalog bucketed table
    RunPipeline.writeBatch(orders, s"$base/bkt",
      Some("bucketed=ld_bkt_orders,o_orderkey,4,o_orderkey"))
    assert(spark.table("ld_bkt_orders").count() == orders.count())
    assert(spark.sql("DESCRIBE TABLE EXTENDED ld_bkt_orders").collect()
      .exists(r => r.getString(0) == "Num Buckets" && r.getString(1) == "4"))
    val e0 = intercept[Exception] {
      RunPipeline.writeBatch(orders, s"$base/badb", Some("bucketed=t,o_orderkey"))
    }
    assert(e0.getMessage.contains("bucketed layout needs"))
    intercept[Exception] {
      RunPipeline.writeBatch(orders, s"$base/bad", Some("sorted=o_custkey"))
    }
    // malformed zorder specs fail with the directive grammar, not a bare
    // NumberFormatException from a stray empty/misplaced token
    val e1 = intercept[IllegalArgumentException] {
      RunPipeline.writeBatch(orders, s"$base/bad2", Some("zorder=o_custkey,cents,"))
    }
    assert(e1.getMessage.contains("empty segment"))
    val e2 = intercept[IllegalArgumentException] {
      RunPipeline.writeBatch(orders, s"$base/bad3", Some("zorder=8,o_custkey"))
    }
    assert(e2.getMessage.contains("knobs LAST"))
  }

  test("writeBucketed: matching-bucket equi-join plans with ZERO exchanges " +
       "under the join, and the layout is transparent to results (r13)") {
    val base = java.nio.file.Files.createTempDirectory("bkt_spec").toString
    val left = spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") % 7).as("lv"))
    val right = spark.range(0, 1000).filter(col("id") % 2 === 0)
      .select(col("id").as("k"), (col("id") % 11).as("rv"))
    Sinks.writeBucketed(left, "bkt_spec_l", s"$base/l", Seq("k"), buckets = 4,
      sortCols = Seq("k"))
    Sinks.writeBucketed(right, "bkt_spec_r", s"$base/r", Seq("k"), buckets = 4)
    // hint the merge join the planner would pick at fact×fact scale —
    // toy fixtures broadcast otherwise and never exercise the layout
    val joined = spark.table("bkt_spec_l")
      .join(spark.table("bkt_spec_r").hint("merge"), "k")
    // values: exactly the plain join's
    val want = left.join(right, "k").orderBy("k")
      .as[(Long, Long, Long)].collect().toSeq
    assert(joined.orderBy("k").as[(Long, Long, Long)].collect().toSeq == want
      && want.size == 500)
    // plan: a sort-merge (or shuffle-hash) join whose subtree holds NO
    // Exchange — the bucketed scans already satisfy the partitioning
    // requirement. explain the JOIN frame itself (no agg tail) so any
    // exchange in the text would belong to the join
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a non-broadcast equi-join over bucketed scans:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan did not report the bucketed layout:\n$plan")
  }

  test("swapWrite: first write, read-then-rewrite over the live dir, " +
       "partition layout preserved, stranded swaps recovered") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("swapw").toString
    val dir = s"$base/idx"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rows = spark.read.parquet(dir)
      .select(col("id"), col("v"), col("cell").cast("long").as("cell"))
      .as[(Long, String, Long)].collect().toSet
    val df1 = (0L until 20L).map(i => (i, s"v$i", i % 4)).toDF("id", "v", "cell")
    // first write: no dir yet — swapWrite must create it
    Sinks.swapWrite(df1, dir, Seq("cell"))
    assert(rows == df1.as[(Long, String, Long)].collect().toSet)
    assert(fs.exists(new Path(s"$dir/cell=0")), "partition layout lost")
    // the maintenance loop: a frame READING from dir writes back over it
    // (the in-place overwrite this exists to replace would delete the
    // input under the running job)
    val maintained = spark.read.parquet(dir)
      .filter(col("id") =!= 3L)
      .select(col("id"), concat(col("v"), lit("'")) .as("v"), col("cell"))
    Sinks.swapWrite(maintained, dir, Seq("cell"))
    assert(rows.map(_._1) == (0L until 20L).toSet - 3L)
    assert(rows.forall(_._2.endsWith("'")), "rewrite lost the projection")
    // stranded swap (crash between the two renames): dir missing, .next
    // complete — the next call finishes the swap FIRST, so the recovered
    // content is what .next held before the new write lands
    fs.rename(new Path(dir), new Path(s"$dir.next"))
    val df3 = Seq((100L, "fresh", 0L)).toDF("id", "v", "cell")
    Sinks.swapWrite(df3, dir, Seq("cell"))
    assert(rows == Set((100L, "fresh", 0L)))
    // stale .next beside a live dir (crash BEFORE the first rename) is
    // discarded, not swapped in
    val df4 = Seq((200L, "live", 1L)).toDF("id", "v", "cell")
    df4.write.partitionBy("cell").parquet(s"$dir.next")
    Sinks.swapWrite(df3, dir, Seq("cell"))
    assert(rows == Set((100L, "fresh", 0L)),
      "a stale .next from a pre-swap crash leaked into the index")
    // no _SWAP_READY marker survives in the live dir after a clean swap
    assert(!fs.exists(new Path(s"$dir/_SWAP_READY")),
      "marker leaked into the live directory")
  }

  test("bloom-filtered layout: a point probe on a scattered column skips " +
       "row groups that min/max stats cannot") {
    val n = 200000L
    val df = spark.range(n).select(
      (col("id") * 2654435761L % n).as("k"),
      concat(lit("pad"), col("id").cast("string")).as("pay"))
    val base = java.nio.file.Files.createTempDirectory("graft_bloomspec").toString
    Sinks.writeClustered(df.repartition(8), s"$base/plain", Nil, Nil)
    Sinks.writeClustered(df.repartition(8), s"$base/bloom", Nil, Nil,
      bloomFilterCols = Seq("k"), bloomNdv = n / 8)
    def recordsRead(path: String): Long = {
      val m = graft.monitor.PipelineMetrics.attach(spark)
      assert(spark.read.parquet(path).filter(col("k") === 12345L).count() == 1L)
      Thread.sleep(500) // listener events are async
      val r = m.snapshot("records_read")
      m.detach()
      r
    }
    val plain = recordsRead(s"$base/plain")
    val bloom = recordsRead(s"$base/bloom")
    // the scattered key defeats min/max pruning (plain reads everything);
    // the bloom drops all but the holding row group(s)
    assert(plain >= n, s"expected a full scan without blooms, read $plain")
    assert(bloom <= plain / 4, s"bloom read $bloom of $plain — no row-group skip")
  }

  test("recoverSwap: completed .next promoted at restart, mid-write " +
       "carcass left alone, between-renames window finished") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("swapr").toString
    val dir = s"$base/idx"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rows = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    Seq((1L, "gen0")).toDF("id", "v").write.parquet(dir)
    // crash AFTER the .next write job, BEFORE the first rename: the
    // marker marks it complete — recoverSwap (the restart step, before
    // any delta frame is built) promotes it instead of redoing the delta
    Seq((2L, "gen1")).toDF("id", "v").write.parquet(s"$dir.next")
    fs.create(new Path(s"$dir.next/_SWAP_READY"), true).close()
    assert(Sinks.recoverSwap(spark, dir), "completed .next not promoted")
    assert(rows == Set((2L, "gen1")))
    assert(!fs.exists(new Path(s"$dir.next")) &&
      !fs.exists(new Path(s"$dir/_SWAP_READY")))
    // mid-write carcass (no marker, live dir present): NOT promoted —
    // swapWrite's own cleanup owns it
    Seq((9L, "junk")).toDF("id", "v").write.parquet(s"$dir.next")
    assert(!Sinks.recoverSwap(spark, dir), "promoted a mid-write carcass")
    assert(rows == Set((2L, "gen1")) && fs.exists(new Path(s"$dir.next")))
    fs.delete(new Path(s"$dir.next"), true)
    // between-renames crash window: live dir gone, .next complete AND
    // marked — in a real swapWrite the _SWAP_READY marker is created
    // right after the write job and deleted only after the final rename,
    // so it is always present in this window
    fs.rename(new Path(dir), new Path(s"$dir.next"))
    fs.create(new Path(s"$dir.next/_SWAP_READY"), true).close()
    assert(Sinks.recoverSwap(spark, dir), "window swap not finished")
    assert(rows == Set((2L, "gen1")))
    // FIRST-GENERATION mid-write carcass: unmarked .next beside a MISSING
    // live dir (the write job of a first build runs with no live dir at
    // all, so a crash mid-write leaves exactly this). It must be deleted,
    // never promoted — promoting a partial write would hand every later
    // delta a half-written index
    val dirG0 = s"$base/idx_gen0"
    Seq((7L, "partial")).toDF("id", "v").write.parquet(s"$dirG0.next")
    assert(!Sinks.recoverSwap(spark, dirG0), "promoted an unmarked carcass")
    assert(!fs.exists(new Path(s"$dirG0.next")) && !fs.exists(new Path(dirG0)),
      "first-generation carcass not cleaned up")
    // restart cadence end-to-end: recover first, THEN build the delta
    // frame, then swapWrite — the maintained generation is gen1's
    Seq((3L, "gen2")).toDF("id", "v").write.parquet(s"$dir.next")
    fs.create(new Path(s"$dir.next/_SWAP_READY"), true).close()
    Sinks.recoverSwap(spark, dir)
    val delta = spark.read.parquet(dir)
      .select(col("id") + 10L as "id", col("v"))
    Sinks.swapWrite(delta, dir)
    assert(rows == Set((13L, "gen2")),
      "delta did not build on the recovered generation")
  }

  test("readIndex(recursive=false): hive partition column inferred, and a " +
       "probe issued inside swapWrite's rename window retries through it") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("swapri").toString
    val dir = s"$base/codes"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = (0L until 12L).map(i => (i, i % 3)).toDF("id", "cell")
    Sinks.swapWrite(df, dir, Seq("cell"))
    // the batch stored-index probes (Pq/Sq/MaxSim/Search) read through
    // this shape: partition inference ON (recursiveFileLookup would drop
    // the cell column their pruning filters need)
    val flat = graft.streaming.Streams.readIndex(spark, dir, recursive = false)
    assert(flat.columns.contains("cell"), "partition column lost")
    assert(flat.filter(col("cell") === 1).count() == 4)
    // concurrent swapWrite's between-renames window: the dir is missing
    // for the first listing; the retry (here: the swap completing) finds it
    fs.rename(new Path(dir), new Path(s"$dir.next"))
    val probed = graft.streaming.Streams.readIndex(spark, dir,
      onRetry = () => { fs.rename(new Path(s"$dir.next"), new Path(dir)); () },
      recursive = false)
    assert(probed.count() == 12 && probed.columns.contains("cell"))
  }
}
