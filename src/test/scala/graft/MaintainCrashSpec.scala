package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Sinks
import graft.similarity.Search

/** Crash-injection specs for the ONLINE index-maintenance loops (r13):
  * kill a maintain generation inside `writeLexDelta`'s swap protocol, in
  * each distinct crash window, and assert the RESTARTED stream (same
  * checkpoint — Structured Streaming replays the uncommitted micro-batch)
  * converges to the same index a from-scratch rebuild over the maintained
  * membership produces — the q_stream_lexmaintain identity.
  *
  * The two levers under test:
  *  - `lexIndexDelta` runs [[Sinks.recoverSwap]] on all four dirs before
  *    listing them (a crash between the two renames leaves a dir missing
  *    with a marked `.next` — promotion, not failure, is the restart);
  *  - the delta apply is IDEMPOTENT ([[graft.dedup.Dedup.replaceIdFrame]]:
  *    admitted ids replace stored copies), so replaying a batch whose
  *    swaps PARTIALLY landed across the four dirs still converges.
  *
  * The crash states are injected by invoking the swap protocol's steps
  * directly (the marker/carcass fixtures) between two AvailableNow drains
  * — deterministic, where killing a thread mid-rename is not.
  */
class MaintainCrashSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark engine core"), (2L, "common words here"),
    (3L, "common rare spark"), (4L, "gamma delta"))
  private val fileA = Seq((10L, "fresh spark doc"))
  private val fileB = Seq((20L, "another fresh common doc"))
  private val retiredIds = Seq(3L)
  // final maintained membership: (corpus − retired) ∪ A ∪ B
  private def membership = corpus.filterNot(c => retiredIds.contains(c._1)) ++
    fileA ++ fileB

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One AvailableNow drain of the maintain loop (the q_stream_lexmaintain
    * body: per micro-batch, lexIndexDelta + writeLexDelta over the LIVE
    * index, retire set re-applied idempotently).
    */
  private def drain(inDir: String, idxDir: String, ckpt: String): Unit = {
    val retired = retiredIds.toDF("id")
    val stream = graft.streaming.Streams.watchDirectory(spark, inDir,
      format = "parquet", schemaDdl = Some("doc_id BIGINT, text STRING"),
      maxFilesPerTrigger = 1)
    val q = graft.streaming.Streams.toForeachBatch(stream, ckpt,
      availableNow = true) { (batch, _) =>
      if (!batch.isEmpty) {
        val (posts, doclens, stats, terms) = Search.lexIndexDelta(
          batch, "doc_id", "text", idxDir, retired)
        Search.writeLexDelta(idxDir, posts, doclens, stats, terms)
        graft.Caching.drain()
      }
    }
    q.awaitTermination()
  }

  private def postsOf(dir: String): Set[(Long, Long, String, Long, Long)] =
    graft.streaming.Streams.readIndex(spark, s"$dir/postings", recursive = false)
      .select(col("id"), col("dl"), col("term"), col("tf"),
        col("bucket").cast("long"))
      .as[(Long, Long, String, Long, Long)].collect().toSet

  /** Bootstrap the index, drain generation A, precompute generation B's
    * four delta frames (NOT yet applied), and hand them + the dirs to
    * `crash` to install one crash window's residue. Then restart the
    * drain (same checkpoint — batch B is uncommitted, so it replays) and
    * assert postings converge to the from-scratch rebuild.
    */
  private def runWindow(tag: String)(
      crash: (String, (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)) => Unit): Unit = {
    val base = java.nio.file.Files.createTempDirectory(s"mcrash_$tag").toString
    val inDir = s"$base/in"; val idxDir = s"$base/index"; val ckpt = s"$base/ckpt"
    Search.writeLexIndex(corpus.toDF("doc_id", "text"), "doc_id", "text",
      idxDir, buckets = 8)
    fileA.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(inDir)
    drain(inDir, idxDir, ckpt) // generation A lands, batch 0 commits
    // batch B becomes visible but is NEVER committed: the crash windows
    // below are states the loop body leaves when killed mid-writeLexDelta
    fileB.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(inDir)
    val delta = Search.lexIndexDelta(fileB.toDF("doc_id", "text"),
      "doc_id", "text", idxDir, retiredIds.toDF("id"))
    crash(idxDir, delta)
    graft.Caching.drain()
    // restart: same checkpoint → the loop replays batch B against
    // whatever the crash left, runs recovery, and must converge
    drain(inDir, idxDir, ckpt)
    val rebuildDir = java.nio.file.Files.createTempDirectory(s"mcrash_rb_$tag").toString
    Search.writeLexIndex(membership.toDF("doc_id", "text"), "doc_id", "text",
      rebuildDir, buckets = 8)
    assert(postsOf(idxDir) == postsOf(rebuildDir),
      s"$tag: restarted maintain loop did not converge to the rebuild")
    // and the maintained index PROBES identically to the rebuilt one
    def probe(d: String) =
      Search.bm25FromIndex(spark, d, Seq("spark", "common"), k = 5)
        .as[(Long, Double)].collect().toSeq
    assert(probe(idxDir) == probe(rebuildDir) && probe(idxDir).nonEmpty)
    graft.Caching.drain()
  }

  test("pre-marker crash window: an UNMARKED partial .next carcass beside " +
       "the live dir is discarded and the replayed generation converges") {
    runWindow("premarker") { case (idxDir, (posts, _, _, _)) =>
      // the write job died mid-flight: a partial postings.next, no marker
      posts.limit(1).write.partitionBy("bucket")
        .parquet(s"$idxDir/postings.next")
    }
  }

  test("between-renames crash window: live dir missing, marked .next — " +
       "recovery PROMOTES the landed swap and the replay is idempotent") {
    runWindow("renames") { case (idxDir, (posts, _, stats, terms)) =>
      // faithful to writeLexDelta's order: terms and stats fully swapped,
      // postings killed BETWEEN its two renames (live gone, .next marked,
      // .old holding the previous generation), doclens untouched
      Sinks.swapWrite(terms.repartition(col("bucket")), s"$idxDir/terms",
        Seq("bucket"))
      Sinks.swapWrite(stats.coalesce(1), s"$idxDir/stats")
      posts.write.partitionBy("bucket").parquet(s"$idxDir/postings.next")
      val f = fs(idxDir)
      f.create(new Path(s"$idxDir/postings.next/_SWAP_READY"), true).close()
      assert(f.rename(new Path(s"$idxDir/postings"),
        new Path(s"$idxDir/postings.old")))
    }
  }

  test("post-swap crash window: all four dirs swapped but the marker and " +
       ".old residue not yet cleaned — the replay cleans up and converges") {
    runWindow("postswap") { case (idxDir, (posts, doclens, stats, terms)) =>
      Search.writeLexDelta(idxDir, posts, doclens, stats, terms)
      // killed after the final rename, before cleanup: the marker is
      // still inside the live doclens dir and a stale .old remains
      val f = fs(idxDir)
      f.create(new Path(s"$idxDir/doclens/_SWAP_READY"), true).close()
      f.mkdirs(new Path(s"$idxDir/doclens.old"))
      f.create(new Path(s"$idxDir/doclens.old/junk"), true).close()
    }
  }
}
