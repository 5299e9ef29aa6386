package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** The stateful streaming twins under the ROCKSDB state store (r13): the
  * default HDFS-backed provider keeps every key's state on the executor
  * heap — at 100× the per-key state (G44's print universe, G42's key
  * domain) that outgrows memory, and RocksDB (local-disk backed, bounded
  * block cache) is the documented large-state default
  * ([[GraftSession.RocksDbProvider]]). These specs pin that the provider
  * knob actually engages (RocksDB metrics appear in query progress) and
  * that results are PROVIDER-INDEPENDENT — the same convergence laws the
  * default-provider suite pins. The full Verify suite also runs green
  * under `SPARK_GRAFT_STATESTORE=rocksdb` (plans/BENCHNOTES.md r13).
  */
class StreamsRocksDbSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Run `body` with the session's state store switched to RocksDB,
    * restoring the previous provider after — the shared test session must
    * not leak the override into other suites.
    */
  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    GraftSession.useRocksDbStateStore(spark)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("dedupStream and keepBestStream hold their convergence laws under " +
       "RocksDB, and the provider really engages (rocksdb metrics)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Timestamp, Long)]
      val q = Streams.dedupStream(mem.toDF.toDF("ts", "k"), "ts",
          "10 minutes", Seq("k"))
        .writeStream.format("memory").queryName("ddup_rocks")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData((ts("2024-01-01 00:00:00"), 1L),
          (ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:00:01"), 2L))
        q.processAllAvailable()
        assert(spark.table("ddup_rocks").count() == 2)
        // the knob ENGAGED: RocksDB-specific custom metrics in progress
        val metrics = q.lastProgress.stateOperators.head
          .customMetrics.keySet()
        assert(metrics.toArray.exists(_.toString.toLowerCase.contains("rocksdb")),
          s"no rocksdb metrics in: $metrics")
      } finally q.stop()

      val mem2 = MemoryStream[(String, Long, Double)]
      val q2 = Streams.keepBestStream(mem2.toDS())
        .toDF("key", "keep_id", "keep_score", "n_copies")
        .writeStream.format("memory").queryName("kbest_rocks")
        .outputMode(OutputMode.Update()).start()
      try {
        mem2.addData(("k1", 1L, 10.0), ("k1", 2L, 30.0), ("k2", 4L, 5.0))
        q2.processAllAvailable()
        mem2.addData(("k1", 3L, 30.0))
        q2.processAllAvailable()
        val finals = spark.table("kbest_rocks")
          .as[(String, Long, Double, Long)].collect()
          .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._4) }
        assert(finals("k1") == (("k1", 3L, 30.0, 3L)))
        assert(finals("k2") == (("k2", 4L, 5.0, 1L)))
      } finally q2.stop()
    }
  }

  test("sessionizeStateStream (flatMapGroupsWithState state) emits the " +
       "same sessions under RocksDB") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Timestamp)]
      val sess = Streams.sessionizeStateStream(
        mem.toDF.toDF("user_id", "ts"), "user_id", "ts",
        watermark = "0 seconds", gapUs = 100000000L) // 100 s gap
      val q = sess.writeStream.format("memory").queryName("sess_rocks")
        .outputMode(OutputMode.Append()).start()
      try {
        def t(sec: Long) = new Timestamp(sec * 1000L)
        mem.addData((1L, t(10)), (1L, t(60)))
        q.processAllAvailable()
        mem.addData((1L, t(1000))) // watermark passes 60s + gap → emit
        q.processAllAvailable()
        val got = spark.table("sess_rocks")
          .as[(Long, Long, Long, Long)].collect().toList
        assert(got == List((1L, 10000000L, 60000000L, 2L)))
      } finally q.stop()
    }
  }

  test("stateStoreGuard is a NO-OP under RocksDB (r15): its memory metric " +
       "is bounded block cache, not heap pressure") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val fired = new java.util.concurrent.CopyOnWriteArrayList[String]
      // the 1-byte threshold that ALWAYS fires on the default provider
      // (StreamsSpec pins that) must never fire here — the guard reads
      // the session's provider conf per micro-batch (r16: no longer
      // frozen at attach, so a mid-life provider switch re-arms/silences)
      val g = Streams.stateStoreGuard(spark, thresholdBytes = Some(1L),
        onWarn = (n, _, _, _) => fired.add(n))
      val mem = MemoryStream[(String, Long, Double)]
      val q = Streams.keepBestStream(mem.toDS())
        .toDF("key", "keep_id", "keep_score", "n_copies")
        .writeStream.format("memory").queryName("guard_rocks")
        .outputMode(OutputMode.Update()).start()
      try {
        mem.addData(("k1", 1L, 10.0), ("k2", 2L, 20.0))
        q.processAllAvailable()
        // give the async listener bus time to deliver the progress event
        val deadline = System.nanoTime() + 3e9.toLong
        while (fired.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
        assert(fired.isEmpty,
          s"guard fired under RocksDB: ${fired}")
      } finally {
        q.stop()
        spark.streams.removeListener(g)
      }
    }
  }

  test("a guard attached BEFORE a mid-life switch to RocksDB goes quiet " +
       "(r16 — provider read per micro-batch, not frozen at attach)") {
    implicit val sqlCtx = spark.sqlContext
    val fired = new java.util.concurrent.CopyOnWriteArrayList[String]
    // attach while the session is still on the DEFAULT provider — the
    // ADVICE r15 scenario: an attach-time snapshot would keep warning on
    // RocksDB's block-cache memoryUsedBytes after the switch
    val g = Streams.stateStoreGuard(spark, thresholdBytes = Some(1L),
      onWarn = (n, _, _, _) => fired.add(n))
    try {
      withRocksDb {
        val mem = MemoryStream[(String, Long, Double)]
        val q = Streams.keepBestStream(mem.toDS())
          .toDF("key", "keep_id", "keep_score", "n_copies")
          .writeStream.format("memory").queryName("guard_switch")
          .outputMode(OutputMode.Update()).start()
        try {
          mem.addData(("k1", 1L, 10.0), ("k2", 2L, 20.0))
          q.processAllAvailable()
          val deadline = System.nanoTime() + 3e9.toLong
          while (fired.isEmpty && System.nanoTime() < deadline)
            Thread.sleep(50)
          assert(fired.isEmpty,
            s"guard attached pre-switch still fired under RocksDB: $fired")
        } finally q.stop()
      }
    } finally spark.streams.removeListener(g)
  }
}
