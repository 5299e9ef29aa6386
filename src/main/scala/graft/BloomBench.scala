package graft

import org.apache.spark.sql.functions._

import graft.monitor.PipelineMetrics
import graft.operators.Sinks

/** Parquet bloom-filter experiment (plans/LAYOUT.md r11): what a
  * row-group bloom buys a point lookup on a column the layout does NOT
  * sort or partition by — the dedup/stored-index id-probe shape, where
  * min/max stats span everything and every row group must otherwise be
  * read.
  *
  * Writes the same rows (scattered 64-bit key + padded payload) into the
  * same file count twice — plain vs bloom-on-key (ndv sized to the
  * per-row-group distinct count) — and measures a point probe's
  * records/bytes read (PipelineMetrics listener) and wall time, min of 3
  * probes on distinct keys.
  *
  * Usage: runMain graft.BloomBench [rows] [files]
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    // multiplicative scramble: k is a permutation-ish scatter of [0, n) so
    // no row group's [min, max] is selective
    val df = spark.range(n).select(
      (col("id") * 2654435761L % n).as("k"),
      concat(lit("x" * 50), col("id").cast("string")).as("pay"))
    val base = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    Sinks.writeClustered(df.repartition(files), s"$base/plain", Nil, Nil)
    Sinks.writeClustered(df.repartition(files), s"$base/bloom", Nil, Nil,
      bloomFilterCols = Seq("k"), bloomNdv = n / files)

    def size(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().map(_.length()).sum
    }
    // the scatter is a bijection on [0, n) iff gcd(multiplier, n) = 1 —
    // probe keys are then the images of three existing ids, so every
    // probe finds exactly one row at ANY n
    require(BigInt(2654435761L).gcd(BigInt(n)) == 1,
      s"rows=$n must be coprime with the scatter multiplier 2654435761")
    val probeKeys = Seq(n / 7, n / 3, n / 2).map(id => id * 2654435761L % n)
    def probe(path: String): (Double, Long, Long) = {
      val runs = probeKeys.map { key =>
        val m = PipelineMetrics.attach(spark)
        val t0 = System.nanoTime()
        val c = spark.read.parquet(path).filter(col("k") === key).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener events are async
        val snap = m.snapshot
        m.detach()
        require(c == 1L, s"probe $key found $c rows")
        (dt, snap("records_read"), snap("bytes_read"))
      }
      (runs.map(_._1).min, runs.map(_._2).min, runs.map(_._3).min)
    }
    // warmup both layouts (footer caching, codegen)
    spark.read.parquet(s"$base/plain").count()
    spark.read.parquet(s"$base/bloom").count()
    val (tp, rp, bp) = probe(s"$base/plain")
    val (tb, rb, bb) = probe(s"$base/bloom")
    println(f"[bloombench] rows=$n files=$files")
    println(f"[bloombench] plain: probe ${tp}%.3f s, records_read=$rp, " +
      f"bytes_read=${bp / 1048576}%d MiB, layout ${size(s"$base/plain") / 1048576}%d MiB")
    println(f"[bloombench] bloom: probe ${tb}%.3f s, records_read=$rb, " +
      f"bytes_read=${bb / 1048576}%d MiB, layout ${size(s"$base/bloom") / 1048576}%d MiB")
    spark.stop()
  }
}
