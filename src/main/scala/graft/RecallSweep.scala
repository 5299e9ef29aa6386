package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables

/** LSH operating-point sweep (plans/ANN.md): run [[Dedup.lshRecallReport]]
  * at the sensible banding configurations and print one line per point —
  * measured recall (and candidate volume, the cost side) against exact
  * shingle-Jaccard ground truth at tau, on the documented deterministic
  * sample. This is the tuning table a 100 TB run consults BEFORE choosing
  * bands × rowsPerBand: the S-curve formula assumes uniform minhash
  * collision probabilities; real corpora have skewed shingle
  * distributions, and the sweep measures the gap.
  *
  * Usage: runMain graft.RecallSweep [sfDir] [tau] [mod]
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val mod = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // the documented sample contract: exact Jaccard is quadratic-family
    // ground truth and belongs on samples (md5-free: doc_id mod is already
    // deterministic and language/source-unbiased in this corpus)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % mod === 0)
    // (numHashes, bands, rowsPerBand): bands·rows = hashes, the full
    // signature in every case — points differ in WHERE the S-curve bends
    // (threshold ≈ (1/bands)^(1/rows)) and in candidate volume (∝ bands)
    val points = Seq((16, 2, 8), (16, 4, 4), (16, 8, 2), (32, 8, 4))
    println(f"[recallsweep] sf=$sfDir tau=$tau sample=1/$mod " +
      f"n_docs=${docs.count()}")
    points.foreach { case (h, b, r) =>
      val t0 = System.nanoTime()
      val row = Caching.withCached {
        Dedup.lshRecallReport(docs, "doc_id", "text",
          k = 3, tau = tau, numHashes = h, bands = b, rowsPerBand = r).head()
      }
      val thr = math.pow(1.0 / b, 1.0 / r)
      println(f"[recallsweep] numHashes=$h bands=$b rowsPerBand=$r " +
        f"scurve_thr=$thr%.3f n_true=${row.getLong(0)} " +
        f"n_candidates=${row.getLong(1)} n_hit=${row.getLong(2)} " +
        f"recall_permille=${row.getLong(3)} " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
