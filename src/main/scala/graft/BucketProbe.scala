package graft
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q_ann", "q_lsh_pairs", "q_simhash", "q_dedup_exact", "q_treewalk"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
