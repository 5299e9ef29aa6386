package graft

/** Scratch timing harness for the pointer-jumping coreference decision:
  * times q_kb_canonical / q_coreference / q_dup_clusters at a given SF dir,
  * min of 2 runs each, plus a deep-chain dupClusters microbench.
  */
object CorefBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[corefbench] $name min=${ts.min}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    for (q <- Seq("q_kb_canonical", "q_coreference", "q_dup_clusters"))
      time(q) { SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save() }
    // deep chain: path graph — the worst case for plain min-label (rounds
    // = chain length; keep it small enough that the baseline terminates)
    val n = args.lift(1).map(_.toInt).getOrElse(128)
    val chain = spark.range(0, n).selectExpr(
      "lpad(cast(id as string), 8, '0') as id_a",
      "lpad(cast(id + 1 as string), 8, '0') as id_b")
    time(s"dupClusters_chain$n") {
      graft.dedup.Dedup.dupClusters(chain, maxRounds = 100000)
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
        .collect()
    }
    spark.stop()
  }
}
