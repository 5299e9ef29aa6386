package graft

/** Diagnostic: run one SparkEntry query to completion and print its FINAL
  * adaptive plan — the initial plan printed by [[PlanAudit]] shows identical
  * exchanges un-deduplicated, but AQE reuses shuffle stages with equal
  * canonical plans at runtime; this main shows what actually executed
  * (`ReusedQueryStage` / `ReusedExchange` nodes, post-coalesce partitioning).
  *
  * Usage: runMain graft.AdaptivePlan <queryName> [sfDir]
  */
object AdaptivePlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_jaccard")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // finalize all adaptive stages
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(plan).size
    val scans = "Scan parquet".r.findAllIn(plan).size
    println(s"[adaptive] $name reusedStages=$reused scansInTree=$scans")
    spark.stop()
  }
}
