package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes the audited shuffle-exchange count of EVERY SparkEntry query to
  * `src/test/resources/exchange_budgets.tsv` — the committed data behind
  * PlanBudgetSpec's regression gate (r13). plans/PLANS.md records the
  * full plans for human audit; this file is the machine-checked budget:
  * a plan change that adds (or silently drops) an exchange on ANY
  * SparkEntry query fails `sbt test` instead of waiting for the next round's
  * bench read (the r12 CodegenFallback incident was caught by a human
  * reading PLANS.md — this closes that gap for exchanges).
  *
  * The session MIRRORS TestSession (local[4], shuffle partitions 4,
  * sf0.001, no extensions) so the spec's recount reproduces these numbers
  * exactly; the counter is PlanAudit's tree-only regex (Broadcast/Reused
  * exchanges are not shuffles). Regenerate after any INTENDED plan
  * change: `sbt "runMain graft.PlanBudgets"`, review the diff, commit.
  */
object PlanBudgets {
  /** The shared counter — one spelling for generator and spec. */
  def countExchanges(plan: String): Int =
    "(?<!Broadcast|Reused)Exchange \\(\\d+\\)".r.findAllIn(plan).size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1)
      else "src/test/resources/exchange_budgets.tsv"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .appName("graft-budgets")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        sb.append(s"$name\t${countExchanges(plan)}\n")
      } catch {
        case e: Throwable =>
          System.err.println(s"[budgets] $name FAILED: ${e.getMessage.take(200)}")
          sb.append(s"$name\tFAILED\n")
      }
      graft.Caching.drain()
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
