package graft

/** The every-SparkEntry-query exchange-budget regression gate (r13):
  * every SparkEntry query's shuffle-exchange count is pinned against the
  * committed `exchange_budgets.tsv` (written by [[PlanBudgets]] under the
  * SAME session shape this suite runs — local[4], shuffle 4, sf0.001).
  * A deliberate plan change regenerates the file and commits the diff; an
  * ACCIDENTAL one — a de-fused projection re-planning as an exchange, a
  * broadcast silently degrading to a shuffle join, a new groupBy sneaking
  * into a probe — fails here, in `sbt test`, instead of surfacing as a
  * bench regression a round later. Budgets are exact, not ≤: LOSING an
  * exchange unexpectedly also deserves a look (it usually means a
  * broadcast threshold or plan reuse changed under the query).
  *
  * Plan construction only — the count comes from `explainString` on the
  * unexecuted frame — but constructing a query CAN execute its eager
  * prefix (index builds, stream drains), so this suite is the slow lane
  * of the plan gates; PlanSpec keeps the annotated headline subset for
  * fast iteration.
  */
class PlanBudgetSpec extends SparkSpec {

  test("all SparkEntry queries hold their committed exchange budgets") {
    graft.Caching.drain() // earlier suites must not leak cached subplans
    val res = getClass.getResourceAsStream("/exchange_budgets.tsv")
    assert(res != null, "exchange_budgets.tsv missing from test resources " +
      "— run `sbt \"runMain graft.PlanBudgets\"` and commit it")
    val budgets: Map[String, String] =
      scala.io.Source.fromInputStream(res, "UTF-8").getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, c) = l.split("\t"); n -> c
        }.toMap
    val queries = SparkEntry.queries
    val missing = queries.keySet.diff(budgets.keySet).toSeq.sorted
    assert(missing.isEmpty,
      s"queries without a committed budget (regenerate the tsv): $missing")
    val stale = budgets.keySet.diff(queries.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"budget rows for queries that no longer exist: $stale")
    val errs = queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r = try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val got = PlanBudgets.countExchanges(plan).toString
        if (got == budgets(name)) None
        else Some(s"$name: budget ${budgets(name)}, plan has $got")
      } catch {
        case e: Throwable => Some(s"$name: plan construction failed: " +
          e.getMessage.take(120))
      }
      graft.Caching.drain()
      r
    }
    assert(errs.isEmpty, errs.mkString("\n"))
  }
}
