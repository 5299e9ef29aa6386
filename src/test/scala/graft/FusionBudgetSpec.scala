package graft

/** The every-SparkEntry-query FUSION-budget regression gate (r16): each
  * query's count of Project / Filter / HashAggregate nodes running
  * OUTSIDE whole-stage codegen is pinned against the committed
  * `fusion_budgets.tsv` (written by [[FusionBudgets]] under the SAME
  * session shape this suite runs — local[4], shuffle 4, sf0.001).
  *
  * The failure class this closes is SILENT: one CodegenFallback
  * expression de-fuses an entire projection chain and nothing errors —
  * the query just runs interpreted (+112% on the gate's bench row when
  * the r12 items check first shipped as a HOF, plans/FUSION.md). The
  * exchange gate cannot see it (no plan-shape change) and the bench
  * only sees it a round later as an unexplained mover. Budgets are
  * exact, not ≤: a count DROPPING unexpectedly also deserves a look
  * (and the regenerated row is a win worth committing).
  *
  * Fusion markers exist only on EXECUTED plans (AQE finalizes stages
  * during execution), so this suite runs every query to completion —
  * the slowest plan gate (~3 min at sf0.001); PlanBudgetSpec stays the
  * construction-only exchange lane. A deliberate plan change
  * regenerates the file (`sbt "runMain graft.FusionBudgets"`) and
  * commits the diff.
  */
class FusionBudgetSpec extends SparkSpec {

  test("all SparkEntry queries hold their committed fusion budgets") {
    graft.Caching.drain() // earlier suites must not leak cached subplans
    val res = getClass.getResourceAsStream("/fusion_budgets.tsv")
    assert(res != null, "fusion_budgets.tsv missing from test resources " +
      "— run `sbt \"runMain graft.FusionBudgets\"` and commit it")
    val budgets: Map[String, String] =
      scala.io.Source.fromInputStream(res, "UTF-8").getLines()
        .filter(_.nonEmpty).map { l =>
          val parts = l.split("\t", -1); parts(0) -> parts(1)
        }.toMap
    val queries = SparkEntry.queries
    val missing = queries.keySet.diff(budgets.keySet).toSeq.sorted
    assert(missing.isEmpty,
      s"queries without a committed fusion budget (regenerate): $missing")
    val stale = budgets.keySet.diff(queries.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"fusion-budget rows for queries that no longer exist: $stale")
    val errs = queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r = try {
        val (unfused, total, ops) =
          FusionBudgets.auditExecuted(fn(spark, sfDir))
        if (unfused.toString == budgets(name)) None
        else Some(s"$name: committed ${budgets(name)} unfused row nodes, " +
          s"plan has $unfused of $total" +
          (if (ops.nonEmpty) s" ($ops)" else "") +
          " — a NEW unfused Project/Filter/HashAggregate usually means a " +
          "CodegenFallback expression slipped into the chain " +
          "(plans/FUSION.md); if the change is intended, regenerate " +
          "fusion_budgets.tsv and commit the diff")
      } catch {
        case e: Throwable => Some(s"$name: execution failed: " +
          e.getMessage.take(120))
      }
      graft.Caching.drain()
      r
    }
    assert(errs.isEmpty, errs.mkString("\n"))
  }
}
