package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.Ops
import graft.sources.Tables

/** Scale-posture audits: these specs assert properties of the PHYSICAL PLAN
  * (pushdown, broadcast, shuffle count), not of results — the "would this
  * survive 100×?" checks from SURVEY §5.
  */
class PlanSpec extends SparkSpec {

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("filters and projections push down to the parquet scan") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 45.0).select("l_orderkey", "l_quantity")
    val p = planString(li)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("flagship join broadcasts dimension tables") {
    val p = planString(SparkEntry.entry(spark))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("intervalJoin with keys plans as a hash/sort join on the key, not a cartesian product") {
    val ev = Tables.events(spark, sfDir)
    val l = ev.select(col("event_id").as("l_id"), col("user_id"), col("ts_ns").as("l_t"))
    val r = ev.select(col("event_id").as("r_id"), col("user_id"), col("ts_ns").as("r_t"))
    val p = planString(Ops.intervalJoin(l, r, Seq("user_id"),
      col("l_t"), col("r_t"), lit(0L), lit(1000L)))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("projection-only transforms add no shuffle") {
    def countShuffles(plan: SparkPlan): Int = {
      val self = plan match {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => return countShuffles(a.executedPlan)
        case _ => 0
      }
      self + plan.children.map(countShuffles).sum
    }
    val df = Ops.insertData(
      Ops.substituteRegex(
        Ops.remap(Tables.load(spark, sfDir, "customer"),
          Seq("c_custkey" -> "id", "c_name" -> "name")),
        "name", "_", " "),
      Map("src" -> "t"))
    assert(countShuffles(df.queryExecution.executedPlan) == 0)
  }

  test("bucketed tables join without a shuffle on either side") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def countShuffles(plan: SparkPlan): Int = plan match {
      case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
      case _: ShuffleExchangeExec => 1 + plan.children.map(countShuffles).sum
      case _ => plan.children.map(countShuffles).sum
    }
    Tables.writeBucketed(Tables.load(spark, sfDir, "lineitem"),
      "li_b", Seq("l_orderkey"), 4)
    Tables.writeBucketed(Tables.load(spark, sfDir, "orders"),
      "o_b", Seq("o_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      joined.count() // materialize so AQE finalizes the plan
      assert(countShuffles(joined.queryExecution.executedPlan) == 0,
        joined.queryExecution.executedPlan.toString.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupAgg uses partial (map-side) aggregation") {
    val p = planString(Ops.groupAgg(Tables.load(spark, sfDir, "lineitem"),
      Seq("l_returnflag"), Seq(sum("l_quantity").as("s"))))
    // two HashAggregates around one Exchange = partial + final
    assert("HashAggregate".r.findAllIn(p.linesIterator.filter(_.contains("+- "))
      .mkString("\n")).size >= 2, p)
  }
}
