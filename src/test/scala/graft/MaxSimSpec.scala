package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.similarity.MaxSim
import graft.sources.Tables

/** G59 late-interaction MaxSim — invariants beyond the oracle: the fused
  * native equals a relational (explode + two-aggregation) replay, the
  * single-token degenerate case reduces to quantized-dot brute force, the
  * null/edge poison device, and the plan shape (three bounded exchanges,
  * query side broadcast, scoring fused into whole-stage codegen).
  */
class MaxSimSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
  private lazy val toks = emb.select(expr("vec_id DIV 5").as("id"),
    expr("vec_id % 5").as("pos"), col("embedding"))
  private lazy val quantToks = toks.select(col("id"), col("pos"),
    expr("transform(embedding, x -> cast(floor(cast(x as double) * 65536.0D) as double))")
      .as("qv"))

  test("maxSimTopK equals the relational explode/aggregate replay") {
    val got = MaxSim.maxSimTopK(toks, toks.filter(col("id") % 20 === 0),
      "id", "pos", "embedding", k = 3)

    val q = quantToks.filter(col("id") % 20 === 0)
    val pm = q.alias("q")
      .join(quantToks.alias("d"), col("q.id") =!= col("d.id"))
      .select(col("q.id").as("query_id"), col("q.pos").as("qpos"),
        col("d.id").as("neighbor_id"),
        Vectors.dot(col("q.qv"), col("d.qv")).as("dp"))
      .groupBy("query_id", "qpos", "neighbor_id").agg(max("dp").as("m"))
    val sc = pm.groupBy("query_id", "neighbor_id")
      .agg(sum("m").cast("long").as("maxsim"))
    val expected = sc
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("maxsim").desc, col("neighbor_id"))))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id", "maxsim")

    assert(got.count() > 0)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      "native MaxSim diverged from the relational replay")
  }

  test("single-token documents reduce MaxSim to quantized-dot ranking") {
    val single = emb.select(col("vec_id").as("id"), lit(0L).as("pos"),
      col("embedding"))
    val got = MaxSim.maxSimTopK(single, single.filter(col("id") < 8),
      "id", "pos", "embedding", k = 3)

    val qv = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 65536.0D) as double))")
        .as("qv"))
    val expected = qv.filter(col("vec_id") < 8).alias("q")
      .join(qv.alias("d"), col("q.vec_id") =!= col("d.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("d.vec_id").as("neighbor_id"),
        Vectors.dot(col("q.qv"), col("d.qv")).cast("long").as("maxsim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("maxsim").desc, col("neighbor_id"))))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id", "maxsim")

    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      "single-token MaxSim diverged from dot-product brute force")
  }

  test("dimension-mismatched documents poison to null and never rank") {
    val docs = Seq(
      (1L, 0L, Array(1.0f, 0.0f)), (1L, 1L, Array(0.0f, 1.0f)),
      (2L, 0L, Array(0.5f, 0.5f)),
      (3L, 0L, Array(1.0f, 0.0f, 0.0f)) // wrong dim — must not rank
    ).toDF("id", "pos", "embedding")
    val qs = Seq((9L, 0L, Array(1.0f, 1.0f))).toDF("id", "pos", "embedding")
    val out = MaxSim.maxSimTopK(docs, qs, "id", "pos", "embedding", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L), s"expected mismatched doc 3 dropped, got $out")
  }

  test("an empty query side yields an empty result") {
    val out = MaxSim.maxSimTopK(toks, toks.filter(col("id") < 0),
      "id", "pos", "embedding", k = 3)
    assert(out.isEmpty)
  }

  test("pooled two-stage at mShort >= corpus equals single-stage MaxSim") {
    // the rerank identity (the q_pq_ivf / q_sq_ivf device): a shortlist
    // covering every candidate makes the screen a no-op, so the exact
    // re-rank must reproduce maxSimTopK bit-for-bit
    val queries = toks.filter(col("id") % 20 === 0)
    val full = MaxSim.maxSimTopK(toks, queries, "id", "pos", "embedding", 3)
    val staged = MaxSim.maxSimTopKPooled(toks, queries, "id", "pos",
      "embedding", k = 3, mShort = 200)
    assert(staged.except(full).isEmpty && full.except(staged).isEmpty,
      "exhaustive-shortlist two-stage diverged from single-stage MaxSim")
  }

  test("pooled screen results are a subset of the shortlist's candidates") {
    val queries = toks.filter(col("id") % 20 === 0)
    val staged = MaxSim.maxSimTopKPooled(toks, queries, "id", "pos",
      "embedding", k = 3, mShort = 5)
    // k results per query, every one among that query's candidates by
    // construction; spot-check cardinality and self-exclusion
    val rows = staged.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)),
      "self-pair leaked through the pooled screen")
  }

  test("plan: three bounded exchanges, query side broadcast, fused scoring") {
    val df = MaxSim.maxSimTopK(toks, toks.filter(col("id") % 20 === 0),
      "id", "pos", "embedding", k = 3)
    // two gather aggregations (corpus + query) and the topKTail aggregate —
    // nothing else may shuffle; the query matrices move by broadcast only
    assert(countShufflesExec(df.queryExecution.executedPlan) == 3,
      planString(df))
    // materialize so AQE finalizes — the pre-execution adaptive plan
    // renders no whole-stage-codegen spans to assert on
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    // "*(N)" is toString's whole-stage-codegen span marker: the projection
    // carrying max_sim_score must sit INSIDE a fused span (a
    // CodegenFallback native would render an unstarred Project)
    assert(plan.linesIterator.exists(l =>
        l.contains("max_sim_score") && l.contains("*(")),
      s"MaxSim scoring projection not fused:\n${plan.take(2000)}")
  }
}
