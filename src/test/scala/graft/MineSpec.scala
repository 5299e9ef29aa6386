package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Clustering, Mine}
import graft.sources.Tables

/** G45 margin mining + G46 k-center greedy — invariants beyond the oracle:
  * directional containment, the exhaustive-IVF identity, and the greedy
  * geometry (distinct centers, non-increasing radii, deterministic seed).
  */
class MineSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
  private lazy val src = emb.filter(col("vec_id") % 2 === 0)
  private lazy val tgt = emb.filter(col("vec_id") % 2 === 1)

  test("mutual margin pairs are a subset of forward-best pairs") {
    val fwd = Mine.marginMine(src, tgt, "vec_id", "embedding", k = 4, tau = 1.01)
    val mut = Mine.marginMine(src, tgt, "vec_id", "embedding", k = 4, tau = 1.01,
      mutual = true)
    val fwdSet = fwd.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutSet = mut.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutSet.nonEmpty && mutSet.subsetOf(fwdSet))
    // at most one mined pair per src, margin at or above tau in ppm
    assert(fwd.groupBy("src_id").count().filter(col("count") > 1).isEmpty)
    assert(fwd.filter(col("margin_ppm") < 1010000L).isEmpty)
  }

  test("exhaustive IVF routing reproduces brute-force margins exactly") {
    val brute = Mine.marginMine(src, tgt, "vec_id", "embedding", k = 3, tau = 1.0)
    val ivf = Mine.marginMineIvf(src, tgt, "vec_id", "embedding", k = 3, tau = 1.0,
      nlist = 8, nprobe = 8)
    assert(brute.exceptAll(ivf).isEmpty && ivf.exceptAll(brute).isEmpty)
  }

  test("margin ratio demotes hub-adjacent pairs a raw cosine threshold keeps") {
    // the mined pair's margin orders pairs differently from raw cosine for
    // at least one src — the point of the ratio; guard that the operator
    // isn't just argmax-cosine in disguise
    val fwd = Mine.marginMine(src, tgt, "vec_id", "embedding", k = 4, tau = 0.0)
    val topCos = graft.similarity.Ann
      .bruteForceTopK(src, tgt, "vec_id", "embedding", 1)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("cos_best"))
    val joined = fwd.join(topCos, "src_id")
    assert(joined.filter(col("tgt_id") =!= col("cos_best")).count() > 0)
  }

  test("bounded top-k aggregate ≡ the window formulation it replaced") {
    // the topKTail contract: identical rows AND order to
    // row_number() OVER (PARTITION BY query ORDER BY cosine DESC, id ASC)
    // — long ids and string ids (UTF8String binary order ≡ string sort)
    import org.apache.spark.sql.expressions.Window
    val qs = emb.filter(col("vec_id") < 12)
    val got = graft.similarity.Ann
      .bruteForceTopK(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val q = qs.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val want = c.crossJoin(q)
      .withColumn("cosine", graft.functions.Vectors.fcosine(col("qv"), col("cv"),
        graft.functions.Vectors.fnorm(col("qv")), graft.functions.Vectors.fnorm(col("cv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want && got.nonEmpty)
    // string ids exercise the UTF8String comparator + serde path
    val sQs = qs.withColumn("vec_id", concat(lit("id_"), col("vec_id")))
    val sEmb = emb.withColumn("vec_id", concat(lit("id_"), col("vec_id")))
    val sGot = graft.similarity.Ann
      .bruteForceTopK(sQs, sEmb, "vec_id", "embedding", 3)
    assert(sGot.count() == 12 * 3 &&
      sGot.schema("neighbor_id").dataType == org.apache.spark.sql.types.StringType)
  }

  test("bounded top-k: bounded shuffle AND no candidate sort — where the " +
       "window form sorts every scored pair (plans/SCALE.md r8.4)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffledRecords(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      // AQE folds every materialized stage into leaf QueryStageExec nodes
      // (Result/Shuffle/Broadcast) — unwrap via .plan or the walk sees no
      // shuffle at all
      def walk(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: ShuffleExchangeLike => s +: s.children.flatMap(walk)
        case q: QueryStageExec => walk(q.plan)
        case _ => p.children.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
        .map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
    }
    val qs = emb.filter(col("vec_id") < 256)
    val nQ = qs.count()
    val aggDf = graft.similarity.Ann.bruteForceTopK(qs, emb, "vec_id", "embedding", 4)
    val agg = shuffledRecords(aggDf)
    // ≤ k rows per (query, partition) reach the exchange — corpus-size-free
    assert(agg <= nQ * 4 * 32, s"bounded form shuffled $agg > |Q|·k·P")
    // and NO sort anywhere: Spark's WindowGroupLimit pushdown bounds the
    // window form's shuffle too, but its partial mode SORTS every scored
    // candidate map-side (SortExec over |Q|·|C| rows) and re-sorts after
    // the exchange — the aggregate's whole point is skipping both sorts
    val aggPlan = aggDf.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Sort "), s"unexpected sort in:\n${aggPlan.take(3000)}")
    val q = qs.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val winDf = c.crossJoin(q)
      .withColumn("cosine", graft.functions.Vectors.fcosine(col("qv"), col("cv"),
        graft.functions.Vectors.fnorm(col("qv")), graft.functions.Vectors.fnorm(col("cv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .select(col("query_id"), col("rank"))
    winDf.collect()
    val winPlan = winDf.queryExecution.executedPlan.toString
    assert(winPlan.contains("WindowGroupLimit") && winPlan.contains("Sort "),
      s"window form no longer sorts — revisit the aggregate's rationale:\n${winPlan.take(3000)}")
  }

  test("k-center greedy: seed, distinct centers, non-increasing radii") {
    val sel = Clustering.kCenterGreedy(emb, "vec_id", "embedding", k = 5)
      .orderBy("step").collect()
    assert(sel.length == 5)
    // seed = md5-min id, radius null only there
    val seedId = emb.select(col("vec_id"))
      .withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy("__h", "vec_id").limit(1).collect()(0).getLong(0)
    assert(sel(0).getLong(1) == seedId && sel(0).isNullAt(2))
    val ids = sel.map(_.getLong(1))
    assert(ids.distinct.length == 5)
    val radii = sel.drop(1).map(_.getDouble(2))
    assert(radii.forall(_ > 0))
    assert(radii.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
  }

  test("k-center k = 1 returns just the seed") {
    val one = Clustering.kCenterGreedy(emb, "vec_id", "embedding", k = 1).collect()
    assert(one.length == 1 && one(0).getLong(0) == 1L && one(0).isNullAt(2))
  }

  test("k-center stops early when every row coincides with a center — no " +
       "duplicate center ids at k > effective support") {
    import spark.implicits._
    // 6 rows but only 3 distinct vectors: once the 3 are picked, the
    // farthest remaining row is AT a center (radius 0) — selection must
    // stop instead of re-emitting picked rows with radius 0
    val dup = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)),
      (3L, Seq(4.0, 0.0)), (4L, Seq(4.0, 0.0)),
      (5L, Seq(0.0, 4.0)), (6L, Seq(0.0, 4.0)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val sel = Clustering.kCenterGreedy(dup, "vec_id", "embedding", k = 6)
      .orderBy("step").collect()
    assert(sel.length == 3, s"expected early stop at 3 centers, got ${sel.length}")
    assert(sel.map(_.getLong(1)).distinct.length == 3)
    assert(sel.drop(1).forall(_.getDouble(2) > 0.0))
  }

  test("min-dist-to-set native ≡ least() over per-center sq-dist literals") {
    // the MinDistToSet contract: bit-identical to the least(SqDistLit…)
    // form it replaced, per-row over real embeddings, including the
    // length-mismatch skip (a mismatched center was a least-skipped null)
    import org.apache.spark.sql.graftglue.{ColumnBridge, MinDistToSet, QuantizeVec, SqDistLit}
    val centers = emb.filter(col("vec_id").isin(3L, 7L, 11L))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v * 1048576.0)).toArray)
    val mismatched = Array(1.0, 2.0) // wrong dim — must be skipped, not win
    val q = emb.select(col("vec_id"), ColumnBridge.column(QuantizeVec(
      ColumnBridge.expression(col("embedding")), 1048576.0)).as("qv"))
    val native = ColumnBridge.column(MinDistToSet(
      ColumnBridge.expression(col("qv")), centers :+ mismatched))
    val literal = least((centers :+ mismatched).map(cv => ColumnBridge.column(
      SqDistLit(ColumnBridge.expression(col("qv")), cv))): _*)
    val diff = q.select(native.as("a"), literal.as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.isEmpty)
  }

  test("nearest-center native ≡ array_min over per-center struct literals; " +
       "dist-map ≡ the per-center sq-dist map") {
    // the NearestCenter/DistMap contract (r9.2): bit-identical to the
    // literal forms they replaced, per-row over real embeddings. The one
    // stated NearestCenter divergence — a length-mismatched center no
    // longer WINS with a null dist2 — is pinned separately below.
    import org.apache.spark.sql.graftglue.{ColumnBridge, DistMap, NearestCenter, QuantizeVec, SqDistLit}
    val cents = emb.filter(col("vec_id").isin(2L, 6L, 10L, 14L))
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v * 1048576.0)).toArray)
      .zipWithIndex.map { case (cv, i) => (i, cv) }
    val q = emb.select(col("vec_id"), ColumnBridge.column(QuantizeVec(
      ColumnBridge.expression(col("embedding")), 1048576.0)).as("qv"))
    val native = ColumnBridge.column(NearestCenter(
      ColumnBridge.expression(col("qv")),
      cents.map(_._1), cents.map(_._2)))
    val literal = array_min(array(cents.map { case (cid, cv) =>
      struct(ColumnBridge.column(SqDistLit(
        ColumnBridge.expression(col("qv")), cv)).as("dist2"),
        lit(cid).as("cid"))
    }.toIndexedSeq: _*))
    assert(q.select(native.as("a"), literal.as("b"))
      .filter(not(col("a") <=> col("b"))).isEmpty)

    val dnative = ColumnBridge.column(DistMap(
      ColumnBridge.expression(col("qv")), cents.map(_._1), cents.map(_._2)))
    val dliteral = map_from_arrays(typedLit(cents.map(_._1).toSeq),
      array(cents.map { case (_, cv) => ColumnBridge.column(
        SqDistLit(ColumnBridge.expression(col("qv")), cv))
      }.toIndexedSeq: _*))
    // maps compare through per-key lookups (map equality is not defined as
    // a column op): every cid's value must match bit-for-bit
    val lookups = cents.flatMap { case (cid, _) => Seq(
      element_at(col("a"), cid).as(s"a$cid"),
      element_at(col("b"), cid).as(s"b$cid")) }
    val cmp = q.select(dnative.as("a"), dliteral.as("b"))
      .select(lookups.toIndexedSeq: _*)
    val bad = cents.map { case (cid, _) =>
      not(col(s"a$cid") <=> col(s"b$cid")) }.reduce(_ || _)
    assert(cmp.filter(bad).isEmpty)

    // divergence pin: with a mismatched center in the set, the struct form
    // let it win (null dist2 sorts first); NearestCenter skips it and
    // returns the best REAL center — and dist_map keeps the mismatched cid
    // with a null value (element_at yields null, not key-not-found)
    val mism = Array((0, Array(1.0, 2.0)), (1, cents.head._2))
    val got = q.limit(1).select(
        ColumnBridge.column(NearestCenter(ColumnBridge.expression(col("qv")),
          mism.map(_._1), mism.map(_._2))).as("nc"),
        ColumnBridge.column(DistMap(ColumnBridge.expression(col("qv")),
          mism.map(_._1), mism.map(_._2))).as("dm"))
      .selectExpr("nc.cid", "element_at(dm, 0)", "element_at(dm, 1)")
      .collect().head
    assert(got.getInt(0) == 1, "mismatched center must not win assignment")
    assert(got.isNullAt(1) && !got.isNullAt(2))
  }
}
