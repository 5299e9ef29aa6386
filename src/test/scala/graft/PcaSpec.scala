package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Pca, Pq}
import graft.sources.Tables

/** G48 PCA/OPQ rotation — invariants beyond the q_gram oracle: exact
  * scatter sums, orthonormality, diagonalization, variance ordering,
  * norm preservation, and the OPQ composition's determinism.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("gram matches a by-hand scatter on a tiny frame, exactly") {
    val df = Seq(
      (1L, Array(0.5f, -1.25f)),
      (2L, Array(2.0f, 0.75f)),
      (3L, Array(-0.5f, 1.0f))).toDF("id", "v")
    val got = Pca.gram(df, "v", dim = 2, scale = 4.0)
      .as[(Long, Long, Long)].collect().toSet
    // q = floor(v*4): (2,-5), (8,3), (-2,4)
    val q = Seq(Seq(2L, -5L), Seq(8L, 3L), Seq(-2L, 4L))
    val want = (for (i <- 0 to 1; j <- 0 to 1)
      yield (i.toLong, j.toLong, q.map(r => r(i) * r(j)).sum)).toSet
    assert(got == want)
    // null vectors and null elements skip the whole row
    val withNulls = df.unionByName(Seq((4L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v"))
    assert(Pca.gram(withNulls, "v", 2, 4.0).as[(Long, Long, Long)]
      .collect().toSet == want)
    // a skipped row must not pin the buffer dimension either: a
    // wrong-dimension vector whose null element rejects it arrives FIRST
    // and the real rows must still aggregate (not throw a mixed-dim error)
    val poison = spark.range(1).selectExpr("id",
      "array(CAST(NULL AS FLOAT)) AS v")
    assert(Pca.gram(poison.unionByName(df).coalesce(1), "v", 2, 4.0)
      .as[(Long, Long, Long)].collect().toSet == want)
  }

  test("gram overflow fails loudly instead of silently wrapping") {
    // q = floor(v·scale) saturates near 2^63; q·q then overflows long —
    // the aggregate must throw (Math.multiplyExact), not hand Pca.rotation
    // a wrapped, corrupted scatter
    val big = Seq((1L, Array(3.0e15f, 0.0f)), (2L, Array(3.0e15f, 0.0f)))
      .toDF("id", "v")
    val ex = intercept[Exception] { Pca.gram(big, "v", 2, scale = 1048576.0).collect() }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"expected a loud ArithmeticException, got: $ex")
  }

  test("rotation is orthonormal, diagonalizes the scatter, and orders " +
       "components by variance") {
    val rot = Pca.rotation(emb, "embedding", dim = 64)
    val d = rot.length
    assert(d == 64 && rot.forall(_.length == 64))
    // R·Rᵀ = I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => rot(i)(k) * rot(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRᵀ[$i][$j] = $dot")
    }
    // Rᵀ S R is diagonal (relative to its largest diagonal entry) with a
    // non-increasing diagonal — rows are principal axes, variance-desc
    val scale = 1048576.0
    val sRows = Pca.gram(emb, "embedding", 64).collect()
    val s = Array.ofDim[Double](d, d)
    sRows.foreach(r => s(r.getLong(0).toInt)(r.getLong(1).toInt) =
      r.getLong(2).toDouble / (scale * scale))
    val rs = Array.tabulate(d, d)((i, k) =>
      (0 until d).map(x => rot(i)(x) * s(x)(k)).sum)
    val diagd = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => rs(i)(k) * rot(j)(k)).sum)
    val maxDiag = (0 until d).map(i => math.abs(diagd(i)(i))).max
    for (i <- 0 until d; j <- 0 until d if i != j)
      assert(math.abs(diagd(i)(j)) < 1e-6 * maxDiag,
        s"off-diagonal [$i][$j] = ${diagd(i)(j)} vs maxDiag $maxDiag")
    for (i <- 1 until d)
      assert(diagd(i)(i) <= diagd(i - 1)(i - 1) + 1e-9 * maxDiag)
  }

  test("rotate preserves norms, is deterministic, and nulls on dimension " +
       "mismatch") {
    val rot = Pca.rotation(emb, "embedding", dim = 64)
    val both = Pca.rotateAll(emb, "embedding", rot)
      .withColumnRenamed("embedding", "rv")
      .join(emb.select(col("vec_id"), col("embedding").as("ov")), "vec_id")
      .select(col("vec_id"),
        graft.functions.Vectors.fnorm(col("rv")).as("rn"),
        graft.functions.Vectors.fnorm(col("ov")).as("on"))
      .as[(Long, Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, rn, on) =>
      assert(math.abs(rn - on) < 1e-3 * math.max(on, 1.0), s"norm drift at $id")
    }
    val a = Pca.rotateAll(emb, "embedding", rot).orderBy("vec_id")
      .select("embedding").as[Seq[Float]].collect()
    val b = Pca.rotateAll(emb, "embedding", rot).orderBy("vec_id")
      .select("embedding").as[Seq[Float]].collect()
    assert(a.toSeq == b.toSeq)
    // a wrong-dimension vector nulls out rather than zero-padding
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Pca.rotateAll(bad, "embedding", rot)
      .filter(col("embedding").isNull).count() == 1)
  }

  test("OPQ composition: PQ on rotated vectors is deterministic and " +
       "rotation-invariant in its exact re-rank") {
    val rot = Pca.rotation(emb, "embedding", dim = 64)
    val rEmb = Pca.rotateAll(emb, "embedding", rot)
    val qs = rEmb.filter(col("vec_id") < 4)
    val cbs = Pq.trainCodebooks(rEmb, "vec_id", "embedding",
      dim = 64, m = 2, k = 4, rounds = 2)
    val once = Pq.adcTopK(qs, rEmb, "vec_id", "embedding", cbs, topK = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val again = Pq.adcTopK(qs, rEmb, "vec_id", "embedding", cbs, topK = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(once == again && once.nonEmpty)
    // rotation-invariance of EXACT L2: the exhaustive exact top-1 in the
    // rotated space must agree with the raw space's (orthonormal rotation
    // preserves distances up to float rounding — allow one rounding flip)
    def exactTop1(queries: org.apache.spark.sql.DataFrame,
                  corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val pairs = queries.select(col("vec_id").as("query_id"))
        .crossJoin(corpus.select(col("vec_id").as("neighbor_id")))
        .filter(col("query_id") =!= col("neighbor_id"))
      Pq.rerank(pairs, queries, corpus, "vec_id", "embedding", topK = 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    }
    val top1R = exactTop1(qs, rEmb)
    val top10 = exactTop1(emb.filter(col("vec_id") < 4), emb)
    assert((top1R intersect top10).size >= 3,
      s"rotated vs raw exact top-1 diverged: $top1R vs $top10")
  }
}
