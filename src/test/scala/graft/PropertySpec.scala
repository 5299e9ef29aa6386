package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.dedup.Dedup
import graft.functions.{Text, Vectors}
import graft.operators.Ops

/** Property-based operator laws (scalacheck driven through plain funsuite —
  * each law samples many random inputs through the REAL Spark plans).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  private val tokenGen = Gen.listOfN(12, Gen.oneOf("a", "b", "cc", "dd", "e1", "f"))

  test("law: fingerprint is invariant under token permutation") {
    check(Prop.forAll(tokenGen) { toks =>
      val shuffled = scala.util.Random.shuffle(toks)
      val fps = Seq(toks.mkString(" "), shuffled.mkString(" ")).toDF("text")
        .select(Text.fingerprint(col("text"))).as[String].collect()
      fps(0) == fps(1)
    })
  }

  test("law: batchRows partitions rows into ceil(n/size) batches of bounded size") {
    check(Prop.forAll(Gen.chooseNum(1L, 200L), Gen.chooseNum(1, 50)) { (rows, size) =>
      val sizes = Ops.batchRows(spark.range(rows).toDF("id"), Seq("id"), size)
        .groupBy("batch_id").count().select("count").as[Long].collect()
      sizes.sum == rows && sizes.forall(_ <= size) &&
        sizes.length == ((rows + size - 1) / size)
    })
  }

  test("law: modSample partitions the input into disjoint exhaustive classes") {
    check(Prop.forAll(Gen.chooseNum(1, 7)) { m =>
      val df = spark.range(100).toDF("id")
      val counts = (0 until m).map(r => Ops.modSample(df, "id", m, r).count())
      counts.sum == 100
    })
  }

  test("law: exact dedup conserves rows and keeps the minimum id") {
    val docsGen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 1000L), Gen.oneOf("x", "y", "z")))
    check(Prop.forAll(docsGen) { docs =>
      val distinctIds = docs.toMap.toSeq // unique ids
      val df = distinctIds.toDF("doc_id", "text")
      val out = Dedup.exact(df, "doc_id", "text")
        .select("keep_id", "n_copies").as[(Long, Long)].collect()
      val byText = distinctIds.groupBy(_._2)
      out.map(_._2).sum == distinctIds.size &&
        out.map(_._1).toSet == byText.values.map(_.map(_._1).min).toSet
    })
  }

  test("law: fdot equals a plain scala double fold") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val got = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(Vectors.fdot(col("a"), col("b"))).as[Double].head()
      val want = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      got == want
    })
  }

  test("fdot matches the HOF dot on null elements and length mismatch (both null)") {
    val rows = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)))
    val df = rows.toDF("a", "b")
      .select(Vectors.fdot(col("a"), col("b")).as("f"),
        Vectors.dot(col("a"), col("b")).as("h"))
    df.collect().foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("law: jaccard output is symmetric-free (id_a < id_b) and within [0,1]") {
    val textGen = Gen.listOfN(6, tokenGen.map(_.mkString(" ")))
    check(Prop.forAll(textGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.ngramJaccard(df, "doc_id", "text", k = 2, tau = 0.0)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      out.forall { case (a, b, j) => a < b && j >= 0.0 && j <= 1.0 }
    })
  }
}
