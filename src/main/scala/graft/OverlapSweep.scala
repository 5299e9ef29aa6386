package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.Text

/** Accuracy sweep for the G49 corpus-overlap sketch: the KMV Jaccard /
  * containment estimates at several `sketchK` against the EXACT values
  * (computable at test SF by a distinct-shingle join — the very join the
  * sketch exists to avoid at 100 TB). Turns the ~1/√k error claim into a
  * measured table (plans/ANN.md) — the lshRecallReport posture applied to
  * the sketch: tune k from data, don't trust the bound.
  *
  * Usage: runMain graft.OverlapSweep [sfDir] [ngram]
  */
object OverlapSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ngram = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)

    def shingleSet(df: org.apache.spark.sql.DataFrame) = df
      .select(Text.tokens(col("text")).as("__tk"))
      .filter(size(col("__tk")) >= ngram)
      .select(explode(array_distinct(Text.shinglesOf(col("__tk"), ngram))).as("s"))
      .distinct()

    val sa = shingleSet(a).cache(); val sb = shingleSet(b).cache()
    val nA = sa.count(); val nB = sb.count()
    val nBoth = sa.join(sb, "s").count()
    val nUnion = nA + nB - nBoth
    val jacc = nBoth.toDouble / nUnion
    val contA = nBoth.toDouble / nA
    println(f"exact: |A|=$nA |B|=$nB |A∩B|=$nBoth |A∪B|=$nUnion " +
      f"jaccard=${jacc}%.4f containment_a=${contA}%.4f")
    println("| sketchK | jaccard est | err | containment_a est | err | d_union est | err | 1/sqrt(k) |")
    println("|---|---|---|---|---|---|---|---|")
    for (k <- Seq(64, 256, 1024, 4096, 16384)) {
      val r = Dedup.corpusOverlap(a, b, "text", ngram, k).collect().head
      val je = r.getAs[Long]("jaccard_permille") / 1000.0
      val ce = r.getAs[Long]("containment_a_permille") / 1000.0
      val de = r.getAs[Long]("d_union_est").toDouble
      println(f"| $k%5d | $je%.3f | ${math.abs(je - jacc)}%.3f " +
        f"| $ce%.3f | ${math.abs(ce - contA)}%.3f " +
        f"| ${de}%.0f | ${math.abs(de - nUnion) / nUnion}%.3f | ${1.0 / math.sqrt(k)}%.3f |")
    }
    sa.unpersist(); sb.unpersist()
    spark.stop()
  }
}
