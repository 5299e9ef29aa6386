package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed k-means over an embedding column — the clustering step of a
  * training-data curation pipeline (topic balancing, cluster-based dedup,
  * and semdedup-style pruning all start from a k-means assignment).
  *
  * Design for determinism AND scale (reference has no clustering operator;
  * this is a first-class extension per the build brief):
  *
  *  - Components quantize to INTEGRAL doubles (`floor(x · scale)`): sums of
  *    integral doubles are exact while |Σ| < 2^53, so centroid means are
  *    partition-order-independent and bit-identical in any engine
  *    (|component| ≤ 1 at scale=2^20 supports corpora to ~8·10^9 rows).
  *  - Seeding = the `k` rows with the smallest `md5(id)` (the same
  *    deterministic device as [[Ann.ivfTopK]]) — no RNG, engine-portable.
  *  - Each Lloyd round: assignment is a pure PROJECTION against broadcast
  *    centroid literals (argmin via `array_min` over (dist², cid) structs —
  *    distances fold left-to-right, matching DuckDB's `list_dot_product`
  *    evaluation order exactly); the update is ONE shuffle of
  *    (cluster, position) partial sums — map-side combined, k·dim rows to
  *    the driver, never the corpus. The corpus itself never shuffles.
  *
  * `rounds` = number of assignment passes; centroids update between passes
  * (rounds=2 ⇒ seed → assign → update → assign). Clusters that lose all
  * members drop out of later rounds. The driver holds k·dim doubles —
  * model-config-sized, like [[Ann.ivfTopK]]'s centroid set.
  *
  * Output: (id, cluster, dist2) — dist2 in quantized units (divide by
  * scale² for the unquantized value).
  */
object Clustering {

  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, rounds: Int = 2, scale: Double = 1048576.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(rounds > 0, s"rounds must be positive, got $rounds")
    val q = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x.cast(DoubleType) * scale).cast(DoubleType))
        .as("qv"))

    // seed: k smallest md5(id) — k·dim values to the driver, corpus stays put
    var cents: Seq[(Int, Array[Double])] = q
      .withColumn("__h", md5(col("id").cast(StringType)))
      .orderBy(col("__h"), col("id"))
      .limit(k)
      .select(col("qv")).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }.toSeq

    def assigned: DataFrame = {
      val candidates = cents.map { case (cid, cv) =>
        val diff = zip_with(col("qv"), typedLit(cv), (a, b) => a - b)
        // left-to-right fold of squared diffs ≡ DuckDB list_dot_product(d, d)
        val dist2 = aggregate(diff, lit(0.0), (acc, d) => acc + d * d)
        struct(dist2.as("dist2"), lit(cid).as("cid"))
      }
      q.withColumn("__best", array_min(array(candidates: _*)))
        .select(col("id"), col("qv"),
          col("__best.cid").as("cluster"), col("__best.dist2").as("dist2"))
    }

    for (_ <- 1 until rounds) {
      val sums = assigned
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = sums.groupBy(_.getInt(0)).toSeq.map { case (cid, rows: Array[Row]) =>
        val dim = rows.length
        val mean = new Array[Double](dim)
        rows.foreach { r =>
          // exact: integral-double sum ÷ count, both engines IEEE-divide
          mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3).toDouble
        }
        (cid, mean)
      }.sortBy(_._1)
    }
    assigned.select(col("id"), col("cluster").cast(LongType).as("cluster"),
      col("dist2"))
  }
}
