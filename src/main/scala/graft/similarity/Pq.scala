package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the memory-compression scale path for
  * embedding search that [[Ann]]'s IVF/LSH variants don't cover: at 100 TB
  * a float corpus cannot stay resident, but `m` one-byte codes per vector
  * can. Splits each vector into `m` contiguous subspaces, k-means each
  * subspace ([[Clustering.lloydCentroids]] — md5-seeded, quantized, so
  * training is bit-deterministic cross-engine), stores per-vector code
  * words, and answers queries with asymmetric distance computation (ADC):
  * the query precomputes an m×k distance table; each corpus row costs m
  * map lookups + adds, never a dot product.
  *
  * Scale shape: training collects only k·subdim doubles per subspace
  * (model-sized); encoding is a zero-shuffle projection against broadcast
  * codebook literals; ADC scoring broadcasts the query-side distance
  * tables and the corpus never shuffles — the only exchange is the
  * per-query top-k window, over rows already cut to (id, score).
  *
  * Determinism: subspace distances fold left-to-right over quantized
  * components (≡ DuckDB `list_dot_product`); the ADC sum adds the m
  * subspace distances in fixed subspace order; ranks tie-break by
  * neighbor id.
  */
object Pq {

  // quantization + distance fold are SHARED with Clustering (one home for
  // the cross-engine determinism contract)
  private def quantize(vec: Column, scale: Double): Column =
    Clustering.quantize(vec, scale)
  private def dist2(subv: Column, cv: Array[Double]): Column =
    Clustering.dist2(subv, cv)

  /** Per-subspace codebooks: `m` independent Lloyd runs over the sliced
    * corpus. `dim` is passed, not probed ([[Ann]] lesson — no driver
    * `.head()` at plan time). Returns one (cid, centroid) set per subspace.
    */
  def trainCodebooks(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, k: Int, rounds: Int = 2,
                     scale: Double = 1048576.0): Seq[Seq[(Int, Array[Double])]] = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must divide into m ($m) subspaces")
    val sub = dim / m
    (0 until m).map { j =>
      Clustering.lloydCentroids(
        df.select(col(idCol).as("id"),
          slice(col(vecCol), j * sub + 1, sub).as("subv")),
        "id", "subv", k, rounds, scale)
    }
  }

  /** Encode the corpus: (id, codes) with one centroid id per subspace —
    * a zero-shuffle projection chain against broadcast codebook literals.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebooks: Seq[Seq[(Int, Array[Double])]],
             scale: Double = 1048576.0): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head._2.length
    var cur = df.select(col(idCol).as("id"), quantize(col(vecCol), scale).as("__qv"))
    for (j <- 0 until m) {
      cur = Clustering.withCluster(
          cur.withColumn("__sv", slice(col("__qv"), j * sub + 1, sub)),
          "__sv", codebooks(j), scale = 1.0)
        .withColumnRenamed("cluster", s"__c$j")
        .drop("dist2", "__sv")
    }
    cur.select(col("id"),
      array((0 until m).map(j => col(s"__c$j")): _*).as("codes"))
  }

  /** ADC top-k: for each query, the `topK` nearest corpus codes by summed
    * per-subspace quantized squared L2 to the query's exact subvectors.
    * Self-pairs are excluded (the [[Ann.bruteForceTopK]] convention).
    * Output: (query_id, rank, neighbor_id, adc2).
    */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, codebooks: Seq[Seq[(Int, Array[Double])]],
              topK: Int, scale: Double = 1048576.0): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head._2.length
    // query-side distance tables (cid → d2), computed BEFORE the broadcast
    // cross join so each corpus row pays m map lookups, not m×k folds
    var q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol), scale).as("__qv"))
    for (j <- 0 until m) {
      val cb = codebooks(j).sortBy(_._1)
      val subv = slice(col("__qv"), j * sub + 1, sub)
      q = q.withColumn(s"__dt$j",
        map_from_arrays(typedLit(cb.map(_._1)),
          array(cb.map { case (_, cv) => dist2(subv, cv) }: _*)))
    }
    val codes = encode(corpus, idCol, vecCol, codebooks, scale)
    val adc2 = (0 until m).map(j =>
        element_at(col(s"__dt$j"), element_at(col("codes"), j + 1)))
      .reduce(_ + _)
    val scored = codes.crossJoin(broadcast(q.drop("__qv")))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"), adc2.as("adc2"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc2").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("adc2"))
  }
}
