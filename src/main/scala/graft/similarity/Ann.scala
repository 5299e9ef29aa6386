package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §2.G6–G7).
  *
  * Scale posture: [[bruteForceTopK]] broadcasts the query set (queries ×
  * corpus is fine when queries fit in an executor); [[lshTopK]] buckets both
  * sides by random-hyperplane signature so corpus×corpus search shuffles
  * O(n) rows per probe instead of n².
  */
object Ann {

  /** Brute-force cosine top-k: every query row scores every corpus row;
    * the query side is broadcast (no corpus shuffle at all), ranking is a
    * per-query window. Deterministic tie-break on corpus id.
    *
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // Norms computed once per row BEFORE the pairwise cross join — the join
    // then evaluates exactly one codegen'd dot product per (query, corpus)
    // pair instead of three interpreted HOF folds.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", Vectors.fnorm(col("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", Vectors.fnorm(col("c_vec")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine",
        Vectors.fcosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * derived from md5(seed:p:j) — reproducible across runs/engines without
    * RNG state.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Int = 42): Array[Array[Double]] = {
    Array.tabulate(numPlanes, dim) { (p, j) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$p:$j".getBytes("UTF-8"))
      // first 8 bytes → uniform in [-1, 1)
      val v = java.nio.ByteBuffer.wrap(hex).getLong
      v.toDouble / Long.MaxValue.toDouble
    }
  }

  /** IVF top-k (G7 scale path): coarse-quantize the corpus onto `nlist`
    * centroids, then search only the `nprobe` nearest cells per query —
    * the inverted-file ANN layout (à la FAISS IVF-Flat), relational:
    *
    *  1. centroids = `nlist` corpus vectors picked by md5-order (deterministic
    *     seeding; driver-collected + broadcast — centroid sets are config-
    *     table sized by design);
    *  2. each corpus row assigns to its nearest centroid via `min_by` (one
    *     partial-aggregable pass, no window shuffle);
    *  3. each query probes its `nprobe` nearest cells; candidates = bucket
    *     contents of those cells; exact cosine re-ranks.
    *
    * With `nprobe == nlist` this is exhaustive and matches [[bruteForceTopK]].
    * Output shape matches [[bruteForceTopK]]; recall < 1 when nprobe < nlist.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 64, nprobe: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", Vectors.fnorm(col("c_vec")))
    val cents = c.select(col("neighbor_id").as("cent_id"), col("c_vec").as("cent_vec"),
        col("c_norm").as("cent_norm"))
      .withColumn("__ord", md5(col("cent_id").cast("string")))
      .orderBy("__ord").limit(nlist).drop("__ord")
    // 2. nearest-centroid assignment: min_by over the (corpus × centroids)
    //    expansion — partial aggregation keeps it one shuffle on neighbor_id.
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("sim", Vectors.fcosine(col("c_vec"), col("cent_vec"),
        col("c_norm"), col("cent_norm")))
      .groupBy("neighbor_id")
      .agg(min_by(col("cent_id"), struct((col("sim") * -1).as("d"), col("cent_id")))
        .as("cell"),
        first(col("c_vec")).as("c_vec"), first(col("c_norm")).as("c_norm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", Vectors.fnorm(col("q_vec")))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("sim", Vectors.fcosine(col("q_vec"), col("cent_vec"),
        col("q_norm"), col("cent_norm")))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("cent_id").asc)
    val probed = probes.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("q_norm"), col("cent_id").as("cell"))
    // 3. search only the probed cells
    val cand = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.fcosine(col("q_vec"), col("c_vec"),
        col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** LSH-bucketed top-k (G7): bucket corpus and queries by the sign pattern
    * of `numPlanes` random hyperplanes; score only within matching buckets.
    * Recall < 1.0 by construction; probe multiple plane-subsets ("bands") to
    * raise it. Output shape matches [[bruteForceTopK]].
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, bands: Int = 2, seed: Int = 42): DataFrame = {
    val dim = queries.select(size(col(vecCol))).head().getInt(0)
    val planes = typedLit(hyperplanes(numPlanes, dim, seed))
    val perBand = numPlanes / bands
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame = {
      val sigCol = Vectors.hyperplaneSignature(col(vec), planes)
      val bandKeys = array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",", slice(sigCol, b * perBand + 1, perBand)).as("bkey"))
      }: _*)
      df.select(col(id), col(vec), explode(bandKeys).as("bk"))
        .select(col(id), col(vec), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    }
    val q = bucketed(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec")
    val c = bucketed(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "neighbor_id", "c_vec")
    val cand = q.join(c, Seq("band", "bkey"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_vec", "neighbor_id", "c_vec").distinct()
    val scored = cand
      .withColumn("cosine", Vectors.fcosine(col("q_vec"), col("c_vec"),
        Vectors.fnorm(col("q_vec")), Vectors.fnorm(col("c_vec"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }
}
