package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Ann, MaxSim}

/** Clustered-distribution measurement for the coarse quantizer and the
  * MaxSim pooled screen (plans/ANN.md r11). The stock `embeddings` table is
  * near-isotropic noise — the one regime where a random-document coarse
  * quantizer looks fine — so this harness deforms it into clustered corpora
  * (the shape real embedding models produce) and measures the two claims
  * that matter at 100 TB:
  *
  *  1. cell balance: per-cell row counts under random-document centroids
  *     (`Ann.coarseCentroids`) vs trained ones (`Ann.trainedCentroids`) —
  *     the max-cell fraction IS the worst-case pruned-probe scan fraction;
  *  2. routing recall@k at nprobe < nlist for both, with the scanned
  *     fraction, via IVF-FLAT (`Ann.ivfTopK` — exact cosine inside probed
  *     cells), so the number isolates ROUTING loss from code distortion.
  *
  * Why random-document centroids fail here: md5-order picks are a uniform
  * document sample, so with `nlist` comparable to the number of natural
  * clusters the sample MISSES ~1/e of them (coupon collector) while
  * landing 2–3 picks in others — unsampled clusters pile whole into a
  * neighbor's cell (hot cells, degraded pruning) and multi-pick clusters
  * waste cells. Farthest-point seeding covers every well-separated cluster
  * by construction before Lloyd balances the means.
  *
  * Corpus construction (deterministic, no RNG): row i joins cluster
  * c = i mod C (equal sizes — the coupon-collector regime) or the
  * exponentially size-skewed map floor(log2(1 + i mod 255)) (hot-cluster
  * regime); its vector is center_c + 0.5 · original_i, centers drawn from
  * the md5Prefix60 recipe at radius 3 so inter-center distance dwarfs the
  * within-cluster noise.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ClusteredSweep
  */
object ClusteredSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val nClusters = 16
    val nlist = 16
    val k = 10
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")

    def centersDf(radius: Float) = (0 until nClusters).map { c =>
      (c.toLong, Array.tabulate(dim) { j =>
        (Ann.md5Prefix60(s"ctr:$c:$j").toDouble / (1L << 59).toDouble - 1.0)
          .toFloat * radius
      })
    }.toDF("__c", "__ctr")

    def deform(clusterOf: org.apache.spark.sql.Column): DataFrame = emb
      .withColumn("__c", clusterOf)
      .join(broadcast(centersDf(3.0f)), Seq("__c"))
      .select(col("vec_id"),
        zip_with(col("__ctr"), col("embedding"),
          (a, b) => a + lit(0.5f) * b).as("embedding"),
        col("__c"))
      .cache()

    def balanceRow(df: DataFrame, n: Long,
                   cents: Seq[(String, Seq[Float])], label: String): Unit = {
      val counts = df
        .select(Ann.nearestCell(cents, col("embedding")).as("cell"))
        .groupBy("cell").count().as[(String, Long)].collect()
        .map(_._2).sorted
      val padded = Array.fill(nlist - counts.length)(0L) ++ counts
      val maxFrac = padded.max.toDouble / n
      println(f"| $label | nonempty ${counts.length}/$nlist | " +
        f"min ${padded.min} | p50 ${padded(nlist / 2)} | max ${padded.max} " +
        f"(${maxFrac * 100}%.1f%% of corpus) |")
    }

    for ((name, clusterOf) <- Seq(
        ("equal", pmod(col("vec_id"), lit(nClusters.toLong))),
        ("skewed", floor(log2(lit(1) + pmod(col("vec_id"), lit(255))))
          % nClusters))) {
      val df = deform(clusterOf)
      val n = df.count()
      val sizes = df.groupBy("__c").count().orderBy("__c")
        .as[(Long, Long)].collect()
      println(s"\n==== $name clusters: corpus=$n sizes=${
        sizes.map(_._2).mkString(",")} ====")
      println(s"| coarse quantizer (nlist=$nlist) | cells | min | p50 | max |")
      println("|---|---|---|---|---|")
      val randC = Ann.coarseCentroids(df, "vec_id", "embedding", nlist)
      val trainC = Ann.trainedCentroids(df, "vec_id", "embedding", nlist)
      balanceRow(df, n, randC, "random (md5-order docs)")
      balanceRow(df, n, trainC, "trained (Gonzalez+Lloyd)")

      // routing recall: IVF-FLAT (exact cosine inside probed cells) vs the
      // exact brute-force cosine truth — pure routing loss
      val queries = df.filter(col("vec_id") % 41 === 0)
      val nQ = queries.count()
      val truth = Ann.bruteForceTopK(queries, df, "vec_id", "embedding", k)
        .select("query_id", "neighbor_id").cache()
      truth.count()
      val denom = (nQ * k).toDouble
      println(s"queries=$nQ k=$k (IVF-Flat recall vs brute cosine; " +
        "scanned = probed-cell candidate pairs / exhaustive)")
      println("| config | recall@10 | scanned |")
      println("|---|---|---|")
      for ((label, cents) <- Seq(("random ", randC), ("trained", trainC))) {
        val assigned = df.select(col("vec_id").as("nid"),
          Ann.nearestCell(cents, col("embedding")).as("cell")).cache()
        assigned.count()
        for (nprobe <- Seq(1, 2, 4)) {
          val res = Ann.ivfTopK(queries, df, "vec_id", "embedding", k,
              nlist = nlist, nprobe = nprobe,
              trained = label.trim == "trained")
            .select("query_id", "neighbor_id")
          val rec = res.join(truth, Seq("query_id", "neighbor_id")).count() / denom
          val scannedPairs = queries
            .select(col("vec_id").as("qid"),
              Ann.probeCells(cents, col("embedding"), nprobe).as("cell"))
            .join(assigned, Seq("cell"))
            .filter(col("qid") =!= col("nid")).count()
          val frac = scannedPairs.toDouble / (nQ * (n - 1)).toDouble
          println(f"| IVF-Flat $label nprobe=$nprobe%-2d/$nlist | $rec%.3f | ${frac * 100}%.1f%% |")
        }
        assigned.unpersist()
      }
      truth.unpersist()

      // MaxSim pooled screen on the clustered tokens (equal regime only —
      // the ColBERT-like topical-token shape, vs the isotropic-noise
      // caveat on plans/ANN.md's r10 rows)
      if (name == "equal") {
        val toks = df.select(expr("vec_id DIV 5").as("id"),
          expr("vec_id % 5").as("pos"), col("embedding"))
        val qToks = toks.filter(col("id") % 29 === 0)
        val nQDocs = qToks.select("id").distinct().count()
        val denomMs = (nQDocs * k).toDouble
        val truthMs = MaxSim.maxSimTopK(toks, qToks, "id", "pos", "embedding", k)
          .select("query_id", "neighbor_id").cache()
        truthMs.count()
        println(s"MaxSim pooled screen on clustered tokens (qdocs=$nQDocs, k=$k)")
        println("| config | recall@10 |")
        println("|---|---|")
        for (mShort <- Seq(10, 20, 50)) {
          val res = MaxSim.maxSimTopKPooled(toks, qToks, "id", "pos",
            "embedding", k, mShort = mShort).select("query_id", "neighbor_id")
          val rec = res.join(truthMs, Seq("query_id", "neighbor_id")).count() / denomMs
          println(f"| pooled mShort=$mShort%-3d | $rec%.3f |")
        }
        truthMs.unpersist()
      }
      df.unpersist()
    }
    spark.stop()
  }
}
