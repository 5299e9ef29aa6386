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

    def centersDf(radius: Float, count: Int = nClusters) =
      (0 until count).map { c =>
        (c.toLong, Array.tabulate(dim) { j =>
          (Ann.md5Prefix60(s"ctr:$c:$j").toDouble / (1L << 59).toDouble - 1.0)
            .toFloat * radius
        })
      }.toDF("__c", "__ctr")

    def deform(clusterOf: org.apache.spark.sql.Column,
               count: Int = nClusters): DataFrame = emb
      .withColumn("__c", clusterOf)
      .join(broadcast(centersDf(3.0f, count)), Seq("__c"))
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
          val res = Ann.ivfTopKWith(queries, df, "vec_id", "embedding", k,
              cents, nprobe)
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
        // the q_maxsim_ann_candidates composition's recall knobs: per-token
        // stored-index probes (trained centroids) vote candidates, exact
        // MaxSim settles — how much of the true top-k does the vote screen
        // recover at nprobe < nlist and small per-token shortlists?
        val idxDir = java.nio.file.Files
          .createTempDirectory("sweep_mscand").toString
        graft.similarity.Pq.writeIndex(df, "vec_id", "embedding",
          dim = dim, m = 4, k = 16, dir = idxDir, nlist = nlist,
          trained = true)
        val qTokVecs = df.filter(expr("vec_id DIV 5 % 29 = 0"))
        println("| composition (tokTopK, nprobe, cand=2k) | recall@10 |")
        println("|---|---|")
        for ((tk, nprobe, scored) <- Seq(
            (3, 2, false), (3, 4, false), (5, 4, false), (10, 8, false),
            (10, 16, false),
            (3, 2, true), (3, 4, true), (5, 4, true), (10, 8, true),
            (10, 16, true))) {
          val hits = graft.similarity.Pq.probeIndex(qTokVecs, "vec_id",
            "embedding", idxDir, topK = tk, nprobe = nprobe)
          import org.apache.spark.sql.expressions.Window
          val cand = (if (!scored) {
            // plain hit-count votes (the r11 query's screen — the shared
            // MaxSim.voteCandidates recipe, pre-cut form for the rnk below)
            graft.similarity.MaxSim.voteCandidates(
                hits.select(expr("query_id DIV 5").as("query_id"),
                  expr("neighbor_id DIV 5").as("neighbor_id")), topN = 2 * k)
              .withColumn("rnk", lit(1)) // already cut
          } else {
            // coverage+score screen: per (query token, doc) keep the MIN
            // ADC distance, rank docs by (#covering query tokens DESC,
            // summed min distance ASC) — the ColBERT-style approximate
            // MaxSim from retrieved token scores
            hits.select(col("query_id").as("qtok"),
                expr("query_id DIV 5").as("query_id"),
                expr("neighbor_id DIV 5").as("neighbor_id"), col("adc2"))
              .filter(col("query_id") =!= col("neighbor_id"))
              .groupBy("query_id", "qtok", "neighbor_id")
              .agg(min(col("adc2")).as("mind"))
              .groupBy("query_id", "neighbor_id")
              .agg(count(lit(1)).as("cov"), sum(col("mind")).as("sd"))
              .withColumn("rnk", row_number().over(
                Window.partitionBy(col("query_id"))
                  .orderBy(col("cov").desc, col("sd").asc,
                    col("neighbor_id").asc)))
          }).filter(col("rnk") <= 2 * k).select("query_id", "neighbor_id")
          val settled = MaxSim.rerank(cand, toks, qToks, "id", "pos",
            "embedding", k).select("query_id", "neighbor_id")
          val rec = settled.join(truthMs, Seq("query_id", "neighbor_id"))
            .count() / denomMs
          val label = if (scored) "cov+score" else "votes    "
          println(f"| $label tokTopK=$tk%-2d nprobe=$nprobe%-2d/$nlist | $rec%.3f |")
        }
        truthMs.unpersist()
      }
      df.unpersist()
    }

    // ---- 4. the composition in its NATIVE regime: distinctive tokens ----
    // real token embeddings cluster at vocabulary granularity — a query
    // token's true MaxSim contributors ARE its nearest neighbors. 128
    // fine clusters over 2000 tokens (~16 tokens each), index nlist = 32:
    // the regime the per-token candidate generation exists for, vs the
    // 16-coarse-cluster corpus above where within-cluster order is noise
    // and the pooled screen wins.
    {
      val fine = deform(pmod(col("vec_id"), lit(128L)), count = 128)
      val toks = fine.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val qToks = toks.filter(col("id") % 29 === 0)
      val k = 10
      val nQDocs = qToks.select("id").distinct().count()
      val denomMs = (nQDocs * k).toDouble
      val truthMs = MaxSim.maxSimTopK(toks, qToks, "id", "pos", "embedding", k)
        .select("query_id", "neighbor_id").cache()
      truthMs.count()
      val idxDir = java.nio.file.Files
        .createTempDirectory("sweep_mscand_fine").toString
      graft.similarity.Pq.writeIndex(fine, "vec_id", "embedding",
        dim = dim, m = 4, k = 16, dir = idxDir, nlist = 32, trained = true)
      val qTokVecs = fine.filter(expr("vec_id DIV 5 % 29 = 0"))
      println(s"\n==== distinctive-token regime (128 fine clusters, " +
        s"qdocs=$nQDocs, k=$k) ====")
      println("| composition (tokTopK, nprobe, cand=2k) | recall@10 |")
      println("|---|---|")
      import org.apache.spark.sql.expressions.Window
      for ((tk, nprobe) <- Seq((3, 4), (5, 4), (5, 8), (10, 8), (10, 32))) {
        val hits = graft.similarity.Pq.probeIndex(qTokVecs, "vec_id",
          "embedding", idxDir, topK = tk, nprobe = nprobe)
        val cand = MaxSim.voteCandidates(
          hits.select(expr("query_id DIV 5").as("query_id"),
            expr("neighbor_id DIV 5").as("neighbor_id")), topN = 2 * k)
        val settled = MaxSim.rerank(cand, toks, qToks, "id", "pos",
          "embedding", k).select("query_id", "neighbor_id")
        val rec = settled.join(truthMs, Seq("query_id", "neighbor_id"))
          .count() / denomMs
        println(f"| votes tokTopK=$tk%-2d nprobe=$nprobe%-2d/32 | $rec%.3f |")
      }
      truthMs.unpersist(); fine.unpersist()
    }
    spark.stop()
  }
}
