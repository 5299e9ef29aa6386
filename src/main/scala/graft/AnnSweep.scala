package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** Recall/latency sweep for the ANN paths (SURVEY G6/G7): measures each
  * approximate configuration against brute-force ground truth on the same
  * query set, printing one markdown row per config. Results are recorded in
  * `plans/ANN.md` — claims about the recall/latency trade-off live as
  * numbers in the repo, not prose.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.AnnSweep
  */
object AnnSweep {
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

    val k = 10
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 500)
    val nCorpus = emb.count(); val nQ = queries.count()

    // by-name thunk: plan CONSTRUCTION must run inside the timer — ivfTopK
    // eagerly collects centroids (a real Spark job), and timing only the
    // action would understate IVF latency vs the fully-lazy brute/LSH plans
    def timed(mk: => DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      val out = mk.select("query_id", "neighbor_id").cache()
      out.count()
      (out, (System.nanoTime() - t0) / 1e9)
    }

    // ground truth (also the warmup for the shared scan)
    val (truth, tBrute) = timed(Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", k))
    val denom = (nQ * k).toDouble

    def recall(approx: DataFrame): Double =
      approx.join(truth, Seq("query_id", "neighbor_id")).count() / denom

    println(s"corpus=$nCorpus queries=$nQ k=$k sf=$sfDir cpus=$cpus")
    println("| config | recall@10 | seconds | vs brute |")
    println("|---|---|---|---|")
    println(f"| brute force | 1.000 | $tBrute%.2f | 1.00x |")
    for (nprobe <- Seq(1, 2, 4, 8, 16, 32, 64)) {
      // trained = false, explicitly: this sweep's historical tables
      // (plans/ANN.md r8-r11) measure the md5-pick quantizer, and the
      // r12 trained default would otherwise re-run full k-means INSIDE
      // the timer once per nprobe row over identical inputs — the
      // trained-quantizer comparison has its own harness (ClusteredSweep)
      val (res, t) = timed(Ann.ivfTopK(queries, emb, "vec_id", "embedding", k,
        nlist = 64, nprobe = nprobe, trained = false))
      println(f"| IVF nlist=64 nprobe=$nprobe%-2d | ${recall(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
      res.unpersist()
    }
    for ((planes, bands) <- Seq((8, 2), (16, 4), (16, 8), (24, 8))) {
      val (res, t) = timed(Ann.lshTopK(queries, emb, "vec_id", "embedding", k,
        dim = 64, numPlanes = planes, bands = bands))
      println(f"| LSH planes=$planes%-2d bands=$bands%-2d | ${recall(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
      res.unpersist()
    }
    // PQ/ADC approximates L2, so its recall measures against an exact-L2
    // ground truth (d² = |q|² + |c|² − 2·q·c via the codegen dot), not the
    // cosine truth above; training (per-subspace Lloyd) runs inside the
    // timer like IVF's centroid job
    val (truthL2, tL2) = timed {
      import graft.functions.Vectors
      import org.apache.spark.sql.expressions.Window
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("qn", Vectors.fnorm(col("qv")))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .withColumn("cn", Vectors.fnorm(col("cv")))
      val w = Window.partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
      c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("d2", col("qn") * col("qn") + col("cn") * col("cn")
          - lit(2.0) * Vectors.fdot(col("qv"), col("cv")))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"))
    }
    def recallL2(approx: DataFrame): Double =
      approx.join(truthL2, Seq("query_id", "neighbor_id")).count() / denom
    println(f"| brute force L2 | 1.000 | $tL2%.2f | ${tL2 / tBrute}%.2fx |")
    for ((m, kk) <- Seq((2, 16), (4, 16), (4, 64), (8, 64))) {
      val (res, t) = timed {
        val cbs = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
          dim = 64, m = m, k = kk, rounds = 2)
        graft.similarity.Pq.adcTopK(queries, emb, "vec_id", "embedding", cbs, k)
      }
      println(f"| PQ m=$m%-2d k=$kk%-2d | ${recallL2(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
      res.unpersist()
    }
    // OPQ: ONE parametric rotation (Pca.rotation — exact-integer scatter +
    // driver Jacobi), then the same PQ configs over rotated vectors. An
    // orthonormal rotation preserves exact-L2 neighborhoods, so recall
    // measures against the SAME truthL2; gains appear when per-subspace
    // variance was imbalanced — on isotropic synthetic embeddings expect
    // parity (the measurement is the honesty check, either way).
    val rot = graft.similarity.Pca.rotation(emb, "embedding", dim = 64)
    val rEmb = graft.similarity.Pca.rotateAll(emb, "embedding", rot)
    val rQs = graft.similarity.Pca.rotateAll(queries, "embedding", rot)
    for ((m, kk) <- Seq((2, 16), (4, 16), (4, 64), (8, 64))) {
      val (res, t) = timed {
        val cbs = graft.similarity.Pq.trainCodebooks(rEmb, "vec_id", "embedding",
          dim = 64, m = m, k = kk, rounds = 2)
        graft.similarity.Pq.adcTopK(rQs, rEmb, "vec_id", "embedding", cbs, k)
      }
      println(f"| OPQ-rot PQ m=$m%-2d k=$kk%-2d | ${recallL2(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
      res.unpersist()
    }
    // IVF-routed ADC (Pq.ivfAdcTopK): same codebooks per row-group, the
    // scan restricted to nprobe/nlist of the cells. recall measures against
    // the SAME exact-L2 truth; the "scanned" column is the fraction of
    // (query, code) pairs the routed join actually scored vs the
    // exhaustive queries×corpus scan — the quantity that becomes the bill
    // at corpus scale.
    {
      import graft.functions.Vectors
      val cbs = graft.similarity.Pq.trainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 4, k = 16, rounds = 2)
      val exhaustivePairs = (nQ * (nCorpus - 1)).toDouble
      // loop-invariant across nprobe: one centroid collect + one cached
      // cell-assignment frame, not one per sweep point
      val cents = graft.similarity.Ann.coarseCentroids(emb, "vec_id", "embedding", 64)
      val assigned = emb.select(col("vec_id").as("nid"),
        graft.similarity.Ann.nearestCell(cents, col("embedding")).as("cell"))
        .cache()
      for (nprobe <- Seq(1, 2, 4, 8, 16, 32, 64)) {
        val (res, t) = timed(graft.similarity.Pq.ivfAdcTopK(
          queries, emb, "vec_id", "embedding", cbs, k, nlist = 64, nprobe = nprobe))
        // scanned fraction: count the routed candidate pairs pre-top-k
        val scanned = {
          val probed = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
            .withColumn("__pc",
              graft.similarity.Ann.probeCells(cents, col("qv"), nprobe))
            .select(col("qid"), col("__pc").as("cell"))
          probed.join(assigned, Seq("cell")).filter(col("qid") =!= col("nid")).count()
        }
        println(f"| IVFPQ m=4 k=16 nprobe=$nprobe%-2d | ${recallL2(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx | scanned ${scanned / exhaustivePairs * 100}%.1f%% |")
        res.unpersist()
      }
      assigned.unpersist()
      // + exact re-rank: widen the routed shortlist to m, settle top-k
      // with |Q|·m exact dots — the recall lever (codes recall what the
      // codebook distorts; exact dots restore the order inside the
      // shortlist, so recall ≈ shortlist recall, not code recall)
      for ((nprobe, mShort) <- Seq((8, 50), (16, 50), (32, 100))) {
        val (res, t) = timed {
          val short = graft.similarity.Pq.ivfAdcTopK(queries, emb,
            "vec_id", "embedding", cbs, mShort, nlist = 64, nprobe = nprobe)
          graft.similarity.Pq.rerank(short, queries, emb, "vec_id", "embedding", k)
        }
        println(f"| IVFPQ+rerank nprobe=$nprobe%-2d m=$mShort%-3d | ${recallL2(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx | |")
        res.unpersist()
      }
    }
    // SQ8 (G52): byte-per-dim codes, asymmetric distance — measures
    // against the exact-L2 truth like PQ. Expect recall near 1: the
    // per-dim error is range/255 (~0.4% of range), far below PQ's
    // subspace rounding — the point of the 1 B/dim operating point.
    {
      val (res, t) = timed {
        val scales = graft.similarity.Sq.trainScales(emb, "embedding", dim = 64)
        graft.similarity.Sq.sqTopK(queries, emb, "vec_id", "embedding", scales, k)
      }
      println(f"| SQ8 (1 B/dim) | ${recallL2(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
      res.unpersist()
    }
    // JL (G53): brute-force cosine in the sign-projected space, recall
    // vs the full-space COSINE truth. On these near-isotropic synthetic
    // embeddings rank gaps sit below the projection distortion, so low
    // recall here is the data's geometry, not a defect — the distortion
    // lemma itself is spec-asserted (SqJlSpec); on clustered real
    // corpora the JL guarantee transfers neighborhoods, not noise ranks.
    for (outDim <- Seq(8, 16, 32, 48)) {
      val (res, t) = timed(graft.similarity.Jl.jlTopK(
        queries, emb, "vec_id", "embedding", dim = 64, outDim = outDim, k))
      println(f"| JL outDim=$outDim%-2d | ${recall(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
      res.unpersist()
    }
    // MaxSim (G59): late-interaction recall — documents are 5-token
    // matrices (vec_id DIV 5), ground truth is the exact MaxSim
    // interaction, and the two approximation knobs measure separately:
    // mShort (how much the SUM-pooled screen loses before the exact
    // re-rank) and nprobe (how much pooled-centroid routing loses on top,
    // via the stored index). recall@k is against the MaxSim truth, so a
    // 1.000 row means the knob was lossless ON THIS DATA at that setting.
    {
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val qToks = toks.filter(col("id") < 40)
      val nQDocs = qToks.select("id").distinct().count()
      val denomMs = (nQDocs * k).toDouble
      val (truthMs, tMs) = timed(graft.similarity.MaxSim.maxSimTopK(
        toks, qToks, "id", "pos", "embedding", k))
      def recallMs(approx: DataFrame): Double =
        approx.join(truthMs, Seq("query_id", "neighbor_id")).count() / denomMs
      println(f"| MaxSim exact (multi-vector) | 1.000 | $tMs%.2f | ${tMs / tBrute}%.2fx |")
      for (mShort <- Seq(10, 20, 50)) {
        val (res, t) = timed(graft.similarity.MaxSim.maxSimTopKPooled(
          toks, qToks, "id", "pos", "embedding", k, mShort = mShort))
        println(f"| MaxSim pooled mShort=$mShort%-3d | ${recallMs(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
        res.unpersist()
      }
      // the stored index: build once OUTSIDE the probe timer (amortized —
      // the decade rows in plans/SCALE.md r10.3 time the build)
      val idxDir = java.nio.file.Files.createTempDirectory("sweep_msidx").toString
      graft.similarity.MaxSim.writeIndex(toks, "id", "pos", "embedding",
        idxDir, nlist = 16)
      for (nprobe <- Seq(1, 2, 4, 8, 16)) {
        val (res, t) = timed(graft.similarity.MaxSim.probeIndex(
          qToks, "id", "pos", "embedding", idxDir, k = k, nprobe = nprobe,
          mShort = 50))
        println(f"| MaxSim index nlist=16 nprobe=$nprobe%-2d mShort=50 | ${recallMs(res)}%.3f | $t%.2f | ${t / tBrute}%.2fx |")
        res.unpersist()
      }
    }
    spark.stop()
  }
}
