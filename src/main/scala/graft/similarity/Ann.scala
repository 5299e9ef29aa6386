package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

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

  /** The shared ranking tail: top-k per query over a scored candidate
    * frame (`query_id`, `neighbor_id`, `cosine`), emitted as
    * (query_id, rank, neighbor_id, cosine) with the (cosine desc,
    * neighbor_id asc) total order.
    *
    * Implemented as the bounded [[org.apache.spark.sql.graftglue.TopKStruct]]
    * aggregate, NOT a `row_number()` window: Spark's WindowGroupLimit
    * pushdown bounds the window form's shuffle too, but forces a full
    * map-side SORT of every scored candidate (|Q|·|C| rows for brute
    * force) plus a second sort after the exchange, where the heap
    * aggregate does O(n·log k) updates with no sort at all — measured
    * 2.7× end-to-end on the brute margin decade (plans/SCALE.md r8.4;
    * requires the fallback-threshold conf [[graft.GraftSession.tune]]
    * sets, see [[org.apache.spark.sql.graftglue.TopKStruct]]).
    * Same rows, same order (unique ids per query make the order total), so
    * window-based SQL oracles remain valid bit-for-bit — with one
    * deliberate edge divergence: a NULL score (a null/zero-information
    * candidate, e.g. a null embedding's cosine) is never ranked, where the
    * window form's NULLS LAST padded trailing ranks with such candidates
    * when a query had fewer than k real ones. Ranking a null similarity
    * is meaningless; every oracled corpus has non-null vectors.
    */
  private[graft] def topKTail(scored: DataFrame, k: Int,
                              scoreCol: String = "cosine",
                              ascending: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, TopKStruct}
    // distance metrics (adc2/d2) rank ascending — the aggregate's
    // `smallest` flag flips the keep order without touching the values
    val agg = ColumnBridge.column(
      TopKStruct(ColumnBridge.expression(col(scoreCol)),
        ColumnBridge.expression(col("neighbor_id")), k,
        smallest = ascending).toAggregateExpression())
    scored.groupBy("query_id").agg(agg.as("__nbrs"))
      .select(col("query_id"), posexplode(col("__nbrs")).as(Seq("__p", "__nb")))
      .select(col("query_id"), (col("__p") + 1).cast(LongType).as("rank"),
        col("__nb.neighbor").as("neighbor_id"),
        col("__nb.score").as(scoreCol))
  }

  /** Brute-force cosine top-k: every query row scores every corpus row;
    * by default the QUERY side is broadcast (no corpus shuffle at all),
    * ranking is the bounded [[topKTail]] aggregate. Deterministic
    * tie-break on corpus id.
    *
    * `broadcastCorpus = true` flips the broadcast side — the shape for a
    * delta-sized CORPUS scored against a big query set (the streaming
    * margin-mining backward pass: every stored-corpus row ranks its
    * top-k within the arriving micro-batch, so the batch broadcasts and
    * the corpus streams through untouched). The result is identical
    * either way (a cross join is symmetric; only the build side moves).
    *
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     broadcastCorpus: Boolean = false): DataFrame = {
    // Norms computed once per row BEFORE the pairwise cross join — the join
    // then evaluates exactly one codegen'd dot product per (query, corpus)
    // pair instead of three interpreted HOF folds.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", Vectors.fnorm(col("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", Vectors.fnorm(col("c_vec")))
    val joined = if (broadcastCorpus) q.crossJoin(broadcast(c))
                 else c.crossJoin(broadcast(q))
    val scored = joined
      .withColumn("cosine",
        Vectors.fcosine(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")))
      .filter(col("query_id") =!= col("neighbor_id"))
    topKTail(scored, k)
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * derived from md5(seed:p:j) — reproducible across runs AND engines
    * without RNG state. The 15-hex-digit (60-bit) prefix keeps the integer
    * expressible in any engine's signed 64-bit hex parse (DuckDB:
    * `('0x' || substring(md5(s), 1, 15))::BIGINT`), so an oracle can rebuild
    * the exact same planes: v / 2^59 - 1 ∈ [-1, 1.00000…).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Int = 42): Array[Array[Double]] = {
    Array.tabulate(numPlanes, dim) { (p, j) =>
      md5Prefix60(s"$seed:$p:$j").toDouble / (1L << 59).toDouble - 1.0
    }
  }

  /** The 60-bit md5-prefix integer behind every derived-matrix device
    * ([[hyperplanes]], [[Jl.signMatrix]]): the 15-hex-digit prefix parses
    * in any engine's signed 64-bit hex space, so SQL oracles rebuild the
    * same values. ONE home (the [[Clustering.quantize]] rule): two copies
    * drifting apart would silently desync whichever family kept the
    * stale recipe from its oracle.
    */
  private[similarity] def md5Prefix60(key: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = digest.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Coarse-quantizer centroids shared by [[ivfTopK]] and
    * [[Pq.ivfAdcTopK]]: `nlist` corpus vectors picked by md5-order of the
    * row id (a STRING key — a LongType cast would null out non-numeric ids
    * and poison the assignment — doubling as the deterministic selection
    * order). Driver-collected BY DESIGN: centroid sets are config-table
    * sized, and landing them in the plan as literals makes assignment and
    * probing pure projections.
    */
  private[graft] def coarseCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Seq[(String, Seq[Float])] = {
    val centRows = corpus
      .select(md5(col(idCol).cast(StringType)).as("cent_id"), col(vecCol).as("cent_vec"))
      .orderBy("cent_id").limit(nlist)
      .collect()
    val cents: Seq[(String, Seq[Float])] =
      centRows.toIndexedSeq.map(r => (r.getString(0), r.getSeq[Float](1)))
    require(cents.nonEmpty, "empty corpus")
    cents
  }

  /** The centroid set as the native [[org.apache.spark.sql.graftglue
    * .ProbeCells]] expression — ONE reference object holding the whole
    * matrix, so the PLAN is constant size in nlist. The previous
    * formulation (`least()`/`array_sort` over nlist per-centroid struct
    * expressions, each embedding its centroid as a literal) scaled the
    * expression tree with nlist × dim: at nlist = 64 that is 4096 literal
    * doubles and 64 inlined dot expansions per projection, seconds of
    * analysis + Janino time per direction (measured: ivfTopK at
    * nlist = 16 cost 8× brute force on 1M pairs purely in plan overhead),
    * and a hard wall long before a production 4096-cell quantizer.
    */
  private def probeExpr(cents: Seq[(String, Seq[Float])], vec: Column,
                        nprobe: Int): Column = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, ProbeCells}
    ColumnBridge.column(ProbeCells(ColumnBridge.expression(vec),
      cents.map(_._1).toArray,
      cents.map(_._2.map(_.toDouble).toArray).toArray, nprobe))
  }

  /** Nearest-cell id for one row — a codegen'd projection with ZERO
    * shuffle (a crossJoin+groupBy formulation would re-shuffle every
    * corpus vector through an exchange).
    */
  private[graft] def nearestCell(cents: Seq[(String, Seq[Float])],
                                 vec: Column): Column =
    element_at(probeExpr(cents, vec, 1), 1)

  /** The `nprobe` nearest cells for a query row as an exploded column —
    * again a pure projection.
    */
  private[graft] def probeCells(cents: Seq[(String, Seq[Float])],
                                vec: Column, nprobe: Int): Column =
    explode(probeExpr(cents, vec, nprobe))

  /** IVF top-k (G7 scale path): coarse-quantize the corpus onto `nlist`
    * centroids, then search only the `nprobe` nearest cells per query —
    * the inverted-file ANN layout (à la FAISS IVF-Flat), relational:
    *
    *  1. centroids = `nlist` corpus vectors picked by md5-order
    *     (deterministic seeding), driver-collected: centroid sets are
    *     config-table sized by design, and landing them in the plan as
    *     LITERALS makes steps 2 and 3 pure projections;
    *  2. each corpus row assigns to its nearest centroid via the native
    *     [[org.apache.spark.sql.graftglue.ProbeCells]] expression (the
    *     centroid matrix as ONE reference object — constant plan size in
    *     nlist; see [[probeExpr]]) — a codegen'd projection with ZERO
    *     shuffle (a crossJoin+groupBy formulation would re-shuffle every
    *     corpus vector through the exchange);
    *  3. each query probes its `nprobe` nearest cells — the same
    *     expression at nprobe, again a projection;
    *  4. candidates = bucket contents of the probed cells (one equi-join on
    *     cell id); exact cosine re-ranks.
    *
    * With `nprobe == nlist` this is exhaustive and matches [[bruteForceTopK]].
    * Output shape matches [[bruteForceTopK]]; recall < 1 when nprobe < nlist.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 64, nprobe: Int = 8): DataFrame = {
    val cents = coarseCentroids(corpus, idCol, vecCol, nlist)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", Vectors.fnorm(col("c_vec")))
    val assigned = c.withColumn("cell", nearestCell(cents, col("c_vec")))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", Vectors.fnorm(col("q_vec")))
    val probed = q.withColumn("__pc",
        probeCells(cents, col("q_vec"), nprobe))
      .select(col("query_id"), col("q_vec"), col("q_norm"),
        col("__pc").as("cell"))
    // 4. search only the probed cells
    val cand = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.fcosine(col("q_vec"), col("c_vec"),
        col("q_norm"), col("c_norm")))
    topKTail(cand, k)
  }

  /** LSH-bucketed top-k (G7): bucket corpus and queries by the sign pattern
    * of `numPlanes` random hyperplanes; score only within matching buckets.
    * Recall < 1.0 by construction; probe multiple plane-subsets ("bands") to
    * raise it. Output shape matches [[bruteForceTopK]].
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, dim: Int,
              numPlanes: Int = 8, bands: Int = 2, seed: Int = 42): DataFrame = {
    // `dim` is caller-supplied (it's a property of the embedding model, not
    // of the data) — probing it with a driver-side .head() at plan time
    // would run a job just to build the plan.
    val planes = hyperplanes(numPlanes, dim, seed)
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
    topKTail(scored, k)
  }
}
