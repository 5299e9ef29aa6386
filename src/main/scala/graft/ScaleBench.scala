package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.dedup.Dedup
import graft.sources.Tables

/** Scale-growth experiment (plans/SCALE.md): replicate the sf0.1 corpus
  * `factor`× with salted ids (no sf1 testdata exists; synthesis is the
  * available lever) and measure how the flagship pipelines scale. Text
  * replicas are byte-identical to the originals — deliberately: a k×
  * replicated crawl is the dup-HEAVY regime, which is exactly where the
  * near-dup path's cost model (bucket sizes → in-bucket pair expansion)
  * gets stressed, and where the documented production composition
  * (exact dedup FIRST, then near-dup on survivors) must prove itself.
  *
  * Usage: runMain graft.ScaleBench [baseDir] [factor] [workDir]
  */
object ScaleBench {

  private def synth(spark: SparkSession, base: String, factor: Int,
                    work: String): String = {
    val dir = s"$work/x$factor"
    val docs = Tables.load(spark, base, "documents")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val reps = spark.range(factor).select(col("id").as("__r"))
    docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("__r") * maxDoc).drop("__r")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val orders = Tables.load(spark, base, "orders")
    val ordMax = orders.agg(max("o_orderkey"), max("o_custkey")).head()
    val maxOrd = ordMax.getLong(0) + 1L
    val maxCust = ordMax.getLong(1) + 1L
    // salt BOTH keys: each replica is its own customer population, so
    // per-customer chain lengths (the kb/pagerank graph shape) are
    // preserved and the graph grows by components, not by depth
    orders.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("__r") * maxOrd)
      .withColumn("o_custkey", col("o_custkey") + col("__r") * maxCust)
      .drop("__r")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // embeddings replicate like documents (salted vec_id) for the G45/G46
    // decades; replicas are identical vectors — the dup-saturated regime,
    // worst case for neighborhood means (every kNN list fills with clones)
    val emb = Tables.load(spark, base, "embeddings")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1L
    emb.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("__r") * maxVec).drop("__r")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events replicate RAW (spark.read, not Tables.events — the loader
    // adds normalized ts columns that would change the stored schema),
    // salting BOTH ids so each replica is its own user population:
    // per-user session shapes are preserved and the sessionize family
    // grows by users, not by per-user event depth. The raw read needs
    // the same NANOS escape hatch Tables.events sets — some testdata
    // generations ship TIMESTAMP(NANOS), which the reader rejects
    // outright without it (the replica then round-trips as LongType ts,
    // the case Tables.events already normalizes)
    // the escape hatch is SCOPED to this replication read (save/restore):
    // session-wide it would leak legacy nanos-as-long semantics into every
    // later parquet read of the same driver run
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrev = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    try {
      val ev = spark.read.parquet(s"$base/events.parquet")
      // one scan for both maxima, not one aggregate job per key
      val evMax = ev.agg(max("user_id"), max("event_id")).head()
      val maxUser = evMax.getLong(0) + 1L
      val maxEv = evMax.getLong(1) + 1L
      ev.crossJoin(reps)
        .withColumn("user_id", col("user_id") + col("__r") * maxUser)
        .withColumn("event_id", col("event_id") + col("__r") * maxEv)
        .drop("__r")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally nanosPrev match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None    => spark.conf.unset(nanosKey)
    }
    dir
  }

  /** The documented production posture for a dup-heavy corpus: collapse
    * exact copies first (hash group-by — cheap, linear), then run the
    * near-dup flagship on the survivors.
    */
  private def neardupComposed(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val keep = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val d = docs.join(keep, "doc_id")
    Dedup.keepCanonical(d, "doc_id", "text",
        numHashes = 16, bands = 4, rowsPerBand = 4, maxBucket = 256)
      .select(col("doc_id"), col("lang"))
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft_scale")
    // optional comma-separated measurement filter (4th arg) so the long
    // decades (30x/100x) can target just the flagships under study
    // instead of re-paying the full sweep
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet)
    def want(n: String): Boolean = only.forall(_.contains(n))
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // the idxmaintain batch_ms series reads recentProgress, which Spark
    // caps at 100 entries by default — a many-batch decade run would
    // silently lose its EARLIEST batches, the exact ones the
    // deepening-tree growth comparison needs
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")

    val big = synth(spark, base, factor, work)
    println(s"[scalebench] synthesized $big")

    def time(name: String, dir: String)(mk: => DataFrame): Unit = if (want(name)) {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // full materialization, not count(): count lets Catalyst prune the
        // transform tail and drop cardinality-preserving joins (Bench has
        // the full story); drain between runs so run 2 doesn't read run
        // 1's tracked cache and report a cache hit as scaling behavior
        val n = mk.queryExecution.toRdd.count()
        Caching.drain()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[scalebench] $name dir=$dir min=${ts.map(_._1).min}%.2f s " +
        f"rows=${ts.head._2} runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    for (dir <- Seq(base, big)) {
      // r8 additions ride the same loop: substring dedup is the worst-case
      // regime here (every replica's every window is a dup — the islands
      // path sees ~the whole window set); heavy hitters and drift are
      // scan-dominated and should grow linearly with constant shuffle.
      for (q <- Seq("q_neardup_pipeline", "q_llm_pipeline", "q_kb_infer", "q_pagerank",
          "q_substring_dedup", "q_substring_dedup_clean", "q_heavy_hitters",
          "q_distribution_drift", "q_winnow", "q_decontaminate_winnow",
          // r9: the chunk-grid CLEAN transform (spanDedupClean ships text
          // through the span join like substringDedupClean does — its own
          // decade row, not inferred from the substring one)
          "q_span_dedup_clean",
          // r9 G49/G50/G51: the sketch is k-bounded (flat shuffle by
          // construction), soft dedup rides the neardup exchanges, the
          // bucket window sorts only the score table
          "q_corpus_overlap", "q_soft_dedup", "q_ccnet_buckets",
          // r8 bounded-aggregate conversions (documents/orders-based, so
          // they ride the synthesized decades)
          "q_tfidf", "q_sample_per_group", "q_vocab", "q_gram",
          // r9 G52/G53: SQ is scan-shaped (train aggregate + broadcast
          // scoring pass — growth should track the two scans); JL's
          // projection is scan-shaped too. Both gates fix |Q| at the
          // oracled 8 vec_ids (salted replicas get NEW ids), so the
          // |Q|·|C| pair term grows k×, not k² — the quadratic regime
          // (both sides growing) is margin_brute's row, not these
          "q_sq_topk", "q_jl_topk",
          // r10 web-ingest family: all pure projections (the HTML page is
          // synthesized per row, so the scan IS the work — growth should
          // be the scan's); RRF's BM25 side is scan-bound with a fixed
          // query-term set, its dense side fixes |Q| at one vector
          "q_html_text", "q_nfc_normalize", "q_script_stats",
          "q_encoding_stats", "q_rrf_hybrid", "q_web_pipeline",
          "q_c4_clean",
          // r10 G59: q_maxsim's query set (id % 20) grows WITH the corpus,
          // so this row is the |Q|·|C| quadratic regime (margin_brute's
          // law — the motivation for the stored-index shortlist
          // composition); maxsim_fixedq below isolates the linear term
          "q_maxsim",
          // r10 hybrid capstone: ONE query (id 0) against a growing corpus
          // — the BM25 term-stats scan and the pooled gather are the only
          // corpus-sized terms; fusion + the exact-MaxSim settle are
          // candidate-sized (≤ 10 fused ids) at every size
          "q_hybrid_rerank",
          // r10 G60: one scan + one shard-keyed exchange of fixed-width
          // (count, sum, xor) partials — growth should be the scan's
          "q_manifest",
          // r10 dialogue flagship: user-keyed windows end to end (the
          // salted replication grows the USER population, so per-user
          // session/window depth is constant) — growth should track the
          // event scan + the one user-keyed exchange
          "q_dialogue_pack",
          // r13: the recursive schema gate is a zero-exchange projection
          // (parse + native per-element walks) — growth must be the
          // events scan's, with no super-linear term from the walk; the
          // data card is one partial-agged groupBy(lang) over per-row
          // projections — growth should be the documents scan's
          "q_json_schema", "q_corpus_report"))
        time(q, dir) { SparkEntry.queries(q)(spark, dir) }
      time("neardup_composed", dir) { neardupComposed(spark, dir) }
      // G45/G46 decades: brute margin mining is O(|A|·|B|) BY DESIGN —
      // k× data = k²× pairs — measured as the motivation for the IVF
      // route, whose candidate volume grows ~k·(nprobe/nlist)·|corpus|;
      // k-center is k fixed scans (growth should track the scan alone)
      lazy val emb = Tables.load(spark, dir, "embeddings")
      lazy val mSrc = emb.filter(col("vec_id") % 2 === 0)
      lazy val mTgt = emb.filter(col("vec_id") % 2 === 1)
      time("margin_brute", dir) {
        graft.similarity.Mine.marginMine(mSrc, mTgt, "vec_id", "embedding",
          k = 4, tau = 1.01)
      }
      time("margin_ivf", dir) {
        graft.similarity.Mine.marginMineIvf(mSrc, mTgt, "vec_id", "embedding",
          k = 4, tau = 1.01, nlist = 64, nprobe = 8)
      }
      time("kcenter", dir) {
        graft.similarity.Clustering.kCenterGreedy(emb, "vec_id", "embedding",
          k = 16)
      }
      // G59 fixed-|Q| MaxSim: the 5 base-corpus query docs stay fixed while
      // the corpus replicates (salted replicas get NEW ids, so id % 20
      // replicas never join the query set here) — growth should track the
      // doc-gather scan + the |Q|-proportional score pass alone
      time("maxsim_fixedq", dir) {
        val toks = emb.select(expr("vec_id DIV 5").as("id"),
          expr("vec_id % 5").as("pos"), col("embedding"))
        graft.similarity.MaxSim.maxSimTopK(toks,
          toks.filter(col("id").isin(0L, 20L, 40L, 60L, 80L)),
          "id", "pos", "embedding", k = 3)
      }
      // r11 G59 at-scale composition (q_maxsim_ann_candidates' decade):
      // candidates from a stored token-vector index (G47), per-doc votes,
      // exact MaxSim settle. Index built once per dir UNTIMED (build
      // decades are r10.3's story); the probe runs nprobe=4/64 with the 5
      // fixed base query docs, so growth should track the probed-cell
      // fraction of the token scan — the escape from q_maxsim's |Q|·|C|
      // quadratic regime, measured
      if (want("maxsim_ann_cand")) {
        val idxDir = s"$work/mscand_idx"
        graft.similarity.Pq.writeIndex(emb, "vec_id", "embedding", dim = 64,
          m = 2, k = 4, dir = idxDir, nlist = 64, trained = true)
        time("maxsim_ann_cand", dir) {
          val toks = emb.select(expr("vec_id DIV 5").as("id"),
            expr("vec_id % 5").as("pos"), col("embedding"))
          val qTokVecs = emb.filter(
            expr("vec_id DIV 5").isin(0L, 20L, 40L, 60L, 80L))
          val hits = graft.similarity.Pq.probeIndex(qTokVecs, "vec_id",
            "embedding", idxDir, topK = 5, nprobe = 4)
          val cand = graft.similarity.MaxSim.voteCandidates(
            hits.select(expr("query_id DIV 5").as("query_id"),
              expr("neighbor_id DIV 5").as("neighbor_id")), topN = 8)
          graft.similarity.MaxSim.rerank(cand, toks,
            toks.filter(col("id").isin(0L, 20L, 40L, 60L, 80L)),
            "id", "pos", "embedding", k = 3)
        }
      }
      // r11 stop-term guard (G58): 200 queries each asking {dup, batch} —
      // 'dup' is genuinely rare (~5% df), 'batch' is stop-term-df (~76%).
      // Unguarded, every query's candidate set is corpus-sized (batch's
      // whole posting list lands in that query's rank-window partition —
      // the per-key skew the r10 verdict flagged); at maxDfPermille=500
      // the guard drops 'batch' off the stored terms/ table before its
      // buckets are listed. Index build untimed per dir (build cost is
      // the lexical family's r10 story).
      if (want("bm25many_stop_unguarded") || want("bm25many_stop_guarded")) {
        val idxDir = s"$work/lexidx"
        graft.similarity.Search.writeLexIndex(
          Tables.load(spark, dir, "documents"), "doc_id", "text", idxDir,
          buckets = 16)
        import spark.implicits._
        val qs = (0L until 200L).flatMap(q => Seq((q, "dup"), (q, "batch")))
          .toDF("qid", "term")
        time("bm25many_stop_unguarded", dir) {
          // explicit 1000: the library default is now the 990 guard, and
          // this row's whole point is the UNGUARDED r11 baseline
          graft.similarity.Search.bm25ManyFromIndex(spark, idxDir, qs,
            "qid", "term", k = 5, maxDfPermille = 1000)
        }
        time("bm25many_stop_guarded", dir) {
          graft.similarity.Search.bm25ManyFromIndex(spark, idxDir, qs,
            "qid", "term", k = 5, maxDfPermille = 500)
        }
      }
      // r12: the SHIPPED default (maxDfPermille = 990) across the decade.
      // 990 only cuts terms in >99% of documents (idf ≈ 0.01 — the truly
      // free cut; 'batch' at 76% df keeps real signal and survives the
      // default), so the corpus gets an omnipresent token appended to
      // every doc — the "the"-grade term every real crawl has. Queries
      // ask {dup, omni}: under the 1000 opt-out every query drags the
      // WHOLE omni posting list through its rank-window partition; the
      // default drops it off the stored terms/ table before its buckets
      // are listed and the row stays flat.
      if (want("bm25many_default_990") || want("bm25many_default_1000")) {
        val idxDir = s"$work/lexidx_omni"
        graft.similarity.Search.writeLexIndex(
          Tables.load(spark, dir, "documents")
            .withColumn("text", concat(col("text"), lit(" omni"))),
          "doc_id", "text", idxDir, buckets = 16)
        import spark.implicits._
        val qs = (0L until 200L).flatMap(q => Seq((q, "dup"), (q, "omni")))
          .toDF("qid", "term")
        time("bm25many_default_990", dir) {
          graft.similarity.Search.bm25ManyFromIndex(spark, idxDir, qs,
            "qid", "term", k = 5) // 990 IS the default
        }
        time("bm25many_default_1000", dir) {
          graft.similarity.Search.bm25ManyFromIndex(spark, idxDir, qs,
            "qid", "term", k = 5, maxDfPermille = 1000)
        }
      }
      // r12: what the trained-by-default coarse quantizer COSTS at build
      // time across the decade — the price of the flipped default. The
      // trainer is a bounded 8·nlist candidate collect + 2 Lloyd corpus
      // passes, so the increment should grow like two extra scans, not
      // quadratically. (writeIndex is Unit; timed directly, min of 2.)
      if (want("sq_index_build_untrained") || want("sq_index_build_trained")) {
        val emb = Tables.load(spark, dir, "embeddings")
        def build(name: String, trained: Boolean): Unit = if (want(name)) {
          val ts = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            graft.similarity.Sq.writeIndex(emb, "vec_id", "embedding",
              dim = 64, dir = s"$work/sqbuild_$trained", nlist = 64,
              trained = trained)
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[scalebench] $name dir=$dir min=${ts.min}%.2f s " +
            f"rows=0 runs=${ts.map(t => f"$t%.2f").mkString(",")}")
        }
        build("sq_index_build_untrained", trained = false)
        build("sq_index_build_trained", trained = true)
      }
      // r12: one lexical maintain GENERATION (lexIndexDelta + the
      // safe-order swap write-back) of a FIXED 500-doc delta against an
      // index that grows with the decade. The retire anti-join and the
      // terms re-aggregate scan the INDEX (fixed-width, text-free), so
      // the row should grow with index size but far below the corpus
      // tokenize a rebuild pays — the maintained-vs-rebuilt economics
      // measured rather than asserted. Index build untimed per dir.
      if (want("lex_maintain_gen")) {
        val idxDir = s"$work/lexidx_maint"
        val docs = Tables.load(spark, dir, "documents")
        graft.similarity.Search.writeLexIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", idxDir,
          buckets = 16)
        val admitted = docs.filter(col("doc_id") % 10 === 0).limit(500)
        // retire = removed ∪ changed (the snapshotDiff contract): the
        // admitted ids ride in the retire set so run 2 — which maintains
        // the ALREADY-maintained generation — replaces rather than
        // duplicates them
        val retired = docs.filter(
            col("doc_id") % 13 === 0 && col("doc_id") % 10 =!= 0)
          .select(col("doc_id").as("id")).limit(500)
          .unionByName(admitted.select(col("doc_id").as("id")))
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val (p, dl, st, tm) = graft.similarity.Search.lexIndexDelta(
            admitted, "doc_id", "text", idxDir, retired)
          graft.similarity.Search.writeLexDelta(idxDir, p, dl, st, tm)
          Caching.drain()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scalebench] lex_maintain_gen dir=$dir min=${ts.min}%.2f s " +
          f"rows=0 runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      // the comparison row: what a FROM-SCRATCH rebuild of the same
      // index costs at this decade (two corpus tokenize scans + writes)
      if (want("lex_rebuild")) {
        val docs = Tables.load(spark, dir, "documents")
        val ts = (1 to 2).map { i =>
          val t0 = System.nanoTime()
          graft.similarity.Search.writeLexIndex(
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
            s"$work/lexidx_rebuild_$i", buckets = 16)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scalebench] lex_rebuild dir=$dir min=${ts.min}%.2f s " +
          f"rows=0 runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      // r11 celebrity-key sessionization: one user holds 10% of the corpus
      // (the bot/power-user reality of dialogue data). sessionize's
      // per-key window puts that user's whole history through ONE task's
      // sort; the segmented two-phase form tags within (user, hour)
      // buckets and chains summary rows — same output (oracle-shared),
      // skew ceiling removed. Three rows: uniform baseline, celebrity
      // through the plain window, celebrity through the segmented form.
      if (want("sessionize_uniform") || want("sessionize_celeb_plain") ||
          want("sessionize_celeb_segmented")) {
        lazy val ev = Tables.events(spark, dir)
          .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"))
        lazy val celeb = ev.select(
          when(pmod(col("ts_us"), lit(10L)) < 1L, lit(-1L))
            .otherwise(col("user_id")).as("user_id"), col("ts_us"))
        time("sessionize_uniform", dir) {
          graft.operators.Ops.sessionize(ev, Seq("user_id"), "ts_us",
            gap = 600000000L)
        }
        time("sessionize_celeb_plain", dir) {
          graft.operators.Ops.sessionize(celeb, Seq("user_id"), "ts_us",
            gap = 600000000L)
        }
        time("sessionize_celeb_segmented", dir) {
          graft.operators.Ops.sessionizeSegmented(celeb, Seq("user_id"),
            "ts_us", gap = 600000000L, segment = 3600000000L)
        }
      }
      // the coreset regime (Sener & Savarese: k in the thousands) — the
      // r8 least(SqDistLit…) literal form was plan-explosive here (plan
      // size O(k·dim) per round, O(k²·dim) across the run); with the
      // MinDistToSet reference-object matrix the per-round plan is
      // constant-size and the run cost is k scans, nothing else
      time("kcenter256", dir) {
        graft.similarity.Clustering.kCenterGreedy(emb, "vec_id", "embedding",
          k = 256)
      }
      // one-ROUND isolation of the plan cost at 256 picked centers: the
      // same min-dist scan + TakeOrdered(1), native reference-object
      // matrix vs the r8 least(SqDistLit…) literal formulation (256
      // dim-length literals + 256 inlined distance expansions in ONE
      // projection — analysis + Janino time, not data time)
      if (want("kcenter256_round_native") || want("kcenter256_round_literal")) {
        import org.apache.spark.sql.graftglue.{ColumnBridge, MinDistToSet, QuantizeVec, SqDistLit}
        val centers = emb.orderBy(md5(col("vec_id").cast(StringType)), col("vec_id"))
          .limit(256).select("embedding").collect()
          .map(_.getSeq[Float](0).map(v => math.floor(v * 1048576.0)).toArray)
        val q = emb.select(col("vec_id").as("id"), ColumnBridge.column(
          QuantizeVec(ColumnBridge.expression(col("embedding")), 1048576.0)).as("qv"))
        time("kcenter256_round_native", dir) {
          q.withColumn("__mind", ColumnBridge.column(MinDistToSet(
              ColumnBridge.expression(col("qv")), centers)))
            .orderBy(col("__mind").desc, col("id").asc).limit(1)
        }
        time("kcenter256_round_literal", dir) {
          q.withColumn("__mind", least(centers.map(cv => ColumnBridge.column(
              SqDistLit(ColumnBridge.expression(col("qv")), cv))).toIndexedSeq: _*))
            .orderBy(col("__mind").desc, col("id").asc).limit(1)
        }
      }
      // r9.2 isolation: the SAME plan-cost trap at the OTHER two
      // assignment sites — k-means/SemDeDup cluster assignment
      // (withCluster) and the ADC query-side distance tables — at a
      // production codebook size (k=256), native reference-object form
      // vs the r8 literal formulation reconstructed inline
      if (want("kmeans256_assign_native") || want("kmeans256_assign_literal")) {
        import org.apache.spark.sql.graftglue.{ColumnBridge, QuantizeVec, SqDistLit}
        val cents = Seq.tabulate(256)(i =>
          (i, Array.tabulate(64)(j => ((i * 64 + j) % 97).toDouble)))
        time("kmeans256_assign_native", dir) {
          graft.similarity.Clustering.withCluster(
            emb.select(col("vec_id"), col("embedding")), "embedding", cents)
        }
        time("kmeans256_assign_literal", dir) {
          val qv = ColumnBridge.column(QuantizeVec(
            ColumnBridge.expression(col("embedding")), 1048576.0))
          emb.select(col("vec_id"), qv.as("qv"))
            .withColumn("__best", array_min(array(cents.map { case (cid, cv) =>
              struct(ColumnBridge.column(SqDistLit(
                ColumnBridge.expression(col("qv")), cv)).as("dist2"),
                lit(cid).as("cid"))
            }.toIndexedSeq: _*)))
            .select(col("vec_id"), col("__best.cid").as("cluster"),
              col("__best.dist2").as("dist2"))
        }
      }
      if (want("adc256_native") || want("adc256_literal")) {
        import org.apache.spark.sql.graftglue.{ColumnBridge, QuantizeVec, SqDistLit}
        // fabricated m=8, k=256 codebooks (plan cost, not Lloyd): the
        // production PQ regime — 2048 dim-8 literal expansions in the r8
        // query-side projection
        val cbs = Seq.tabulate(8)(j => Seq.tabulate(256)(i =>
          (i, Array.tabulate(8)(x => ((j * 2048 + i * 8 + x) % 89).toDouble))))
        val qs = emb.filter(col("vec_id") % 50 === 0)
        time("adc256_native", dir) {
          graft.similarity.Pq.adcTopK(qs, emb, "vec_id", "embedding", cbs, 4)
        }
        time("adc256_literal", dir) {
          // the r8 withDistTables + the same ADC sum/top-k tail
          val q0 = qs.select(col("vec_id").as("query_id"),
            ColumnBridge.column(QuantizeVec(
              ColumnBridge.expression(col("embedding")), 1048576.0)).as("__qv"))
          val q = cbs.zipWithIndex.foldLeft(q0) { case (acc, (cbRaw, j)) =>
            val cb = cbRaw.sortBy(_._1)
            val subv = slice(col("__qv"), j * 8 + 1, 8)
            acc.withColumn(s"__dt$j",
              map_from_arrays(typedLit(cb.map(_._1)),
                array(cb.map { case (_, cv) => ColumnBridge.column(
                  SqDistLit(ColumnBridge.expression(subv), cv)) }: _*)))
          }
          val codes = graft.similarity.Pq.encode(emb, "vec_id", "embedding", cbs)
          val scored = codes.crossJoin(broadcast(q.drop("__qv")))
            .filter(col("query_id") =!= col("id"))
            .select(col("query_id"), col("id").as("neighbor_id"),
              (0 until 8).map(j => element_at(col(s"__dt$j"),
                element_at(col("codes"), j + 1))).reduce(_ + _).as("adc2"))
          graft.similarity.Ann.topKTail(scored, 4, scoreCol = "adc2",
            ascending = true)
        }
      }
    }

    // Incremental vs full re-dedup: 90% of the corpus is indexed once
    // (amortized cost), a 10% delta then probes the STORED index — the
    // recurring cost — vs re-running the full near-dup pipeline over
    // corpus ∪ delta, which is what a non-incremental stack pays per batch.
    for (dir <- Seq(base, big)
         if want("neardup_incremental_probe") || want("neardup_full_rededup")) {
      val docs = Tables.load(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val delta = docs.filter(col("doc_id") % 10 === 0)
      val idxDir = s"$work/index_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val t0 = System.nanoTime()
      Dedup.bandKeysOf(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(idxDir)
      println(f"[scalebench] neardup_index_build dir=$dir " +
        f"min=${(System.nanoTime() - t0) / 1e9}%.2f s (one-time, amortized)")
      val index = spark.read.parquet(idxDir)
      time("neardup_incremental_probe", dir) {
        Dedup.incrementalNearDup(delta, "doc_id", "text", index)
      }
      // the at-scale posture: AQE's broadcast threshold OFF, so nothing is
      // broadcast except the probe's explicit broadcast(delta-keys) hints —
      // a 100 TB index is past any threshold, so THIS is the plan a real
      // cluster runs (PlanSpec pins its shape; this measures its cost)
      if (want("neardup_incremental_probe_nobc")) {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try time("neardup_incremental_probe_nobc", dir) {
          Dedup.incrementalNearDup(delta, "doc_id", "text", index)
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
      time("neardup_full_rededup", dir) {
        Dedup.keepCanonical(corpus.unionByName(delta), "doc_id", "text",
          maxBucket = 256, metricName = "scale_full_rededup")
      }
    }

    // Persistent-IVFPQ probe: the vector twin of the stored-index probes.
    // The 90% corpus indexes once (model + cell-partitioned codes,
    // amortized); a 1% query batch probes it at nprobe = 8 vs nprobe = 1 —
    // the delta between those two is the partition-pruning term (fewer
    // code files LISTED and READ, not just fewer rows scored).
    for (dir <- Seq(base, big) if want("ann_index_probe")) {
      val emb = Tables.load(spark, dir, "embeddings")
      val idxDir = s"$work/pqidx_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val t0 = System.nanoTime()
      graft.similarity.Pq.writeIndex(emb.filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", dim = 64, m = 2, k = 4, dir = idxDir, nlist = 64)
      println(f"[scalebench] ann_index_build dir=$dir " +
        f"min=${(System.nanoTime() - t0) / 1e9}%.2f s (one-time, amortized)")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      time("ann_index_probe_np8", dir) {
        graft.similarity.Pq.probeIndex(queries, "vec_id", "embedding",
          idxDir, topK = 4, nprobe = 8)
      }
      time("ann_index_probe_np1", dir) {
        graft.similarity.Pq.probeIndex(queries, "vec_id", "embedding",
          idxDir, topK = 4, nprobe = 1)
      }
    }

    // Persistent-MaxSim probe: the late-interaction twin. The 90% corpus
    // gathers + indexes once (the operator's corpus-sized exchange,
    // amortized); a 1% query batch probes at nprobe = 8 vs nprobe = 1 —
    // the delta is the matrix-partition pruning term (fewer matrix files
    // LISTED and READ before any pooled-dot or interaction work).
    for (dir <- Seq(base, big) if want("maxsim_index_probe")) {
      val emb = Tables.load(spark, dir, "embeddings")
      val toks = emb.select(expr("vec_id DIV 5").as("id"),
        expr("vec_id % 5").as("pos"), col("embedding"))
      val idxDir = s"$work/msidx_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val t0 = System.nanoTime()
      graft.similarity.MaxSim.writeIndex(toks.filter(col("id") % 10 =!= 0),
        "id", "pos", "embedding", idxDir, nlist = 64)
      println(f"[scalebench] maxsim_index_build dir=$dir " +
        f"min=${(System.nanoTime() - t0) / 1e9}%.2f s (one-time, amortized)")
      val queries = toks.filter(col("id") % 100 === 0)
      time("maxsim_index_probe_np8", dir) {
        graft.similarity.MaxSim.probeIndex(queries, "id", "pos", "embedding",
          idxDir, k = 3, nprobe = 8, mShort = 8)
      }
      time("maxsim_index_probe_np1", dir) {
        graft.similarity.MaxSim.probeIndex(queries, "id", "pos", "embedding",
          idxDir, k = 3, nprobe = 1, mShort = 8)
      }
    }

    // Winnow-probe twin of the incremental experiment: 90% of the corpus's
    // prints index once (amortized), the 10% delta probes the STORED
    // index — flat growth here is the substring-contamination analog of
    // neardup_incremental_probe's O(delta) claim.
    for (dir <- Seq(base, big) if want("winnow_probe")) {
      val docs = Tables.load(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val delta = docs.filter(col("doc_id") % 10 === 0)
      val idxDir = s"$work/wprints_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val t0 = System.nanoTime()
      Dedup.winnowedPrints(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(idxDir)
      println(f"[scalebench] winnow_index_build dir=$dir " +
        f"min=${(System.nanoTime() - t0) / 1e9}%.2f s (one-time, amortized)")
      val index = spark.read.parquet(idxDir)
      time("winnow_probe", dir) {
        Dedup.winnowProbe(delta, "doc_id", "text", index)
      }
      if (want("winnow_probe_nobc")) {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try time("winnow_probe_nobc", dir) {
          Dedup.winnowProbe(delta, "doc_id", "text", index)
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    }

    // The ONLINE loop: drain the same 10% delta as a 5-batch file stream
    // through indexMaintainStream against the stored 90% index — the
    // recurring cost of the streaming crawl posture, directly comparable
    // to neardup_incremental_probe (same probe, plus per-batch within-batch
    // collapse + verdict/append writes + micro-batch bookkeeping).
    for (dir <- Seq(base, big) if want("idxmaintain_stream")) {
      // 5th arg = batch count (default 5): the 30×+ decades drive MANY
      // batches so the append-only index tree gets deep and the per-batch
      // recursive-listing cost becomes visible in the batch durations
      val nBatches = args.lift(4).map(_.toInt).getOrElse(5)
      val docs = Tables.load(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
      val delta = docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text")
      val root = s"$work/idxm_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_${System.nanoTime()}"
      val idxDir = s"$root/index"; val inDir = s"$root/in"
      Dedup.bandKeysOf(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(idxDir)
      delta.repartition(nBatches).write.mode("overwrite").parquet(inDir)
      val n = delta.count()
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.indexMaintainStream(
        graft.streaming.Streams.watchDirectory(spark, inDir,
          format = "parquet", schemaDdl = Some("doc_id BIGINT, text STRING"),
          maxFilesPerTrigger = 1),
        "doc_id", "text", idxDir, s"$root/verdicts", s"$root/ckpt")
      q.awaitTermination()
      val drain = (System.nanoTime() - t0) / 1e9
      val admitted = spark.read.parquet(s"$root/verdicts/batch_*")
        .filter(col("admitted")).count()
      // per-batch triggerExecution durations, first→last: growth across
      // this series IS the deepening-tree cost (probe work is flat by
      // construction — every batch is the same ~1/nBatches delta slice)
      val durs = q.recentProgress.toSeq
        .sortBy(_.batchId).map(p => p.durationMs.get("triggerExecution"))
      println(f"[scalebench] idxmaintain_stream dir=$dir drain=$drain%.2f s " +
        f"($nBatches batches, $n docs, $admitted admitted) " +
        s"batch_ms=${durs.mkString(",")}")
      // compaction: flatten the bootstrap + per-batch tree back to one
      // generation, then re-measure the listing+scan a reader (or the next
      // batch's probe) pays — the cadence evidence for plans/SCALE.md
      def listScan(): Double = {
        val t = System.nanoTime()
        spark.read.option("recursiveFileLookup", "true").parquet(idxDir).count()
        (System.nanoTime() - t) / 1e9
      }
      val preFiles = {
        val fs = new org.apache.hadoop.fs.Path(idxDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(idxDir), true)
        var c = 0; while (it.hasNext) { it.next(); c += 1 }; c
      }
      val pre = listScan()
      val tc = System.nanoTime()
      graft.streaming.Streams.compactIndex(spark, idxDir)
      val compactS = (System.nanoTime() - tc) / 1e9
      println(f"[scalebench] idxmaintain_compact dir=$dir files_pre=$preFiles " +
        f"scan_pre=$pre%.2f s compact=$compactS%.2f s scan_post=${listScan()}%.2f s")
    }
    // Listing-cost isolation: the per-batch numbers above are dominated by
    // micro-batch fixed cost, so the recursive-listing term (driver work
    // that grows with batch-dir count until compaction) is measured
    // directly — synthesize an index tree with B batch subdirs and time a
    // probe-shaped read at each depth, then after compaction.
    if (want("index_tree_listing")) {
      val docs = Tables.load(spark, base, "documents")
      val keys = Dedup.bandKeysOf(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text").coalesce(1)
      val root = s"$work/deeptree_${System.nanoTime()}"
      var written = 0
      for (b <- Seq(25, 100, 400)) {
        while (written < b) {
          keys.write.mode("overwrite").parquet(s"$root/idx/batch_$written")
          written += 1
        }
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          spark.read.option("recursiveFileLookup", "true")
            .parquet(s"$root/idx").count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scalebench] index_tree_listing batches=$b " +
          f"scan_min=${times.min}%.2f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
      val t0 = System.nanoTime()
      graft.streaming.Streams.compactIndex(spark, s"$root/idx")
      val compactS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      spark.read.option("recursiveFileLookup", "true").parquet(s"$root/idx").count()
      println(f"[scalebench] index_tree_listing compacted compact=$compactS%.2f s " +
        f"scan=${(System.nanoTime() - t1) / 1e9}%.2f s")
    }

    // r14 (verdict task 4): the LARGE-STATE state-store crossover. The
    // RocksDB provider is documented as the large-state default
    // ([[GraftSession.RocksDbProvider]]) because the HDFS-backed default
    // keeps EVERY key's state on the executor heap (×2: it retains the
    // last maxVersionsToRetainInMemory=2 version maps) — r13 proved
    // correctness under RocksDB; this measures the claim that motivates
    // the knob. One stateful twin ([[graft.streaming.Streams
    // .keepBestStream]] — the G1 keep-best state, the same
    // mapGroupsWithState shape as G42/G44) drained over a key domain
    // scaled across the ×100 decade under BOTH providers, recording
    // drain wall, state rows, and the provider's own memory metric.
    // The interesting row is where the default's heap-resident state
    // stops being free: plans/SCALE.md r14 records the crossover.
    if (want("statestore")) {
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val provPrev = spark.conf.getOption(provKey)
      val keyScales = sys.env.get("SPARK_GRAFT_STATE_KEYS")
        .map(_.split(",").map(_.trim.toLong).toSeq)
        .getOrElse(Seq(100000L, 1000000L, 10000000L, 30000000L))
      for (keys <- keyScales) {
        val root = s"$work/state_k$keys"
        val inDir = s"$root/in"
        // 5 batch files; ~1.2 rows per key (20% of keys updated by a
        // second row) so the state path exercises updates, not just
        // inserts; 48-char keys ≈ a fingerprint/print-key's footprint
        spark.range(keys * 12 / 10)
          .select(
            concat(lit("key-"), format_string("%012d", col("id") % keys),
              lit("-" + "x" * 27)).as("k"),
            col("id").as("id"),
            (col("id") % 997).cast("double").as("score"))
          .repartition(5).write.mode("overwrite").parquet(inDir)
        val providers = sys.env.get("SPARK_GRAFT_STATE_PROVIDERS")
          .map(_.split(",").map(_.trim).toSeq)
          .getOrElse(Seq("default", "rocksdb"))
        for (provider <- providers) {
          // the 'default' arm must UNSET the conf, not restore provPrev:
          // under SPARK_GRAFT_STATESTORE=rocksdb the session's previous
          // value IS RocksDB, and restoring it would silently measure
          // RocksDB in both arms while labeling one "default".
          if (provider == "rocksdb")
            spark.conf.set(provKey, GraftSession.RocksDbProvider)
          else spark.conf.unset(provKey)
          val ckpt = s"$root/ckpt_$provider"
          val res = try {
            import spark.implicits._
            val stream = graft.streaming.Streams.watchDirectory(spark, inDir,
              format = "parquet",
              schemaDdl = Some("k STRING, id BIGINT, score DOUBLE"),
              maxFilesPerTrigger = 1)
            val out = graft.streaming.Streams.keepBestStream(
              stream.as[(String, Long, Double)])
            val t0 = System.nanoTime()
            val q = out.writeStream.outputMode("update").format("noop")
              .option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
            val wall = (System.nanoTime() - t0) / 1e9
            val so = q.recentProgress.flatMap(_.stateOperators).lastOption
            val rows = so.map(_.numRowsTotal).getOrElse(-1L)
            val mem = so.map(_.memoryUsedBytes).getOrElse(-1L)
            f"drain=$wall%.2f s state_rows=$rows mem_bytes=$mem"
          } catch { case e: Throwable =>
            s"FAILED ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(120)
          }
          println(s"[scalebench] statestore keys=$keys provider=$provider $res")
        }
      }
      provPrev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }

    // r15: JSON-Schema gate WIDTH decade — real log/event schemas carry
    // hundreds of properties, and the gate compiles one typed check
    // column per distinct path plus the concat_ws over every fragment:
    // the question is whether the per-row wall stays linear in the check
    // count or hits a codegen/plan-size cliff (generated-method limits,
    // constant-pool pressure). One flat object schema per width, every
    // property typed+bounded (2 checks each), messages synthesized to
    // match with a 1-in-7 violation mix.
    if (want("gate_width")) {
      import org.apache.spark.sql.functions.{col => fcol}
      for (width <- Seq(25, 100, 400, 800)) {
        val props = (0 until width).map(i =>
          s""""f$i": {"type": "integer", "minimum": 0}""").mkString(", ")
        val schema =
          s"""{"type": "object", "required": ["f0"], "properties": {$props}}"""
        val msg = (0 until width).map(i => s""""f$i": ${i % 97}""").mkString(", ")
        val rows = spark.range(200000).select(
          fcol("id"),
          org.apache.spark.sql.functions.when(fcol("id") % 7 === 0,
            s"""{"f1": -5, $msg}""").otherwise(s"""{$msg}""").as("raw"))
        val t0 = System.nanoTime()
        val out = graft.schema.JsonSchemaGate.validate(rows, "raw", schema,
          parsedCol = None)
        out.queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[scalebench] gate_width width=$width wall=$wall%.2f s")
      }
    }

    // r15: ChainedReplace memoization — SEGMENTATION-only wall over the
    // replicated documents corpus (training excluded: the q_bpe_segment
    // bench row is dominated by its in-query train rounds, so the memo's
    // effect is invisible there). Two merge-table sizes: the fixture's
    // 544 learned merges, and the same table padded to ~8.7k steps with
    // never-matching pairs — the honest simulation of a production
    // tokenizer's table, where each memo MISS pays a full O(steps ×
    // length) scan while a hit stays O(length). Corpus tokens repeat
    // with Zipf frequency, so the memo converts per-occurrence cost to
    // per-distinct-token cost per executor thread.
    if (want("bpe_memo")) {
      import org.apache.spark.sql.graftglue.ChainedReplace
      val docs = spark.read.parquet(s"$big/documents.parquet")
      val merges = graft.functions.Bpe.train(
          Tables.load(spark, base, "customer"), "c_name",
          nMerges = 544, mergesPerRound = 32, maxRounds = 17)._1
        .select("l", "r").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      def pad(n: Int) =
        merges ++ (0 until n).map(i => (s"zq${i}x", s"zr${i}x"))
      def run(label: String, ms: Seq[(String, String)], memo: Int,
              frame: org.apache.spark.sql.DataFrame = docs): Unit = {
        val (h0, m0) =
          (ChainedReplace.memoHits.sum, ChainedReplace.memoMisses.sum)
        val t0 = System.nanoTime()
        graft.functions.Bpe.segment(frame, "doc_id", "text", ms,
            memoSize = memo)
          .queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val (h, m) = (ChainedReplace.memoHits.sum - h0,
          ChainedReplace.memoMisses.sum - m0)
        val rate = if (h + m == 0) "n/a"
          else f"${h.toDouble / (h + m)}%.4f"
        println(f"[scalebench] bpe_memo $label steps=${ms.size} " +
          f"wall=$wall%.2f s hits=$h misses=$m hit_rate=$rate")
      }
      run("m544_off", merges, 0)
      run("m544_on", merges, 1 << 15)
      run("m8736_off", pad(8192), 0)
      run("m8736_on", pad(8192), 1 << 15)
      // r16 decade: production-size merge tables (5×10⁴ and 10⁵ steps) —
      // memo ON only: the off arm is established linear (127 s at 8.6k
      // steps ⇒ ~12/25 min here), the claim under test is that the ON
      // wall stays near-flat because per-occurrence cost became
      // per-distinct-token cost
      run("m50k_on", pad(49456), 1 << 15)
      run("m100k_on", pad(99456), 1 << 15)
      // r16 Zipf-tail LRU pressure: distinct tokens ≫ memoSize (32k) —
      // 80% of 1.6M one-token docs draw from 1k hot tokens (hits), 20%
      // are doc-unique (every one a miss + an eviction). Validates the
      // BOUND: memory stays capped and the wall degrades to the miss
      // fraction's linear cost instead of collapsing
      val zipf = spark.range(1600000).select(
        org.apache.spark.sql.functions.col("id").as("doc_id"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.lit(5)) < 4,
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("tok"),
            org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.hash(
                org.apache.spark.sql.functions.col("id")),
              org.apache.spark.sql.functions.lit(1000))))
          .otherwise(org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("rare"),
            org.apache.spark.sql.functions.col("id"))).as("text"))
      run("zipf_tail_on", pad(8192), 1 << 15, zipf)
      run("zipf_tail_off", pad(8192), 0, zipf)
    }
    spark.stop()
  }
}
