package graft

/** Cache hygiene as a contract (round-8 VERDICT item 7): every operator
  * that persists intermediates registers them with [[Caching]], so a
  * `withCached` scope leaves the session's cache manager EMPTY once the
  * query materializes — no MEMORY_AND_DISK accumulation in long-lived
  * sessions. The queries below are exactly the persist-carrying ones
  * (Lm's tf frames, Search's posting lists, the Jaccard shingle frames,
  * MtlParser's shared input, Pipeline's fan-out stages).
  */
class CachingSpec extends SparkSpec {

  private val persistingQueries = Seq(
    "q_lm_xent", "q_lm_xent_bigram", "q_dsir", "q_tfidf", "q_inverted_index",
    "q_jaccard_pruned", "q_jaccard_prefix", "q_coreference", "q_pipeline")

  test("withCached leaves the cache manager empty after each persisting query") {
    spark.catalog.clearCache() // baseline: other suites' leftovers are not ours
    persistingQueries.foreach { name =>
      Caching.withCached {
        SparkEntry.queries(name)(spark, sfDir).count()
      }
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left persisted frames behind after withCached")
    }
  }

  test("drain is safe when nothing is tracked, and before materialization") {
    Caching.drain() // empty registry: no-op
    // draining BEFORE the action: the plan must still compute (recompute
    // from source, no dangling reference to the dropped cache)
    val df = graft.functions.Lm.unigramCrossEntropy(
      graft.sources.Tables.load(spark, sfDir, "documents"), "doc_id", "text")
    Caching.drain()
    assert(df.count() > 0)
    Caching.drain()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
