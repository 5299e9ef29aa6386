package graft

import org.apache.spark.sql.DataFrame

/** Cache hygiene as API, not doc (round-8 VERDICT item 7): several
  * operators persist intermediates that their RETURNED plan reads lazily
  * (Lm's per-doc tf frames, Search's posting lists, the Jaccard shingle
  * frames, MtlParser's shared input) — so they cannot unpersist before
  * returning, and a long-lived session accumulates MEMORY_AND_DISK blocks.
  *
  * Operators register those persists here via [[tracked]]; callers scope a
  * query with [[withCached]] (or call [[drain]] after materializing) and
  * the intermediates are dropped — `spark.sharedState.cacheManager` goes
  * back to empty, pinned by OpsSpec. Verify and Bench drain between
  * queries, so no oracled query leaks cache into the next.
  *
  * Draining BEFORE the results materialize is safe (plans recompute from
  * source) but wastes the cache — scope the materialization, not the plan
  * construction.
  */
object Caching {

  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist MEMORY_AND_DISK and register for the next [[drain]]. Internal:
    * operators wrap intermediates whose cache must outlive the call but not
    * the query.
    */
  private[graft] def tracked(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pending.add(p)
    p
  }

  /** Unpersist every tracked intermediate (non-blocking). */
  def drain(): Unit = {
    var d = pending.poll()
    while (d != null) { d.unpersist(false); d = pending.poll() }
  }

  /** Using-style scope: build AND materialize inside; tracked intermediates
    * are dropped on exit, exceptional or not.
    */
  def withCached[A](body: => A): A = try body finally drain()

  /** `.trackedPersist()` chain syntax for operator internals. */
  private[graft] implicit final class TrackedSyntax(private val df: DataFrame)
      extends AnyVal {
    def trackedPersist(): DataFrame = Caching.tracked(df)
  }
}
