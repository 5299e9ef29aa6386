package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Checkpoints.PinSyntax

/** Byte-pair-encoding tokenizer training over a corpus (the
  * tokenizer-prep companion to [[graft.similarity.Search.vocabulary]];
  * reference analog: the corpus-statistics nodes around
  * `node_classes/table_nodes.py:46`, extended to the merge-table training
  * a pretraining pipeline runs before tokenizing 100 TB).
  *
  * Scale shape: the corpus is scanned ONCE to build the distinct-word
  * count table; every training round after that touches only that
  * vocab-sized table (this is how production BPE trainers scale — merge
  * statistics are a function of the weighted vocabulary, not the corpus).
  * Per round: one vocab-sized aggregate + a one-row argmax fetch; the
  * merge is then applied as a `replace` projection. [[segment]] applies a
  * trained merge list to a corpus as ONE native
  * [[org.apache.spark.sql.graftglue.ChainedReplace]] projection — zero
  * shuffles, and the projection stays inside whole-stage codegen at any
  * merge count (a folded `replace` chain drops out of codegen at a few
  * hundred merges and goes interpreted — measured on q_bpe_segment).
  *
  * Symbol representation: a word's current segmentation is stored as a
  * padded string — ONE space at each end, TWO spaces between symbols
  * (`"low"` → `" l  o  w "`). Merging pair (l, r) is then the literal
  * replacement `" l  r "` → `" lr "`: the pattern consumes one boundary
  * space on each side, so adjacent occurrences keep their own boundary
  * and plain left-to-right non-overlapping `replace` — identical
  * semantics in Java and DuckDB — implements exactly BPE's merge order.
  * No regex, no UDF, and the oracle can replay training round for round.
  *
  * Caveat: symbols are UTF-16 code units on the Spark side and code
  * points in DuckDB — identical for BMP text (all Latin + CJK); feed
  * pre-filtered text if the corpus carries astral-plane glyphs.
  */
object Bpe {

  /** Distinct-word weighted counts: (word, cnt). The one corpus scan. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: every word split to single characters in the
    * padded representation (see object doc). One `regexp_replace` — each
    * char becomes " c ", so adjacent chars meet at the double space and the
    * ends carry the single boundary pad ("low" → " l  o  w ") — rather
    * than a split("")+filter HOF: the lambda is CodegenFallback and was
    * the expression keeping the whole segmentation projection OUT of
    * whole-stage codegen. (?s) so a stray control char is still a symbol;
    * astral glyphs: "." takes the code POINT where split("") took UTF-16
    * units — both out of contract per the object doc's BMP caveat.
    */
  private def symbolize(word: Column): Column =
    regexp_replace(word, "(?s)(.)", " $1 ")

  /** Weighted adjacent-pair counts over a (syms, cnt) vocabulary:
    * (left, right, n). Vocab-sized work.
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(trim(col("syms")), "  ")
    vocab
      .select(col("cnt"), syms.as("__s"))
      .select(col("cnt"), col("__s"), posexplode(slice(col("__s"), lit(1),
        greatest(size(col("__s")) - 1, lit(0)))))
      .select(col("cnt"), col("col").as("left"),
        expr("element_at(__s, pos + 2)").as("right"))
      .groupBy("left", "right").agg(sum(col("cnt")).as("n"))
  }

  /** Train `nMerges` BPE merges on the corpus. Returns the merge table
    * (rank, left, right, merged, n) in training order; ties in pair
    * frequency break by (left, right) ascending so training is fully
    * deterministic. If the vocabulary runs out of pairs early the table
    * is short. The returned vocabulary holds the final segmentation.
    *
    * `mergesPerRound` (R) batches the driver round-trips: each JOB round
    * computes pair counts once and applies the top R pairwise
    * SYMBOL-DISJOINT pairs from that one snapshot, selected greedily down
    * the (n DESC, left, right) order — a pair is skipped while a
    * higher-ranked selection of the same round already uses either of its
    * symbols. Disjointness makes the R replaces commute and leaves each
    * selected pair's count unaffected by the others, so the batch is
    * well-defined from one snapshot and an external engine can replay it
    * exactly. R=1 IS classic sequential BPE; R>1 is the batched variant
    * production trainers use (a 50k-merge run at R=1 means 50k scheduler
    * round-trips — hours of driver overhead on a cluster; at R=64 it is
    * ~800 vocab-sized jobs). The variants can diverge after the first
    * round (sequential BPE may rank a freshly-created pair above a
    * later-batched one), which is why R is explicit, not a silent default.
    *
    * `maxRounds` bounds the JOB rounds instead of the merge count: with
    * `nMerges >= maxRounds * mergesPerRound` every round wants the full R
    * and takes whatever symbol-disjoint pairs the snapshot offers, so the
    * run's shape is "Q vocab-sized jobs", data-independent — the form an
    * external replay (the q_bpe oracle) can unroll exactly even when
    * early rounds come up short of R (symbol diversity, not the cap,
    * limits a round's take).
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            mergesPerRound: Int = 1,
            maxRounds: Int = Int.MaxValue): (DataFrame, DataFrame) = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(mergesPerRound > 0,
      s"mergesPerRound must be positive, got $mergesPerRound")
    require(maxRounds > 0, s"maxRounds must be positive, got $maxRounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // vocab is small by construction (distinct words); keep it hot and cut
    // lineage once so the training rounds replay an in-memory table, not
    // the corpus scan.
    var vocab = wordCounts(docs, textCol)
      .select(col("word"), col("cnt"), symbolize(col("word")).as("syms"))
      .pinned()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    var round = 0
    while (merges.size < nMerges && round < maxRounds && !exhausted) {
      round += 1
      val want = math.min(mergesPerRound, nMerges - merges.size)
      // One vocab-sized job per ROUND: collect a prefix of the sorted pair
      // table and select greedily; the prefix grows (rare) if overlaps ate
      // it before `want` disjoint pairs were found while more rows existed.
      var prefix = math.max(64, want * 8)
      var selected: Seq[(String, String, Long)] = Nil
      var complete = false
      while (!complete) {
        val top = pairCounts(vocab)
          .orderBy(col("n").desc, col("left"), col("right"))
          .limit(prefix).as[(String, String, Long)].collect()
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = top.iterator
        while (sel.size < want && it.hasNext) {
          val (l, r, n) = it.next()
          if (!used(l) && !used(r)) { sel += ((l, r, n)); used += l; used += r }
        }
        if (sel.size == want || top.length < prefix) {
          selected = sel.toSeq
          complete = true
          if (top.isEmpty) exhausted = true
        } else prefix *= 4
      }
      if (selected.nonEmpty) {
        selected.foreach { case (l, r, n) =>
          merges += ((merges.size + 1L, l, r, l + r, n))
        }
        // disjoint ⇒ the replaces commute; applied in selection order to
        // match the rank order segment() replays — as ONE ChainedReplace
        // (segment()'s codegen shape) instead of an R-deep fold
        vocab = vocab.withColumn("syms",
            org.apache.spark.sql.graftglue.ColumnBridge.column(
              org.apache.spark.sql.graftglue.ChainedReplace(
                org.apache.spark.sql.graftglue.ColumnBridge.expression(col("syms")),
                selected.map { case (l, r, _) => (s" $l  $r ", s" ${l}${r} ") })))
          .pinned()
      } else exhausted = true
    }
    (merges.toSeq.toDF("rank", "l", "r", "merged", "n"), vocab)
  }

  /** Apply an ordered merge list to a corpus of documents: each token is
    * segmented by replaying the merges. Pure projection — a chain of
    * literal `replace`s per merge, fully codegen, zero shuffles. Output:
    * input columns + `syms` (array of subword symbols per token) exploded
    * as (id, token, syms, n_syms).
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
              merges: Seq[(String, String)],
              memoSize: Int = 1 << 15): DataFrame = {
    import org.apache.spark.sql.graftglue.{ChainedReplace, ColumnBridge}
    val tok = docs.select(col(idCol).as("id"),
      explode(Text.tokens(col(textCol))).as("token"))
    // ONE native expression for the whole merge list, not a fold of
    // `replace` — a production merge table is 10⁴-10⁵ steps and the folded
    // tree falls out of whole-stage codegen at a few hundred (the Project
    // loses its codegen star and every token pays interpreted dispatch per
    // merge); same values, ChainedReplace scaladoc has the measurement.
    // memoSize (r15): corpus tokens repeat with Zipf frequency — a
    // distinct symbolized token pays the O(merges × length) replay once
    // per executor thread, every repeat is a thread-local hash hit; at a
    // production merge-table size the per-miss cost grows with the
    // tokenizer while the hit stays O(length)
    val seg = ColumnBridge.column(ChainedReplace(
      ColumnBridge.expression(symbolize(col("token"))),
      merges.map { case (l, r) => (s" $l  $r ", s" ${l}${r} ") },
      memoSize = memoSize))
    tok.withColumn("syms", split(trim(seg), "  "))
      .withColumn("n_syms", size(col("syms")).cast(LongType))
  }
}
