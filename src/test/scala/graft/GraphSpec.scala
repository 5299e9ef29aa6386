package graft

import org.apache.spark.sql.functions._

import graft.graph.Graph
import graft.similarity.Search

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a -> b -> c, a -> c : c should out-rank b, b out-rank a (no in-links)
  private def chain = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    .toDF("src_id", "dst_id")

  test("pageRank: integer ranks, sink highest, source at teleport base") {
    val r = Graph.pageRank(chain, iters = 3).as[(String, Long)].collect().toMap
    assert(r.keySet == Set("a", "b", "c"))
    // a has no in-edges: rank = teleport base exactly
    assert(r("a") == 150000L)
    assert(r("c") > r("b") && r("b") > r("a"))
  }

  test("pageRank: iteration arithmetic is exact (hand-computed round)") {
    // single edge a -> b, 1 iter: b = 150000 + (85 * (1000000 div 1)) div 100
    val r = Graph.pageRank(Seq(("a", "b")).toDF("src_id", "dst_id"), iters = 1)
      .as[(String, Long)].collect().toMap
    assert(r("b") == 150000L + (85L * 1000000L) / 100L)
    assert(r("a") == 150000L)
  }

  test("pageRank danglingRedistribute: hand-computed round, mass no " +
       "longer decays, default untouched") {
    // single edge a -> b, 1 iter, redistribute: b is dangling with rank
    // 1e6; N = 2, share = 500000 — a gains (85·500000) div 100 on top of
    // teleport, b gains its in-contribution plus the same share
    val r = Graph.pageRank(Seq(("a", "b")).toDF("src_id", "dst_id"),
        iters = 1, danglingRedistribute = true)
      .as[(String, Long)].collect().toMap
    assert(r("a") == 150000L + (85L * 500000L) / 100L)
    assert(r("b") == 150000L + (85L * (1000000L + 500000L)) / 100L)
    // on the sink-bearing chain, redistribution conserves mass up to the
    // deterministic floor losses: total stays within N·(div remainders)
    // of N·1e6, where the dropped default visibly decays
    val n = 3L
    val tot = Graph.pageRank(chain, iters = 4, danglingRedistribute = true)
      .agg(sum("rank")).as[Long].head()
    val totDropped = Graph.pageRank(chain, iters = 4)
      .agg(sum("rank")).as[Long].head()
    assert(tot > totDropped, "redistribution did not add the sink mass back")
    // floor losses are a handful of UNITS per iteration (div od + div 100
    // + div N), not the ~10^5-unit decay the dropped default shows
    assert(n * 1000000L - tot < 100L,
      s"mass decayed beyond floor losses: $tot")
    assert(n * 1000000L - totDropped > 100000L,
      s"dropped-mass default unexpectedly conserved: $totDropped")
    // the default path is byte-identical to before (the flag defaults off)
    assert(Graph.pageRank(chain, iters = 3).as[(String, Long)].collect().toMap
      == Graph.pageRank(chain, iters = 3, danglingRedistribute = false)
        .as[(String, Long)].collect().toMap)
  }

  test("pageRank: result independent of partitioning") {
    val e = chain.repartition(7)
    val a = Graph.pageRank(chain, iters = 4).as[(String, Long)].collect().toSet
    val b = Graph.pageRank(e, iters = 4).as[(String, Long)].collect().toSet
    assert(a == b)
  }

  // The Checkpoints.pin knob (VERDICT r6 task 4): with a checkpoint dir
  // configured, every iterative operator pins rounds with RELIABLE
  // checkpoint() (survives executor loss on a cluster) instead of
  // localCheckpoint — and the fixpoint answers must be identical.
  test("reliable-checkpoint mode leaves iterative results unchanged") {
    val localRanks = Graph.pageRank(chain, iters = 4)
      .as[(String, Long)].collect().toSet
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val localClusters = graft.dedup.Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliableRanks = Graph.pageRank(chain, iters = 4)
        .as[(String, Long)].collect().toSet
      val reliableClusters = graft.dedup.Dedup.dupClusters(pairs)
        .as[(Long, Long)].collect().toSet
      assert(reliableRanks == localRanks)
      assert(reliableClusters == localClusters)
      // and the knob did engage: setCheckpointDir itself eagerly creates a
      // UUID subdir, so non-emptiness is vacuous — look for the rdd-*
      // checkpoint data the reliable path actually writes
      def rddCkpts(f: java.io.File): Int =
        (if (f.getName.startsWith("rdd-")) 1 else 0) +
          Option(f.listFiles).toSeq.flatten.map(rddCkpts).sum
      assert(rddCkpts(new java.io.File(dir)) > 0,
        s"no rdd-* checkpoint dirs under $dir — Checkpoints.pin never took the reliable path")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("degrees: out/in/total per node, zero-filled") {
    val d = Graph.degrees(chain).as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(d("a") == ((2L, 0L, 2L)))
    assert(d("b") == ((1L, 1L, 2L)))
    assert(d("c") == ((0L, 2L, 2L)))
  }

  test("invertedIndex: sorted postings, df, maxPostings prunes") {
    val docs = Seq((1L, "x y"), (2L, "y z"), (3L, "y")).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, "doc_id", "text")
      .as[(String, Seq[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(idx("x") == ((Seq(1L), 1L)))
    assert(idx("y") == ((Seq(1L, 2L, 3L), 3L)))
    assert(idx("z") == ((Seq(2L), 1L)))
    // duplicate token inside one doc counts once
    val dup = Search.invertedIndex(Seq((1L, "y y")).toDF("doc_id", "text"),
      "doc_id", "text").as[(String, Seq[Long], Long)].collect()
    assert(dup.toSeq == Seq(("y", Seq(1L), 1L)))
    val pruned = Search.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .select("token").as[String].collect().toSet
    assert(pruned == Set("x", "z"))
  }
}
