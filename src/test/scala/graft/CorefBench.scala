package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch timing harness for the connected-components strategy decisions:
  * times q_kb_canonical / q_coreference / q_dup_clusters at a given SF dir,
  * min of 2 runs each, plus deep-chain microbenches comparing the shipped
  * pointer-jumped label propagation (`Dedup.dupClusters`) against the
  * alternating large-star/small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the round-6
  * keep-or-reject experiment recorded in plans/SKEW.md.
  */
object CorefBench {

  /** Large-star/small-star connected components, experiment-grade: edges
    * contract onto per-component minima by alternating the two star
    * operations until the edge set is stable. Exact same output contract
    * as [[graft.dedup.Dedup.dupClusters]]: (member, canonical) with
    * canonical = component min, every pair endpoint labeled.
    */
  def starComponents(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b", maxRounds: Int = 50): DataFrame = {
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(edges: DataFrame): DataFrame = {
      val dir = edges.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val m = dir.groupBy("u").agg(min(col("v")).as("m"))
      val j = dir.join(m, "u")
      j.select(col("v").as("u"), col("m").as("v"))
        .union(j.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    var edges = pairs.select(col(idA).as("u"), col(idB).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    var n = edges.count()
    var stable = false
    var round = 0
    while (!stable && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nn = next.count()
      // exact stability: |next| = |cur| ∧ |next ∪ cur| = |cur| ⟺ next = cur
      stable = nn == n && next.union(edges).distinct().count() == n
      edges = next; n = nn
      round += 1
    }
    require(stable, s"starComponents did not converge in $maxRounds rounds")
    val nodes = pairs.select(col(idA).as("member"))
      .union(pairs.select(col(idB).as("member"))).distinct()
    // final edges are (leaf, root); roots and isolated nodes label themselves
    nodes.join(edges.select(col("u").as("member"), col("v").as("__c")),
        Seq("member"), "left")
      .select(col("member"), coalesce(col("__c"), col("member")).as("canonical"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[corefbench] $name min=${ts.min}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    for (q <- Seq("q_kb_canonical", "q_coreference", "q_dup_clusters"))
      time(q) { SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save() }

    // the real near-dup pair distribution (shallow, clustered): both
    // strategies on the same LSH candidate pairs
    val sig = graft.dedup.Dedup.minhashSignature(
      graft.sources.Tables.load(spark, dir, "documents"), "doc_id", "text", 16)
    val pairs = graft.dedup.Dedup.lshPairs(sig, bands = 4, rowsPerBand = 4,
      maxBucket = 256).localCheckpoint(true)
    time("dupClusters_lsh") {
      graft.dedup.Dedup.dupClusters(pairs, maxRounds = 100000)
        .agg(count(lit(1))).collect()
    }
    time("starComponents_lsh") {
      starComponents(pairs).agg(count(lit(1))).collect()
    }

    // deep chain: path graph — the worst case for label propagation
    for (n <- Seq(128, 1024)) {
      val chain = spark.range(0, n).selectExpr(
        "lpad(cast(id as string), 8, '0') as id_a",
        "lpad(cast(id + 1 as string), 8, '0') as id_b")
        .localCheckpoint(true)
      // correctness cross-check before timing: identical labelings
      val a = graft.dedup.Dedup.dupClusters(chain, maxRounds = 100000)
        .orderBy("member").collect().toSeq
      val b = starComponents(chain).orderBy("member").collect().toSeq
      require(a == b, s"star labeling diverges from dupClusters on chain $n")
      time(s"dupClusters_chain$n") {
        graft.dedup.Dedup.dupClusters(chain, maxRounds = 100000)
          .agg(count(lit(1))).collect()
      }
      time(s"starComponents_chain$n") {
        starComponents(chain).agg(count(lit(1))).collect()
      }
    }
    spark.stop()
  }
}
