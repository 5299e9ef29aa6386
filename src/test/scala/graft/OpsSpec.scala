package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Ops

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("insertData adds constants; coalesce mode keeps existing non-nulls") {
    val df = Seq((1, Some("a")), (2, None)).toDF("id", "v")
    val over = Ops.insertData(df, Map("src" -> "x"))
    assert(over.columns.contains("src"))
    assert(over.select("src").distinct().as[String].collect().toSeq == Seq("x"))
    val keep = Ops.insertData(df, Map("v" -> "filled"), overwrite = false)
    val got = keep.orderBy("id").select("v").as[String].collect().toSeq
    assert(got == Seq("a", "filled"))
  }

  test("substituteRegex replaces all occurrences") {
    val df = Seq("a b c").toDF("s")
    val got = Ops.substituteRegex(df, "s", " ", "_").as[String].head()
    assert(got == "a_b_c")
  }

  test("remap selects + renames, including nested paths") {
    val df = Seq((1, ("x", 2))).toDF("id", "p")
    val got = Ops.remap(df, Seq("id" -> "key", "p._2" -> "inner"))
    assert(got.columns.toSeq == Seq("key", "inner"))
    assert(got.as[(Int, Int)].head() == ((1, 2)))
  }

  test("serialize explodes arrays and map values") {
    val df = Seq((1, Seq("a", "b"))).toDF("id", "xs")
    assert(Ops.serialize(df, "xs", "x").count() == 2)
    val m = Seq((1, Map("k1" -> 10, "k2" -> 20))).toDF("id", "m")
    val got = Ops.serialize(m, "m", "v", values = true)
      .select("v").as[Int].collect().sorted.toSeq
    assert(got == Seq(10, 20))
  }

  test("filterTest: key_exists / value_is_true / value_is_not_none") {
    val df = Seq((1, true, Some("x")), (2, false, None)).toDF("id", "b", "o")
    assert(Ops.filterTest(df, "nope", Ops.KeyExists).count() == 0)
    assert(Ops.filterTest(df, "id", Ops.KeyExists).count() == 2)
    assert(Ops.filterTest(df, "b", Ops.ValueIsTrue).select("id").as[Int].head() == 1)
    assert(Ops.filterTest(df, "o", Ops.ValueIsNotNone).select("id").as[Int].head() == 1)
  }

  test("modSample is deterministic") {
    val df = spark.range(100).toDF("id")
    assert(Ops.modSample(df, "id", 10).count() == 10)
    assert(Ops.randomSample(df, 0.5).count() == Ops.randomSample(df, 0.5).count())
  }

  test("aggregateValues collects sorted lists per key") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("k", "v")
    val got = Ops.aggregateValues(df, Seq("k"), "v")
      .orderBy("k").as[(String, Seq[Int])].collect().toSeq
    assert(got == Seq(("a", Seq(1, 3)), ("b", Seq(2))))
  }

  test("batchRows assigns ceil(rn/n) ids; partitioned variant preserves size bound") {
    val df = spark.range(10).toDF("id")
    val got = Ops.batchRows(df, Seq("id"), 4)
      .groupBy("batch_id").count().orderBy("batch_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L), (2L, 4L), (3L, 2L)))
    val sizes = Ops.batchRowsPartitioned(spark.range(100).toDF("id"), 7)
      .groupBy("batch_id").count().select("count").as[Long].collect()
    assert(sizes.forall(_ <= 7))
    assert(sizes.sum == 100)
  }

  test("timeWindowAgg tumbles into minute buckets") {
    val df = Seq(
      ("2024-01-01 00:00:10", 1.0), ("2024-01-01 00:00:50", 2.0),
      ("2024-01-01 00:01:10", 5.0))
      .toDF("t", "v").withColumn("ts", to_timestamp(col("t")))
    val got = Ops.timeWindowAgg(df, "ts", "1 minute", Nil, Seq(sum("v").as("s")))
      .select("s").as[Double].collect().sorted.toSeq
    assert(got == Seq(3.0, 5.0))
  }

  test("intervalJoin matches rows within the time range, even on self-joins") {
    val ev = Seq((1L, "a", 100L), (2L, "a", 250L), (3L, "a", 900L), (4L, "b", 120L))
      .toDF("id", "k", "t")
    val l = ev.select(col("id").as("l_id"), col("k"), col("t").as("l_t"))
    val r = ev.select(col("id").as("r_id"), col("k"), col("t").as("r_t"))
    val got = Ops.intervalJoin(l, r, Seq("k"), col("l_t"), col("r_t"),
        lit(1L), lit(200L))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L))) // 2→3 gap 650 > 200; b row alone; self dt=0 < lower
  }

  test("rowStats profiles nulls and distincts per column") {
    val df = Seq((1, Some("x")), (2, None), (3, Some("x"))).toDF("id", "v")
    val got = Ops.rowStats(df).orderBy("column")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("id", 3L, 0L, 3L), ("v", 3L, 1L, 1L)))
  }

  test("windowRank keeps top-k per group") {
    val df = Seq(("g1", 10), ("g1", 30), ("g1", 20), ("g2", 5)).toDF("g", "v")
    val got = Ops.windowRank(df, Seq("g"), Seq(col("v").desc), 2)
      .select("g", "v").as[(String, Int)].collect().toSet
    assert(got == Set(("g1", 30), ("g1", 20), ("g2", 5)))
  }

  test("saltedAgg matches direct aggregation for decomposable aggs") {
    val df = Seq(("hot", 1.0), ("hot", 2.0), ("hot", 3.0), ("cold", 4.0))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Ops.saltedAgg(df, Seq("k"), Seq(
        (sum("v").as("s"), "s", "sum"),
        (count(lit(1)).as("n"), "n", "count"),
        (min("v").as("mn"), "mn", "min"),
        (max("v").as("mx"), "mx", "max")), saltBuckets = 3)
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("GraftExtensions registers float_vector_dot for SQL users") {
    import org.apache.spark.sql.SparkSession
    // build a sibling session (same SparkContext) so withExtensions applies
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val spark2 = SparkSession.builder().master("local[4]")
        .withExtensions(new org.apache.spark.sql.graftglue.GraftExtensions)
        .getOrCreate()
      import spark2.implicits._
      val got = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .selectExpr("float_vector_dot(a, b)").as[Double].head()
      assert(got == 11.0)
    } finally {
      SparkSession.setActiveSession(spark); SparkSession.setDefaultSession(spark)
    }
  }

  test("moneySum is exact decimal accumulation") {
    val df = Seq.fill(1000)(0.1).toDF("v")
    val got = df.agg(Ops.moneySum(col("v"))).as[Double].head()
    assert(got == 100.0) // double summation would give 99.9999...
  }

  test("packByBudget fills contiguous bins by exclusive prefix sum") {
    val df = Seq(("a", 1L, 400L), ("a", 2L, 400L), ("a", 3L, 400L),
      ("a", 4L, 900L), ("b", 1L, 50L)).toDF("k", "ord", "w")
    val got = Ops.packByBudget(df, Seq("k"), Seq("ord"), "w", 1000L)
      .select("k", "ord", "bin_id").as[(String, Long, Long)].collect().toSet
    // a: prior sums 0, 400, 800, 1200 → bins 0, 0, 0, 1; b restarts at 0
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("a", 4L, 1L), ("b", 1L, 0L)))
    // zero/negative budgets would null every bin via integral div-by-zero
    intercept[IllegalArgumentException] {
      Ops.packByBudget(df, Seq("k"), Seq("ord"), "w", 0L)
    }
  }

  test("stratifiedSample keeps whole strata at 1000 permille and none at 0") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "keep" else "drop"))
      .toDF("id", "stratum")
    val got = Ops.stratifiedSample(df, "id", "stratum",
      Map("keep" -> 1000, "drop" -> 0), defaultPermille = 500)
      .as[(Long, String)].collect()
    assert(got.length == 100 && got.forall(_._2 == "keep"))
    // default rate applies to strata missing from the map; deterministic
    val dflt = Ops.stratifiedSample(df, "id", "stratum", Map.empty, 500)
    assert(dflt.count() == Ops.stratifiedSample(df, "id", "stratum", Map.empty, 500).count())
  }

  test("approxDistinctKmv is exact below k and estimates above it") {
    val df = (1L to 5000L).map(i => (if (i <= 10) "small" else "big", i))
      .toDF("g", "v")
    val got = Ops.approxDistinctKmv(df, Seq("g"), "v", k = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("small") == (("small", 10L, 10.0))) // < k distinct → exact
    val (_, kept, est) = got("big")
    assert(kept == 64L)
    assert(est > 2500 && est < 10000, s"estimate $est implausible for 4990")
    // the bounded-aggregate selection ≡ the rank-window formulation the
    // SQL oracle still uses — identical k-th hash, hence identical estimate
    val h = conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy(col("__h"))
    val windowed = df.select(col("g"), h.as("__h")).distinct()
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 64)
      .groupBy("g").agg(count(lit(1)).as("n_kept"), max(col("__h")).as("kth"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val kthGot = Ops.approxDistinctKmv(df, Seq("g"), "v", k = 64)
      .withColumn("kth", // invert the estimate back to the k-th hash
        when(col("n_kept") < 64, lit(null))
          .otherwise((lit(63.0) / col("distinct_est") * lit((1L << 60).toDouble))
            .cast("long")))
    assert(windowed("big")._2 == 64L)
    val bigKth = kthGot.filter(col("g") === "big").select("kth")
      .as[Long].head()
    assert(math.abs(bigKth - windowed("big")._3) <= 1, // double round-trip ±1
      s"kth hash mismatch: $bigKth vs ${windowed("big")._3}")
    // null values are excluded EXPLICITLY (a null is not a distinct value):
    // nulls in the column must not shift n_kept or the estimate
    val withNulls = df.unionByName(
      Seq(("small", null.asInstanceOf[java.lang.Long]),
          ("big", null.asInstanceOf[java.lang.Long])).toDF("g", "v"))
    val gotN = Ops.approxDistinctKmv(withNulls, Seq("g"), "v", k = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(gotN == got, "null values leaked into the KMV sketch")
  }

  test("heavyHitters equals the exact group-by answer above the support threshold") {
    // 1000 rows: "a"×400, "b"×50, 550 singletons. At 40‰ the threshold is
    // cnt·1000 > 1000·40 → cnt > 40: a and b qualify, no singleton does.
    val rows = Seq.fill(400)("a") ++ Seq.fill(50)("b") ++
      (1 to 550).map(i => s"u$i")
    val df = rows.toDF("v")
    val got = Ops.heavyHitters(df, "v", supportPermille = 40)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 400L, "b" -> 50L))
    Caching.drain()
    // threshold is STRICT: at exactly the boundary the value drops.
    // 50·1000 > 1000·50 is false → only "a" survives at 50‰
    val boundary = Ops.heavyHitters(df, "v", supportPermille = 50)
      .as[(String, Long)].collect().toMap
    assert(boundary == Map("a" -> 400L))
    Caching.drain()
  }

  test("heavyHitters counts null rows in the total but never emits null") {
    val df = (Seq.fill(10)(Some("x")) ++ Seq.fill(10)(Option.empty[String]))
      .toDF("v")
    // x is 10/20 = 500‰ > 400‰ — nulls count toward n, never qualify
    val got = Ops.heavyHitters(df, "v", supportPermille = 400)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 10L))
    Caching.drain()
  }

  test("asOfJoin pairs each left row with the latest right row at or before it") {
    val l = Seq(("u1", 10L, "a"), ("u1", 25L, "b"), ("u2", 5L, "c"))
      .toDF("k", "l_ts", "tag")
    val r = Seq(("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u2", 7L, 9.0))
      .toDF("k", "r_ts", "v")
    val got = Ops.asOfJoin(l, r, Seq("k"), "l_ts", "r_ts", Seq("v"))
      .select("k", "l_ts", "tag", "r_ts", "v")
      .as[(String, Long, String, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      ("u1", 10L, "a", Some(10L), Some(1.0)), // tie: right AT l_ts matches
      ("u1", 25L, "b", Some(20L), Some(2.0)), // latest prior, not first
      ("u2", 5L, "c", None, None)))           // no prior right → left-outer
  }

  test("asOfJoin takes ALL payload columns from the same matched right row") {
    // The matched right row (ts=20) has v=null: the output must carry THAT
    // null, not reach back to the older row's v=1.0 while w comes from ts=20.
    val l = Seq(("u1", 25L)).toDF("k", "l_ts")
    val r = Seq(("u1", 10L, Some(1.0), "old"), ("u1", 20L, None, "new"))
      .toDF("k", "r_ts", "v", "w")
    val got = Ops.asOfJoin(l, r, Seq("k"), "l_ts", "r_ts", Seq("v", "w"))
      .select("k", "l_ts", "r_ts", "v", "w")
      .as[(String, Long, Option[Long], Option[Double], Option[String])]
      .collect().toSet
    assert(got == Set(("u1", 25L, Some(20L), None, Some("new"))))
  }

  test("asOfJoinBucketed equals asOfJoin across bucket boundaries") {
    // carry-in cases on purpose: left rows in buckets with NO right row
    // (u1@25 bucket [20,30) has none → carry from ts=18; u2@35 reaches back
    // two buckets), a right row exactly ON a bucket boundary (u1@30 for
    // left 31 — the boundary row must beat the carry-in it duplicates),
    // and a left row before any right (u2@5 → nulls).
    val l = Seq(("u1", 10L, "a"), ("u1", 25L, "b"), ("u1", 31L, "c"),
      ("u2", 5L, "d"), ("u2", 35L, "e")).toDF("k", "l_ts", "tag")
    val r = Seq(("u1", 9L, 1.0), ("u1", 18L, 2.0), ("u1", 30L, 3.0),
      ("u2", 12L, 9.0)).toDF("k", "r_ts", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "l_ts", "tag", "r_ts", "v")
        .as[(String, Long, String, Option[Long], Option[Double])].collect().toSet
    val plain = canon(Ops.asOfJoin(l, r, Seq("k"), "l_ts", "r_ts", Seq("v")))
    for (width <- Seq(1L, 7L, 10L, 1000L)) {
      val bucketed = canon(Ops.asOfJoinBucketed(l, r, Seq("k"), "l_ts", "r_ts",
        Seq("v"), bucketWidth = width))
      assert(bucketed == plain, s"bucketWidth=$width diverged")
    }
    assert(plain.contains(("u1", 25L, "b", Some(18L), Some(2.0))))
    assert(plain.contains(("u1", 31L, "c", Some(30L), Some(3.0))))
    assert(plain.contains(("u2", 35L, "e", Some(12L), Some(9.0))))
    assert(plain.contains(("u2", 5L, "d", None, None)))
    // whole-struct fill contract carries over: matched row's NULL stays
    val ln = Seq(("u1", 25L)).toDF("k", "l_ts")
    val rn = Seq(("u1", 10L, Some(1.0), "old"), ("u1", 20L, None, "new"))
      .toDF("k", "r_ts", "v", "w")
    val gotN = Ops.asOfJoinBucketed(ln, rn, Seq("k"), "l_ts", "r_ts",
        Seq("v", "w"), bucketWidth = 7L)
      .select("k", "l_ts", "r_ts", "v", "w")
      .as[(String, Long, Option[Long], Option[Double], Option[String])]
      .collect().toSet
    assert(gotN == Set(("u1", 25L, Some(20L), None, Some("new"))))
  }

  test("asOfJoin rejects right payload names colliding with join keys") {
    val l = Seq(("u1", 10L)).toDF("k", "l_ts")
    val r = Seq(("u1", 5L, 1.0)).toDF("k", "r_ts", "k2")
    intercept[IllegalArgumentException] {
      Ops.asOfJoin(l, r.withColumnRenamed("k2", "k"), Seq("k"), "l_ts", "r_ts", Seq("k"))
    }
  }

  test("histogram bins values into equal widths with the max in the last bin") {
    val df = Seq(0.0, 1.0, 2.5, 5.0, 9.9, 10.0).toDF("v")
    val got = Ops.histogram(df, "v", bins = 5)
      .orderBy("bin").as[(Long, Double, Double, Long)].collect().toSeq
    // width 2.0: [0,2)→2, [2,4)→1, [4,6)→1, [8,10]→2 (max joins last bin)
    assert(got == Seq((0L, 0.0, 2.0, 2L), (1L, 2.0, 4.0, 1L),
      (2L, 4.0, 6.0, 1L), (4L, 8.0, 10.0, 2L)))
    // nulls are excluded; all-equal input degenerates to one bin
    val deg = Ops.histogram(
      Seq(Some(3.0), Some(3.0), None).toDF("v"), "v", bins = 4)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(deg == Seq((0L, 3.0, 3.0, 2L)))
    // empty input yields an empty histogram, not a crash
    assert(Ops.histogram(Seq.empty[Double].toDF("v"), "v", 3).count() == 0)
  }

  test("globalRowNumber ≡ the single-partition window rank it avoids") {
    val df = (1L to 500L).map(i => (i, (i * 7919L) % 101L)).toDF("id", "v")
      .repartition(8) // multi-partition input: offsets must compose ranges
    val got = Ops.globalRowNumber(df, Seq(col("v").desc, col("id").asc), "rk")
      .as[(Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.size == 500)
    Caching.drain()
    // ranks survive a downstream coalesce(1) — the Verify writer's shape;
    // a TaskContext-based offset formulation silently restarts every
    // partition's rank at 1 under exactly this plan
    val again = Ops.globalRowNumber(df, Seq(col("v").desc, col("id").asc), "rk")
      .coalesce(1)
    assert(again.select("rk").as[Long].collect().sorted.toSeq == (1L to 500L))
    Caching.drain()
  }

  test("sampleNPerGroup keeps exactly min(n, |group|) deterministic rows") {
    val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "g")
    val got = Ops.sampleNPerGroup(df, Seq("g"), "id", n = 3)
    assert(got.groupBy("g").count().as[(String, Long)].collect().toMap
      == Map("even" -> 3L, "odd" -> 3L))
    // deterministic: same rows every run
    val again = Ops.sampleNPerGroup(df, Seq("g"), "id", n = 3)
    assert(got.orderBy("id").as[(Long, String)].collect().toSeq
      == again.orderBy("id").as[(Long, String)].collect().toSeq)
    // small groups return whole groups
    assert(Ops.sampleNPerGroup(df.filter(col("id") <= 2), Seq("g"), "id", 5)
      .count() == 2)
    // the bounded-aggregate path ≡ the rank-window formulation it replaced
    // (and that the SQL oracle still uses)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(md5(col("id").cast("string")), col("id"))
    val windowed = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3).drop("__rn")
      .as[(Long, String)].collect().toSet
    assert(got.as[(Long, String)].collect().toSet == windowed)
    // string ids take the bounded path too
    val sdf = df.withColumn("id", concat(lit("d_"), col("id")))
    assert(Ops.sampleNPerGroup(sdf, Seq("g"), "id", n = 3).count() == 6)
    // a NULL group key is a group like any other (null-safe semi join) —
    // the window form partitioned nulls together, so must the bounded path
    val dfN = Seq((1L, "a"), (2L, "a"), (3L, null), (4L, null), (5L, null))
      .toDF("id", "g")
    val gotN = Ops.sampleNPerGroup(dfN, Seq("g"), "id", n = 2)
    assert(gotN.filter(col("g").isNull).count() == 2 &&
      gotN.filter(col("g") === "a").count() == 2)
  }

  test("percentiles computes exact interpolated quantiles per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("k", "v")
    val got = Ops.percentiles(df, Seq("k"), "v", Seq(0.5 -> "p50", 0.75 -> "p75"))
      .as[(String, Double, Double)].collect().toSet
    assert(got == Set(("a", 2.5, 3.25), ("b", 10.0, 10.0)))
  }

  test("weightedSample keeps p=1 rows, drops p=0 rows, and is deterministic") {
    val df = spark.range(0, 500).toDF("id")
    val all = Ops.weightedSample(df.withColumn("p", lit(1.0)), "id", "p").count()
    val none = Ops.weightedSample(df.withColumn("p", lit(0.0)), "id", "p").count()
    assert(all == 500 && none == 0)
    val half = df.withColumn("p", lit(0.5))
    val a = Ops.weightedSample(half, "id", "p").select("id").as[Long].collect().toSet
    val b = Ops.weightedSample(half, "id", "p").select("id").as[Long].collect().toSet
    assert(a == b && a.size > 180 && a.size < 320) // same rows, ~half kept
  }

  test("resampleMixture keeps the bottleneck group whole and rates the rest") {
    // groups: a=1000 rows, b=100 rows; target weights a:b = 1:1 →
    // b is the bottleneck (keeps 1000‰), a keeps ~100‰
    val df = (1L to 1000L).map(i => (i, "a")).++((1L to 100L).map(i => (i + 10000L, "b")))
      .toDF("id", "g")
    val got = Ops.resampleMixture(df, "id", "g", Map("a" -> 1, "b" -> 1))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got("b") == 100L) // bottleneck: every row kept
    assert(got("a") > 60L && got("a") < 140L) // ~100‰ of 1000 by md5 bucket
    // deterministic: identical survivors on a re-run
    val again = Ops.resampleMixture(df, "id", "g", Map("a" -> 1, "b" -> 1))
      .select("id").as[Long].collect().toSet
    val first = Ops.resampleMixture(df, "id", "g", Map("a" -> 1, "b" -> 1))
      .select("id").as[Long].collect().toSet
    assert(again == first)
    // unweighted groups drop entirely
    val dropped = Ops.resampleMixture(df, "id", "g", Map("b" -> 1))
    assert(dropped.filter(col("g") === "a").count() == 0)
  }

  test("temperatureSample quotas follow n^alpha and cap at group size") {
    // groups: a=900 rows, b=100 rows. α=0.5 → weights 30:10, z=40;
    // total=400 → quota_a = round(400·30/40) = 300, quota_b =
    // min(100, round(400·10/40)) = 100 (capped at the group size)
    val df = (1L to 900L).map(i => (i, "a")).++((1L to 100L).map(i => (i + 10000L, "b")))
      .toDF("id", "g")
    val got = Ops.temperatureSample(df, "id", "g", total = 400L, alpha = 0.5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 300L, "b" -> 100L))
    // α=1 preserves natural proportions exactly: quotas 360/40
    val nat = Ops.temperatureSample(df, "id", "g", total = 400L, alpha = 1.0)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(nat == Map("a" -> 360L, "b" -> 40L))
    // deterministic: identical survivors on a re-run, and the kept set is
    // the md5-order PREFIX (re-running with a smaller total nests inside)
    val big = Ops.temperatureSample(df, "id", "g", 400L).select("id")
      .as[Long].collect().toSet
    val small = Ops.temperatureSample(df, "id", "g", 100L).select("id")
      .as[Long].collect().toSet
    assert(small.subsetOf(big))
    // null groups are unsampleable → dropped, not an NPE in the
    // driver-side quota computation
    val withNull = df.union(Seq((9999L, null.asInstanceOf[String])).toDF("id", "g"))
    val nn = Ops.temperatureSample(withNull, "id", "g", 400L)
    assert(nn.filter(col("grp").isNull).count() == 0L)
    assert(nn.count() == 400L)
    // null IDS are unsampleable too — filtered BEFORE the quota-path gate,
    // so the kept set cannot depend on which path runs
    val sdf = df.withColumn("id",
      when(col("id") === 1L, lit(null)).otherwise(col("id").cast("string")))
    assert(Ops.temperatureSample(sdf, "id", "g", 400L)
      .filter(col("id").isNull).count() == 0L)
  }

  test("tokenBudgetSample fills each budget in md5 order and stops past it") {
    // group a: 10 docs x 5 tokens = 50; budget 23 → kept docs' PRIOR
    // cumulative < 23: 5 docs (priors 0,5,10,15,20 — the 5th crosses)
    val df = (1L to 10L).map(i => (i, "a", "t t t t t"))
      .++(Seq((100L, "b", "x y"), (101L, "b", "x y z")))
      .toDF("id", "g", "txt")
    val got = Ops.tokenBudgetSample(df, "id", "g", "txt", Map("a" -> 23L, "b" -> 100L))
    val byG = got.groupBy("grp").agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byG("a") == ((25L, 5L))) // ≥ budget, overshoot < 1 doc
    assert(byG("b") == ((5L, 2L))) // under-budget group keeps everything
    // deterministic across reruns; unbudgeted groups drop
    val again = Ops.tokenBudgetSample(df, "id", "g", "txt", Map("a" -> 23L))
    assert(again.select("id").as[Long].collect().toSet ==
      Ops.tokenBudgetSample(df, "id", "g", "txt", Map("a" -> 23L))
        .select("id").as[Long].collect().toSet)
    assert(again.filter(col("grp") === "b").count() == 0)
  }

  test("tokenBudgetRate lands near the token budget without a window sort") {
    val df = (1L to 2000L).map(i => (i, "a", "t t t t t")).toDF("id", "g", "txt")
    val got = Ops.tokenBudgetRate(df, "id", "g", "txt", Map("a" -> 5000L))
    val kept = got.agg(sum(size(array_remove(split(col("txt"), " "), ""))))
      .as[Long].head()
    assert(kept > 4000L && kept < 6000L) // 10000 total, budget 5000 ± sampling error
    // rate ≥ total ⇒ keep everything
    assert(Ops.tokenBudgetRate(df, "id", "g", "txt", Map("a" -> 100000L)).count() == 2000L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone")).toDF("id", "txt")
    val nw = Seq((1L, "same"), (2L, "after"), (4L, "fresh")).toDF("id", "txt")
    val got = Ops.snapshotDiff(old, nw, "id", "txt")
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // hashes expose the absent side as NULL
    val added = Ops.snapshotDiff(old, nw, "id", "txt").filter(col("status") === "added")
    assert(added.filter(col("old_hash").isNull && col("new_hash").isNotNull).count() == 1)
  }

  test("domainBlocklistFilter blocks exact domains and their subdomains") {
    val df = Seq(
      (1L, "https://www.good.com/x"),        // www. strips → good.com, kept
      (2L, "https://bad.com/y"),             // exact match, blocked
      (3L, "https://cdn.bad.com/z"),         // subdomain of bad.com, blocked
      (4L, "https://notbad.com/w"),          // suffix is NOT label-aligned, kept
      (5L, "https://user@deep.ads.bad.com:8080/q"), // userinfo+port, blocked
      (6L, "not a url at all"))              // no domain → kept
      .toDF("id", "url")
    val bl = Seq("bad.com").toDF("domain")
    val kept = Ops.domainBlocklistFilter(df, "id", "url", bl, "domain")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 6L))
  }

  test("pivotAgg widens named values, fills absent combos, drops unknowns") {
    val df = Seq((1L, "a", 10.0), (1L, "a", 5.0), (1L, "b", 1.0), (2L, "b", 2.0),
      (2L, "zzz", 9.0)).toDF("k", "t", "v")
    val wide = Ops.pivotAgg(df, Seq("k"), "t", Seq("a", "b"), count(lit(1)),
      fillValue = 0L).orderBy("k").as[(Long, Long, Long)].collect().toSeq
    // "zzz" is outside the named domain → dropped; (2,"a") absent → 0
    assert(wide == Seq((1L, 2L, 1L), (2L, 0L, 1L)))
    val unpiv = Ops.unpivotCols(
        Ops.pivotAgg(df, Seq("k"), "t", Seq("a", "b"), count(lit(1)), fillValue = 0L),
        Seq("k"), Seq("a", "b"), "t", "n")
      .as[(Long, String, Long)].collect().toSet
    assert(unpiv == Set((1L, "a", 2L), (1L, "b", 1L), (2L, "a", 0L), (2L, "b", 1L)))
  }

  test("rollingAgg frames the previous lookback rows per key") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (1L, 4L, 40L),
      (2L, 1L, 5L)).toDF("k", "o", "v")
    val out = Ops.rollingAgg(df, Seq("k"), col("o"), lookback = 2,
        Seq("rs" -> sum(col("v")), "rn" -> count(lit(1))))
      .select("k", "o", "rs", "rn").as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 10L, 1L), (1L, 2L, 30L, 2L), (1L, 3L, 50L, 2L),
      (1L, 4L, 70L, 2L), (2L, 1L, 5L, 1L)))
  }

  test("unionEvolved aligns drifted schemas and null-fills") {
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 3.5)).toDF("id", "score")
    val u = Ops.unionEvolved(Seq(a, b))
    assert(u.columns.toSeq == Seq("id", "name", "score"))
    val rows = u.as[(Long, Option[String], Option[Double])].collect().toSet
    assert(rows == Set((1L, Some("x"), None), (2L, None, Some(3.5))))
  }

  test("qualityChecks counts violations per expectation in one pass") {
    val df = Seq((1L, Some(5.0), "a"), (2L, Some(-1.0), "b"),
      (3L, None, "a"), (3L, Some(2.0), null))
      .toDF("id", "v", "t")
    val out = Ops.qualityChecks(df,
        Seq("v_nonneg" -> (col("v") >= 0), "t_present" -> col("t").isNotNull),
        uniqueCols = Seq("id"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // null predicate (v is NULL) counts as a violation, not a pass
    assert(out("v_nonneg") == ((4L, 2L)))
    assert(out("t_present") == ((4L, 1L)))
    assert(out("unique:id") == ((4L, 1L))) // id=3 twice
  }

  test("qualityChecks: empty frame reports 0 violations; dotted names work") {
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    val out = Ops.qualityChecks(empty,
        Seq("t.present" -> col("t").isNotNull), uniqueCols = Seq("id"))
      .as[(String, Long, Long)].collect().toSet
    // an empty ingest batch must gate as 0/0, not null
    assert(out == Set(("t.present", 0L, 0L), ("unique:id", 0L, 0L)))
  }

  test("hashSplit is deterministic and near the requested fraction") {
    val df = spark.range(0, 2000).toDF("id")
    val splits = Ops.hashSplit(df, "id", 90).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(splits.keySet == Set("train", "val"))
    assert(splits("train") > 1700 && splits("train") < 1900) // ~90% of 2000
    // same rows land in the same split on a re-run (no RNG state)
    val again = Ops.hashSplit(df, "id", 90).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(again == splits)
  }

  test("shardManifest: order/partitioning-independent, detects a mutated " +
       "row and an id↔text crosswire") {
    val docs = (0L until 60L).map(i => (i, s"doc body $i")).toDF("id", "text")
    val sharded = Ops.corpusShuffle(docs, "id", seed = 7L, numShards = 4)
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Ops.shardManifest(df, "shard", "id", "text")
        .as[(Long, Long, Long, Long)].collect().toSet
    val base = manifest(sharded)
    assert(base.map(_._1) == (0L until 4L).toSet && base.map(_._2).sum == 60L)
    // the digest is a SET property: repartitioning / reordering the
    // export changes nothing
    assert(manifest(sharded.repartition(13)) == base)
    assert(manifest(sharded.orderBy(col("text").desc)) == base)
    // a one-character mutation changes EXACTLY its shard's digest (row
    // count and every other shard untouched)
    val mutated = sharded.withColumn("text",
      when(col("id") === 17L, concat(col("text"), lit("!")))
        .otherwise(col("text")))
    val m = manifest(mutated)
    assert(m != base && (base -- m).size == 1 && (m -- base).size == 1)
    assert(m.map(t => (t._1, t._2)) == base.map(t => (t._1, t._2)),
      "a content mutation must not change row counts")
    // an id↔text crosswire between two rows of the SAME shard keeps both
    // strings and both ids in the shard — only the (id, text) PAIRING
    // broke, and the digest must still catch it
    val shard0 = sharded.filter(col("shard") === 0L)
      .select("id").as[Long].collect().sorted.take(2)
    val (a, b) = (shard0(0), shard0(1))
    val crossed = sharded.withColumn("text",
      when(col("id") === a, s"doc body $b")
        .when(col("id") === b, s"doc body $a")
        .otherwise(col("text")))
    assert(manifest(crossed) != base,
      "an id↔text crosswire slipped past the manifest digest")
    // a null text COUNTS in n_rows but contributes nothing to the digest
    // or char sum (concat propagates null; concat_ws would silently hash
    // the id alone and diverge from the null-propagating SQL oracle)
    val withNull = sharded.withColumn("text",
      when(col("id") === 5L, lit(null: String)).otherwise(col("text")))
    val mn = manifest(withNull)
    val nullShard = sharded.filter(col("id") === 5L)
      .select("shard").as[Long].head()
    val expect = manifest(sharded.filter(col("id") =!= 5L)).map {
      case (s, n, c, x) if s == nullShard => (s, n + 1, c, x)
      case t => t
    }
    assert(mn == expect,
      "a null-text row must count rows but stay out of digest/chars")
    // a null ID with non-null text: out of the digest (hash propagates
    // null) but its characters DO count — n_chars depends on text alone
    val idNull = sharded.withColumn("id",
      when(col("id") === 5L, lit(null: java.lang.Long)).otherwise(col("id")))
    val mi = Ops.shardManifest(idNull, "shard", "id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expectI = manifest(sharded.filter(col("id") =!= 5L)).map {
      case (s, n, c, x) if s == nullShard =>
        (s, n + 1, c + "doc body 5".length, x)
      case t => t
    }
    assert(mi == expectI,
      "a null-id row must keep its chars in n_chars but stay out of the digest")
  }
}
