package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.Ops
import graft.sources.Tables

/** Skew experiment (SURVEY §5): synthesize a hot user_id in the events
  * table, then measure the naive plans against the skew-engineered paths —
  * `Ops.saltedAgg` (two-phase aggregation) and `Ops.intervalJoinBucketed`
  * ((key, time-bucket) shuffle). Results land in plans/SKEW.md as measured
  * numbers, not claims. Counts are asserted equal between each naive/skew
  * pair, so the speedups are for IDENTICAL results.
  *
  * Usage: runMain graft.SkewBench [sfDir] [outFile] [amp]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "plans/SKEW.md"
    val amp = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val hot = 42L
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"),
      col("event_type"), expr("ts_ns div 1000").as("ts_us"), col("value"))
    // Every 10th event is replicated `amp`× onto ONE user id: the classic
    // power-law outlier (a bot account, a null-ish default key).
    val skewed = ev.unionByName(
        ev.filter(pmod(col("event_id"), lit(10)) === 0)
          .withColumn("__k", explode(sequence(lit(1), lit(amp))))
          .withColumn("user_id", lit(hot))
          .withColumn("event_id", col("event_id") * 1000L + col("__k"))
          .drop("__k"))
      .persist()
    val total = skewed.count()
    val hotRows = skewed.filter(col("user_id") === hot).count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // warmup
    skewed.groupBy("event_type").count().collect()

    // ---- aggregation: naive group-by vs salted two-phase ----
    // IDENTICAL aggregate expressions on both sides (double sum, like the
    // salted plan below) — mixing decimal into one side would conflate the
    // salting win with decimal-vs-double arithmetic cost
    val (tAggNaive, nAggNaive) = time {
      skewed.groupBy("user_id").agg(
        count(lit(1)).as("n"), sum(col("value").cast(DoubleType)).as("sv"),
        min(col("ts_us")).as("mn"), max(col("ts_us")).as("mx")).count()
    }
    val (tAggSalted, nAggSalted) = time {
      Ops.saltedAgg(skewed, Seq("user_id"), Seq(
        (count(lit(1)).as("n"), "n", "count"),
        (sum(col("value").cast(DoubleType)).as("sv"), "sv", "sum"),
        (min(col("ts_us")).as("mn"), "mn", "min"),
        (max(col("ts_us")).as("mx"), "mx", "max")), saltBuckets = cpus).count()
    }
    assert(nAggNaive == nAggSalted, s"agg row counts differ: $nAggNaive vs $nAggSalted")

    // ---- interval join: key-only shuffle vs (key, time-bucket) shuffle ----
    val p = skewed.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_us"))
    val e = skewed.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"), col("ts_us").as("e_us"))
    val lo = -60000000L; val hi = 60000000L // ±60 s window
    val (tJoinNaive, nJoinNaive) = time {
      Ops.intervalJoin(p, e, Seq("user_id"), col("p_us"), col("e_us"),
        lit(lo), lit(hi)).count()
    }
    val (tJoinBucketed, nJoinBucketed) = time {
      Ops.intervalJoinBucketed(p, e, Seq("user_id"), "p_us", "e_us",
        lo, hi, bucketWidth = 120000000L).count()
    }
    assert(nJoinNaive == nJoinBucketed,
      s"join row counts differ: $nJoinNaive vs $nJoinBucketed")

    // ---- as-of join: key-only window vs (key, time-bucket) + carry-in ----
    val al = skewed.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us").as("l_us"))
    val ar = skewed.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us").as("r_us"))
      .agg(max(col("value")).as("r_value"))
    val (tAsofNaive, nAsofNaive) = time {
      Ops.asOfJoin(al, ar, Seq("user_id"), "l_us", "r_us", Seq("r_value")).count()
    }
    val (tAsofBucketed, nAsofBucketed) = time {
      Ops.asOfJoinBucketed(al, ar, Seq("user_id"), "l_us", "r_us",
        Seq("r_value"), bucketWidth = 3600L * 1000000L).count()
    }
    assert(nAsofNaive == nAsofBucketed,
      s"as-of row counts differ: $nAsofNaive vs $nAsofBucketed")

    val md =
      s"""# Skew experiment (measured, not claimed)
         |
         |Input: `$sfDir` events with every 10th event replicated ${amp}×
         |onto one hot user_id → $hotRows of $total rows
         |(${hotRows * 100 / total}%) land on a single key. local[$cpus],
         |`spark.sql.shuffle.partitions`=$cpus, AQE on.
         |
         || experiment | naive plan | skew path | naive s | skew s | speedup | rows (equal) |
         ||---|---|---|---|---|---|---|
         || group-by agg on user_id | single shuffle on user_id (hot key → one reducer) | `Ops.saltedAgg`: (user_id, salt) partials → merge | ${f"$tAggNaive%.2f"} | ${f"$tAggSalted%.2f"} | ${f"${tAggNaive / tAggSalted}%.2f"}× | $nAggNaive |
         || interval join purchases×errors (±60 s) | `Ops.intervalJoin`: shuffle on user_id only | `Ops.intervalJoinBucketed`: shuffle on (user_id, 120 s bucket) | ${f"$tJoinNaive%.2f"} | ${f"$tJoinBucketed%.2f"} | ${f"${tJoinNaive / tJoinBucketed}%.2f"}× | $nJoinNaive |
         || as-of join clicks←purchases | `Ops.asOfJoin`: ONE window partitioned by user_id (hot key = one task's sort) | `Ops.asOfJoinBucketed`: window on (user_id, 1 h bucket) + carry-in pre-pass | ${f"$tAsofNaive%.2f"} | ${f"$tAsofBucketed%.2f"} | ${f"${tAsofNaive / tAsofBucketed}%.2f"}× | $nAsofNaive |
         |
         |Reading:
         |- The join is where skew kills: the hot key's entire purchase AND
         |  error history lands in ONE task whose in-task pair expansion is
         |  quadratic. Time-bucketing the shuffle key caps each task at one
         |  (key, 120 s) slice, so the quadratic work spreads across all
         |  $cpus slots. AQE's skew-join splitting does not help here — it
         |  splits by partition SIZE on one side, but the pair expansion
         |  needs both sides of the hot key co-partitioned, which is what
         |  the bucket key provides deterministically.
         |- The as-of gap is linear-vs-linear (a window sort, no pair
         |  blowup), so the win is the sort spread: the hot key's whole
         |  union (left + right + carry rows) sorts in one task under the
         |  key-only window, while the bucketed form sorts each (key, hour)
         |  slice independently and pays two extra aggregate-sized shuffles
         |  for the carry-in. The crossover argues for asOfJoin as the
         |  default and the bucketed form once one key's history outgrows a
         |  task (results are identical — law-tested across widths and
         |  shared-oracled by q_asof/q_asof_bucketed).
         |- The aggregation gap is smaller at this scale because the agg is
         |  partial-aggregation friendly (map-side combine already shrinks
         |  the hot key to one row per map task); salting matters for aggs
         |  whose partial state is large (collect_list/distinct) or when the
         |  reduce side does real per-row work. The two-phase result is
         |  bit-identical (q_salted_agg oracles it).
         |
         |Regenerate: `sbt "runMain graft.SkewBench $sfDir $out $amp"`.
         |""".stripMargin
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(out), md)
    println(md)
    spark.stop()
  }
}
