package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.{ColumnBridge, CountInSet}

/** SQL front-end parity for the native expressions: every graftglue
  * expression is registered through [[org.apache.spark.sql.graftglue
  * .GraftExtensions]], model parameters arrive as foldable SQL literals,
  * and the [[org.apache.spark.sql.graftglue.FuseCountInSet]] optimizer
  * rule gives pure-SQL/config users the same fused stopword-count plan
  * the Scala API builds directly.
  */
class SqlExtensionsSpec extends SparkSpec {

  // Sibling session (same SparkContext) carrying the extensions — the
  // OpsSpec float_vector_dot pattern, cached for the whole suite.
  private lazy val ext: SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .withExtensions(new org.apache.spark.sql.graftglue.GraftExtensions)
      .getOrCreate()
    SparkSession.setActiveSession(spark); SparkSession.setDefaultSession(spark)
    s
  }

  private def withExt[A](f: SparkSession => A): A = {
    val s = ext
    SparkSession.setActiveSession(s)
    try f(s)
    finally {
      SparkSession.setActiveSession(spark); SparkSession.setDefaultSession(spark)
    }
  }

  private def messages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("count_in_set is SQL-callable with a literal set") {
    withExt { s =>
      import s.implicits._
      val got = Seq(
        (1L, Seq("the", "cat", "sat", "on", "the", "mat")),
        (2L, Seq[String]("dog", null, "the")),
        (3L, null)).toDF("id", "toks")
        .selectExpr("id", "count_in_set(toks, array('the', 'on', NULL)) AS n")
        .as[(Long, Option[Long])].collect().toMap
      assert(got == Map(1L -> Some(3L), 2L -> Some(1L), 3L -> None))
    }
  }

  test("count_in_set rejects a non-literal set at analysis") {
    withExt { s =>
      import s.implicits._
      val e = intercept[Exception] {
        Seq(Seq("a")).toDF("toks")
          .selectExpr("count_in_set(toks, toks)").collect()
      }
      assert(messages(e).contains("must be a literal"))
    }
  }

  test("normalize_unicode is SQL-callable; form must be a literal") {
    withExt { s =>
      import s.implicits._
      val deco = new String(Array('a'.toInt, 0x301), 0, 2) // a + COMBINING ACUTE
      val got = Seq(deco).toDF("t")
        .selectExpr("normalize_unicode(t, 'NFC') AS n").as[String].head()
      assert(got == new String(Array(0xE1), 0, 1)) // á composed
      val e = intercept[Exception] {
        Seq(deco).toDF("t").selectExpr("normalize_unicode(t, t)").collect()
      }
      assert(messages(e).contains("must be a literal"))
      val bad = intercept[Exception] {
        Seq(deco).toDF("t").selectExpr("normalize_unicode(t, 'NFX')").collect()
      }
      assert(messages(bad).contains("unknown form"))
    }
  }

  test("clean_lines is SQL-callable with literal rule parameters") {
    withExt { s =>
      import s.implicits._
      val got = Seq("Keep this line.\nno\nDrop javascript now.")
        .toDF("t")
        .selectExpr("clean_lines(t, 3, '.!?', array('javascript')) AS c")
        .as[String].head()
      assert(got == "Keep this line.")
      val e = intercept[Exception] {
        Seq("x").toDF("t").selectExpr("clean_lines(t, 3, t, array('a'))").collect()
      }
      assert(messages(e).contains("must be a literal"))
    }
  }

  test("chained_replace is SQL-callable and applies steps in order") {
    withExt { s =>
      import s.implicits._
      val got = Seq("aab").toDF("s")
        .selectExpr("chained_replace(s, array('aa', 'b'), array('b', 'c')) AS r")
        .as[String].head()
      assert(got == "cc") // aab → (aa→b) → bb → (b→c) → cc: order matters
      val e = intercept[Exception] {
        Seq("x").toDF("s")
          .selectExpr("chained_replace(s, array('a', 'b'), array('y'))").collect()
      }
      assert(messages(e).contains("search strings vs"))
    }
  }

  test("interleave_bits / quantize_vec / sq_dist_lit / hyperplane_sig SQL ≡ Column API") {
    withExt { s =>
      import org.apache.spark.sql.graftglue.{HyperplaneSig, InterleaveBits, QuantizeVec, SqDistLit}
      import s.implicits._
      val df = Seq((Seq(3L, 5L), Seq(1.26, -0.7), Seq(1.0, 2.0))).toDF("iz", "qv", "dv")
      val sql = df.selectExpr(
        "interleave_bits(iz, 3) AS z",
        "quantize_vec(qv, 100.0D) AS q",
        "sq_dist_lit(dv, array(0.0D, 0.0D)) AS d",
        "hyperplane_sig(dv, array(array(1.0D, 0.0D), array(1.0D, -1.0D))) AS h")
      val api = df.select(
        ColumnBridge.column(InterleaveBits(ColumnBridge.expression(col("iz")), 3)).as("z"),
        ColumnBridge.column(QuantizeVec(ColumnBridge.expression(col("qv")), 100.0)).as("q"),
        ColumnBridge.column(SqDistLit(ColumnBridge.expression(col("dv")), Array(0.0, 0.0))).as("d"),
        ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(col("dv")),
          Array(Array(1.0, 0.0), Array(1.0, -1.0)))).as("h"))
      assert(sql.collect().toSeq == api.collect().toSeq)
      assert(sql.as[(Long, Seq[Double], Double, Seq[Int])].head() ==
        ((39L, Seq(126.0, -70.0), 5.0, Seq(1, 0))))
    }
  }

  test("upper_tri_pairs is SQL-callable as a generator") {
    withExt { s =>
      import s.implicits._
      val got = s.range(1)
        .selectExpr("upper_tri_pairs(array('a', 'b', 'c'))")
        .as[(String, String)].collect().toSeq
      assert(got == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    }
  }

  private def hasCountInSet(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: CountInSet => true
      case _ => false
    })

  /** Range-backed frame — a local Seq collapses to LocalRelation in the
    * EARLY optimizer batch, before injected rules run, leaving no
    * projection for the rule (or the plan assertion) to see.
    */
  private def rangeToks(s: SparkSession) =
    s.range(1, 4).selectExpr("id",
      """CASE WHEN id = 1 THEN array('the', 'cat', 'on', 'the', 'mat')
              WHEN id = 2 THEN array('dog', CAST(NULL AS STRING))
              ELSE CAST(NULL AS ARRAY<STRING>) END AS toks""")

  test("top_k_struct is SQL-callable as a grouped aggregate") {
    withExt { s =>
      import s.implicits._
      val got = Seq(
        ("q1", 0.9, 10L), ("q1", 0.7, 11L), ("q1", 0.9, 9L), ("q1", 0.95, 12L),
        ("q2", 0.1, 20L))
        .toDF("q", "score", "id")
        .createOrReplaceTempView("cands")
      val rows = s.sql(
        """SELECT q, top_k_struct(score, id, 2) AS top FROM cands GROUP BY q""")
        .selectExpr("q", "inline(top)")
        .as[(String, Long, Double)].collect().toSet
      // q1 top-2 by (score DESC, id ASC): (12, .95) then the 9-vs-10 tie at
      // .9 resolves to the smaller id
      assert(rows == Set(("q1", 12L, 0.95), ("q1", 9L, 0.9), ("q2", 20L, 0.1)))
    }
  }

  test("bottom_k_struct keeps the k SMALLEST, including string scores") {
    withExt { s =>
      import s.implicits._
      Seq(("g", "0b", 1L), ("g", "0a", 2L), ("g", "0c", 3L), ("g", "0a", 4L))
        .toDF("g", "h", "id").createOrReplaceTempView("hs")
      val rows = s.sql(
        "SELECT g, bottom_k_struct(h, id, 2) AS bot FROM hs GROUP BY g")
        .selectExpr("inline(bot)").as[(Long, String)].collect().toSeq
      // smallest two by (h ASC, id ASC): the "0a" tie keeps id 2 first,
      // then id 4 — best-first order in the emitted array
      assert(rows == Seq((2L, "0a"), (4L, "0a")))
    }
  }

  test("probe_cells is SQL-callable and ranks cells by (cosine DESC, id ASC)") {
    withExt { s =>
      import s.implicits._
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
        .toDF("id", "v").createOrReplaceTempView("pv")
      val rows = s.sql(
        """SELECT id, probe_cells(v,
          |  array('cx', 'cy'),
          |  array(array(1.0D, 0.0D), array(0.0D, 1.0D)), 1) AS cells
          |FROM pv""".stripMargin)
        .selectExpr("id", "cells[0]").as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "cx"), (2L, "cy")))
    }
  }

  test("probe_cells scores a dimension-mismatched centroid -Inf — it can " +
       "never out-rank a real cosine, even an all-negative one") {
    withExt { s =>
      import s.implicits._
      // v = (-1, 0): cosine to cgood = -1 (the worst real score); the
      // 3-component ccorrupt must still lose (pre-fix it scored 0.0 and won)
      Seq((1L, Array(-1.0f, 0.0f))).toDF("id", "v").createOrReplaceTempView("pm")
      val rows = s.sql(
        """SELECT probe_cells(v,
          |  array('cgood', 'ccorrupt'),
          |  array(array(1.0D, 0.0D), array(1.0D, 0.0D, 0.0D)), 1) AS cells
          |FROM pm""".stripMargin)
        .selectExpr("cells[0]").as[String].collect().toSeq
      assert(rows == Seq("cgood"))
    }
  }

  test("min_dist_to_set is SQL-callable and skips mismatched centers like " +
       "least() over sq_dist_lit") {
    withExt { s =>
      import s.implicits._
      Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 3.0)))
        .toDF("id", "v").createOrReplaceTempView("mds")
      val rows = s.sql(
        """SELECT id, min_dist_to_set(v,
          |  array(array(0.0D, 0.0D), array(0.0D, 4.0D), array(9.0D))) AS d
          |FROM mds""".stripMargin)
        .as[(Long, Double)].collect().toMap
      // id 1: min(1, 17) = 1; id 2: min(9, 1) = 1; the 1-dim center skips
      assert(rows == Map(1L -> 1.0, 2L -> 1.0))
    }
  }

  test("nearest_center and dist_map are SQL-callable") {
    withExt { s =>
      import s.implicits._
      Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 3.0)))
        .toDF("id", "v").createOrReplaceTempView("ncv")
      val rows = s.sql(
        """SELECT id, nearest_center(v, array(10, 20),
          |  array(array(0.0D, 0.0D), array(0.0D, 4.0D))) AS nc
          |FROM ncv""".stripMargin)
        .selectExpr("id", "nc.cid", "nc.dist2")
        .as[(Long, Int, Double)].collect().toSet
      // id 1: d²=(1, 17) → cid 10; id 2: d²=(9, 1) → cid 20
      assert(rows == Set((1L, 10, 1.0), (2L, 20, 1.0)))
      val ds = s.sql(
        """SELECT element_at(dm, 7) AS d7, element_at(dm, 8) AS d8 FROM (
          |  SELECT dist_map(v, array(7, 8),
          |    array(array(0.0D, 0.0D), array(9.0D))) AS dm
          |  FROM ncv WHERE id = 1)""".stripMargin)
        .as[(Option[Double], Option[Double])].head()
      assert(ds == (Some(1.0), None)) // mismatched center → null value
    }
  }

  test("kmv_set is SQL-callable and distinct-bounded") {
    withExt { s =>
      import s.implicits._
      Seq(9L, 9L, 1L, 5L, 1L, 7L, 3L).toDF("h").createOrReplaceTempView("kv")
      val got = s.sql("SELECT kmv_set(h, 3) AS k FROM kv").as[Seq[Long]].head()
      assert(got == Seq(1L, 3L, 5L)) // distinct 3 smallest, ascending
    }
  }

  test("gram_sum and mat_vec_mul are SQL-callable") {
    withExt { s =>
      import s.implicits._
      Seq((1L, Array(0.5f, -1.25f)), (2L, Array(2.0f, 0.75f)))
        .toDF("id", "v").createOrReplaceTempView("vs")
      // q = floor(v*4): (2,-5), (8,3) → S = [[68,14],[14,34]]
      val g = s.sql("SELECT gram_sum(v, 4.0) AS g FROM vs")
        .as[Seq[Long]].head()
      assert(g == Seq(68L, 14L, 14L, 34L))
      val r = s.sql(
        """SELECT mat_vec_mul(v, array(array(0.0D, 1.0D), array(1.0D, 0.0D))) AS r
          |FROM vs WHERE id = 1""".stripMargin).as[Seq[Float]].head()
      assert(r == Seq(-1.25f, 0.5f)) // the swap matrix swaps components
    }
  }

  test("max_sim_score is SQL-callable") {
    withExt { s =>
      import s.implicits._
      Seq((Array(Array(1.0, 2.0)), Array(Array(2.0, 1.0), Array(3.0, 0.0))))
        .toDF("q", "d").createOrReplaceTempView("ms")
      val got = s.sql("SELECT max_sim_score(q, d) AS x FROM ms")
        .as[Double].head()
      assert(got == 4.0, s"max(1·2+2·1, 1·3+2·0) = 4, got $got")
    }
  }

  test("sum_vecs and double_vector_dot are SQL-callable") {
    withExt { s =>
      import s.implicits._
      Seq((Array(Array(1.0, 2.0), Array(3.0, -1.0)), Array(2.0, 2.0)))
        .toDF("m", "v").createOrReplaceTempView("sv")
      val pooled = s.sql("SELECT sum_vecs(m) AS p FROM sv")
        .as[Seq[Double]].head()
      assert(pooled == Seq(4.0, 1.0))
      val dp = s.sql("SELECT double_vector_dot(sum_vecs(m), v) AS d FROM sv")
        .as[Double].head()
      assert(dp == 10.0, s"(4,1)·(2,2) = 10, got $dp")
    }
  }

  test("FuseCountInSet rewrites the HOF stopword-count shape (array_contains and IN)") {
    withExt { s =>
      import s.implicits._
      val df = rangeToks(s)
      for (pred <- Seq("array_contains(array('the', 'on'), t)", "t IN ('the', 'on')")) {
        val q = df.selectExpr("id", s"size(filter(toks, t -> $pred)) AS n")
        assert(hasCountInSet(q), s"no CountInSet in plan for: $pred")
        val got = q.as[(Long, Option[Int])].collect().toMap
        assert(got == Map(1L -> Some(3), 2L -> Some(0), 3L -> None))
      }
    }
  }

  test("FuseCountInSet leaves legacy size and non-membership lambdas alone") {
    withExt { s =>
      import s.implicits._
      val df = rangeToks(s)
      // legacy size(NULL) = -1 ≠ CountInSet's NULL: the rule must not fire.
      // ANSI mode forces legacySizeOfNull to false, so drop to legacy fully.
      val ansi0 = s.conf.get("spark.sql.ansi.enabled")
      s.conf.set("spark.sql.ansi.enabled", "false")
      s.conf.set("spark.sql.legacy.sizeOfNull", "true")
      try {
        val q = df.selectExpr("id", "size(filter(toks, t -> array_contains(array('the'), t))) AS n")
        assert(!hasCountInSet(q))
        assert(q.as[(Long, Int)].collect().toMap ==
          Map(1L -> 2, 2L -> 0, 3L -> -1))
      } finally {
        s.conf.set("spark.sql.legacy.sizeOfNull", "false")
        s.conf.set("spark.sql.ansi.enabled", ansi0)
      }
      // a predicate that is not a membership test of the lambda var
      val q2 = df.selectExpr("id", "size(filter(toks, t -> t > 'cat')) AS n")
      assert(!hasCountInSet(q2))
      assert(q2.as[(Long, Option[Int])].collect().toMap ==
        Map(1L -> Some(4), 2L -> Some(1), 3L -> None))
      // the two-argument (element, index) lambda form
      val q3 = df.selectExpr("id",
        "size(filter(toks, (t, i) -> array_contains(array('the'), t))) AS n")
      assert(!hasCountInSet(q3))
      assert(q3.as[(Long, Option[Int])].collect().toMap ==
        Map(1L -> Some(2), 2L -> Some(0), 3L -> None))
    }
  }

  test("fused SQL count equals graft's Scala-path stopword count") {
    withExt { s =>
      import s.implicits._
      val docs = Seq("the cat sat on the mat", "dogs and cats", "").toDF("text")
        .withColumn("toks", split(col("text"), " "))
      val sqlN = docs
        .selectExpr("size(filter(toks, t -> array_contains(array('the', 'on', 'and'), t))) AS n")
        .as[Int].collect().toSeq
      val apiN = docs
        .select(ColumnBridge.column(CountInSet(
          ColumnBridge.expression(col("toks")), Seq("the", "on", "and"))).as("n"))
        .as[Long].collect().toSeq.map(_.toInt)
      assert(sqlN == apiN)
    }
  }
}
