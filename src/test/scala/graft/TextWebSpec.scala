package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** G54 (Unicode normalization + encoding stats) and G55 (HTML extraction).
  * Unicode fixtures are built from code points (not source literals) so the
  * suite is independent of source-file encoding.
  */
class TextWebSpec extends SparkSpec {
  import spark.implicits._

  private def cp(points: Int*): String = new String(points.toArray, 0, points.length)

  private val combAcute = cp(0x301) // COMBINING ACUTE ACCENT
  private val aAcute = cp(0xE1)     // á composed
  private val repl = cp(0xFFFD)     // replacement character

  test("normalizeUnicode NFC composes, NFD decomposes, NFKC folds compat") {
    val df = Seq(
      ("a" + combAcute) + " plain",  // decomposed -> composes
      aAcute + " x",                 // already NFC -> unchanged
      cp(0xFB01) + "sh",             // LATIN SMALL LIGATURE FI
      cp(0xFF21) + "scii"            // FULLWIDTH LATIN CAPITAL A
    ).toDF("t")
    val nfc = df.select(Text.normalizeUnicode(col("t"))).as[String].collect()
    assert(nfc(0) == aAcute + " plain")
    assert(nfc(1) == aAcute + " x")
    assert(nfc(2) == cp(0xFB01) + "sh")   // NFC keeps compatibility chars
    val nfkc = df.select(Text.normalizeUnicode(col("t"), "NFKC")).as[String].collect()
    assert(nfkc(2) == "fish")             // NFKC folds the ligature
    assert(nfkc(3) == "Ascii")            // ... and fullwidth forms
    val nfd = Seq(aAcute).toDF("t")
      .select(Text.normalizeUnicode(col("t"), "NFD")).as[String].head()
    assert(nfd == "a" + combAcute)
    // null in, null out; invalid form is a construction-time error
    assert(Seq[Option[String]](None).toDF("t")
      .select(Text.normalizeUnicode(col("t"))).collect()(0).isNullAt(0))
    intercept[IllegalArgumentException] {
      Text.normalizeUnicode(col("t"), "NFX")
    }
  }

  test("normalizeUnicode stays codegen-fused over a real scan") {
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(Text.normalizeUnicode(col("text"))).queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"projection not codegen-fused:\n$plan")
  }

  test("encodingStats counts replacement/control/non-ascii and NFC drift") {
    val s = "ab" + repl + cp(0x1) + "\tc" + aAcute + "e" + combAcute
    // 9 code points: a b U+FFFD U+0001 TAB c U+00E1 e U+0301
    val row = Seq(s).toDF("t")
      .select(Text.encodingStats(col("t")): _*)
      .as[(Long, Long, Long, Double, Long)].head()
    assert(row._1 == 9L)                      // n_chars (code points)
    assert(row._2 == 1L)                      // one U+FFFD
    assert(row._3 == 1L)                      // 0x01 counts, TAB does not
    assert(row._4 == 3.0 / 9.0)               // FFFD, á, U+0301
    assert(row._5 == 1L)                      // e+combining recomposes under NFC
    val clean = Seq("just ascii").toDF("t")
      .select(Text.encodingStats(col("t")): _*)
      .as[(Long, Long, Long, Double, Long)].head()
    assert(clean == ((10L, 0L, 0L, 0.0, 0L)))
  }

  test("scriptStats counts block ranges and argmaxes main_script") {
    val cyr = cp(0x41F, 0x440, 0x438) // При
    val han = cp(0x4E16, 0x754C)      // 世界
    val kana = cp(0x3042)             // あ
    val rows = Seq(
      "plain ascii words",
      cyr + cyr + " ab",              // cyrillic 6 > latin 2
      han + kana + " x" + cyr,        // cjk 3 vs cyrillic 3 vs latin 1 -> tie: cjk (name asc)
      "12345 .,;"                     // no letters at all
    ).toDF("t").select(Text.scriptStats(col("t")): _*)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    assert(rows(0) == ((0L, 0L, 0L, 0L, 0L, 15L, "latin")))
    assert(rows(1)._3 == 6L && rows(1)._6 == 2L && rows(1)._7 == "cyrillic")
    assert(rows(2)._2 == 3L && rows(2)._3 == 3L && rows(2)._7 == "cjk")
    assert(rows(3)._7 == "none")
  }

  test("htmlToText strips script/style/comments/tags and decodes entities") {
    val html = "<html><head><SCRIPT type=\"a\">\nvar x = 1 < 2;\n</SCRIPT>" +
      "<script>two()</script><style>p { }</style></head>\n" +
      "<body><!-- note --><h1>T</h1><p>a &amp;&amp; b &lt;x&gt;&nbsp;" +
      "&quot;q&quot; &#39;s&#39; &amp;lt;raw</p><a\nhref=\"u\">l</a></body></html>"
    val got = Seq(html).toDF("h").select(Text.htmlToText(col("h"))).as[String].head()
    assert(got == "T a && b <x> \"q\" 's' &lt;raw l")
    // two adjacent script blocks must strip separately (lazy match), and
    // the '<' inside the first script body must not break tag stripping
    assert(!got.contains("var") && !got.contains("two") && !got.contains("p {"))
    // &amp;lt; decodes ONCE (to &lt;), never twice (to <)
    assert(got.contains("&lt;raw") && !got.contains("<raw"))
    // null in, null out
    assert(Seq[Option[String]](None).toDF("h")
      .select(Text.htmlToText(col("h"))).collect()(0).isNullAt(0))
  }

  test("htmlToText keeps whole-stage codegen (ChainedReplace + regex chain)") {
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(Text.htmlToText(col("text"))).queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"projection not codegen-fused:\n$plan")
  }

  test("c4CleanLines applies the three line rules; c4DocOk gates docs") {
    val doc = Seq(
      "Good sentence with words.",      // kept
      "Trailing spaces count.   ",      // kept: rtrim before the terminal check
      "short.",                         // dropped: < 3 words
      "no terminal punctuation here",   // dropped: rule 1
      "Enable JavaScript to proceed.",  // dropped: banned (case-insensitive)
      "Ends with a question?",          // kept
      "").mkString("\n")
    val got = Seq(doc).toDF("t").select(Text.c4CleanLines(col("t")))
      .as[String].head()
    assert(got == Seq("Good sentence with words.",
      "Trailing spaces count.   ", "Ends with a question?").mkString("\n"))
    // nothing survives -> empty string, not null
    assert(Seq("x\ny").toDF("t").select(Text.c4CleanLines(col("t")))
      .as[String].head() == "")
    // null in, null out
    assert(Seq[Option[String]](None).toDF("t")
      .select(Text.c4CleanLines(col("t"))).collect()(0).isNullAt(0))
    // knobs: minWords and custom banned list
    assert(Seq("one two.").toDF("t")
      .select(Text.c4CleanLines(col("t"), minWords = 2)).as[String].head() == "one two.")
    assert(Seq("the spark rows here.").toDF("t")
      .select(Text.c4CleanLines(col("t"), banned = Seq("spark"))).as[String].head() == "")
    // banned list must be lowercase (the contract the oracle shares)
    intercept[IllegalArgumentException] {
      Text.c4CleanLines(col("t"), banned = Seq("JavaScript"))
    }
    // doc-level gate
    val ok = Seq("clean doc", "has lorem ipsum inside", "code { here }")
      .toDF("t").select(Text.c4DocOk(col("t"))).as[Boolean].collect().toSeq
    assert(ok == Seq(true, false, false))
    // stays codegen-fused over a real scan
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(Text.c4CleanLines(col("text"))).queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"projection not codegen-fused:\n$plan")
  }

  test("htmlStats counts tags/links/scripts and the visible-text fraction") {
    val html = "<p>hello</p><a href=\"x\">l</a><a\nhref=\"y\">m</a>" +
      "<SCRIPT>s()</SCRIPT><br>"
    val (tags, links, scripts, frac) = Seq(html).toDF("h")
      .select(Text.htmlStats(col("h")): _*)
      .as[(Long, Long, Long, Double)].head()
    assert(tags == 9L)     // p /p a /a a /a SCRIPT /SCRIPT br
    assert(links == 2L)
    assert(scripts == 1L)
    val visible = Seq(html).toDF("h").select(Text.htmlToText(col("h"))).as[String].head()
    assert(visible == "hello l m")
    assert(frac == visible.length.toDouble / html.length.toDouble)
  }
}
