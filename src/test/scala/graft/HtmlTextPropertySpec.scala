package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** Randomized cross-implementation check for [[Text.htmlToText]] (r14 —
  * the JsonSchemaPropertySpec device applied to the OTHER shared-source
  * oracle): the DuckDB replay (`htmlCleanSql`) is built from the SAME
  * entity list and a hand-mirrored regex chain, so a wrong entity
  * mapping or a chain-order bug would pass the oracle on both engines.
  * This INDEPENDENT reference — character scanners, no regexes, the
  * entity table retyped from the documented semantics — must produce
  * the exact extraction the Spark column does over randomized gnarly
  * markup (nested/unterminated blocks, uppercase tags, comments hiding
  * tags, scripts hiding close-tags, double-encoded entities, `<>`
  * non-tags, vertical tabs that must SURVIVE the whitespace collapse).
  *
  * Semantics mirrored (the scaladoc contract of htmlToText):
  *  1. strip `<script[^>]*>.*?</script>` (dotall, ASCII-case-insensitive,
  *     lazy) with contents → " "; then `<style…>` blocks the same;
  *  2. strip `<!--.*?-->` comments → " ";
  *  3. strip remaining `<[^>]+>` tags (at least ONE non-'>' char — `<>`
  *     is not a tag) → " ";
  *  4. decode entities IN CHAIN ORDER (nbsp, lt, gt, quot, #39, amp —
  *     amp LAST, so `&amp;lt;` decodes to the text `&lt;`, not `<`);
  *  5. collapse `[ \t\n\r\f]+` runs to one space (NOT `` — Java's
  *     `\s` includes it, RE2's does not, so the class is explicit) and
  *     trim spaces.
  */
class HtmlTextPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---------------- independent reference extractor ----------------

  /** ASCII-only lowercase that preserves offsets (String.toLowerCase can
    * CHANGE LENGTH — U+0130 lowers to two chars — and the regex chain's
    * `(?i)` folds ASCII only, so this is also the faithful semantics).
    */
  private def asciiLower(s: String): String =
    s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  /** strip case-insensitive `<tag…>` blocks WITH contents, mirroring the
    * lazy dotall regex: an open with no `</tag>` anywhere after its `>`
    * never matches (and then no later open can either).
    */
  private def stripBlocks(s: String, tag: String): String = {
    val lower = asciiLower(s)
    val open = "<" + tag
    val close = "</" + tag + ">"
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (!done && i <= s.length) {
      val at = lower.indexOf(open, i)
      if (at < 0) { sb.append(s.substring(i)); done = true }
      else {
        val gt = s.indexOf('>', at)
        val closeAt = if (gt < 0) -1 else lower.indexOf(close, gt + 1)
        if (gt < 0 || closeAt < 0) { sb.append(s.substring(i)); done = true }
        else {
          sb.append(s.substring(i, at)).append(' ')
          i = closeAt + close.length
        }
      }
    }
    sb.toString
  }

  /** strip `<!--.*?-->` (lazy dotall): the `-->` search starts after the
    * full `<!--`, so `<!-->` is not a complete comment.
    */
  private def stripComments(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (!done && i <= s.length) {
      val at = s.indexOf("<!--", i)
      if (at < 0) { sb.append(s.substring(i)); done = true }
      else {
        val end = s.indexOf("-->", at + 4)
        if (end < 0) { sb.append(s.substring(i)); done = true }
        else {
          sb.append(s.substring(i, at)).append(' ')
          i = end + 3
        }
      }
    }
    sb.toString
  }

  /** strip `<[^>]+>`: at least one non-'>' char between the brackets —
    * `<>` is NOT a tag and its '<' survives; an unterminated '<' survives.
    */
  private def stripTags(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (!done && i <= s.length) {
      val at = s.indexOf('<', i)
      if (at < 0) { sb.append(s.substring(i)); done = true }
      else {
        val gt = s.indexOf('>', at + 1)
        if (gt < 0) { sb.append(s.substring(i)); done = true }
        else if (gt == at + 1) { // "<>": not a tag, keep the '<' and move on
          sb.append(s.substring(i, at + 1))
          i = at + 1
        } else {
          sb.append(s.substring(i, at)).append(' ')
          i = gt + 1
        }
      }
    }
    sb.toString
  }

  /** the entity chain, retyped from the documented semantics (NOT read
    * from Text.htmlEntities — independence is the point), applied in
    * chain order with amp last.
    */
  private def decodeEntities(s: String): String = s
    .replace("&nbsp;", " ")
    .replace("&lt;", "<")
    .replace("&gt;", ">")
    .replace("&quot;", "\"")
    .replace("&#39;", "'")
    .replace("&amp;", "&")

  /** collapse [ \t\n\r\f]+ runs to one space; trim SPACES only (after the
    * collapse every run is a single ' ', and  must survive).
    */
  private def collapseWs(s: String): String = {
    val sb = new StringBuilder
    var inRun = false
    s.foreach { c =>
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!inRun) sb.append(' ')
        inRun = true
      } else { sb.append(c); inRun = false }
    }
    var a = 0; var b = sb.length
    while (a < b && sb.charAt(a) == ' ') a += 1
    while (b > a && sb.charAt(b - 1) == ' ') b -= 1
    sb.substring(a, b)
  }

  private def reference(html: String): String =
    collapseWs(decodeEntities(stripTags(stripComments(
      stripBlocks(stripBlocks(html, "script"), "style")))))

  // -------------------------- generator ---------------------------

  private val rnd = new scala.util.Random(20260816L)
  private def pick[T](v: Vector[T]): T = v(rnd.nextInt(v.size))

  private val fragments: Vector[String] = Vector(
    "plain text", "x &amp;&amp; y", "&amp;lt;double&amp;gt;", "&lt;tag&gt;",
    "&quot;q&quot;&nbsp;end", "&#39;apos&#39;", "ab", "𝒳 astral ‖ text",
    "<p class=\"x\">para</p>", "<DIV>upper</DIV>", "<br/>", "<a\nhref=\"/x\">l</a>",
    "<>not a tag", "<<>>", "< 3 is small", "unterminated <tag",
    "<script>var x = '</div>';</script>", "<SCRIPT TYPE=x>if (a<b) {}</SCRIPT>",
    "<scriptish>looks like script</scriptish>",
    "<script>no close ever",
    "<style>p { color: red; }</style>", "<STYLE media=x>.a{}</STYLE>",
    "<!-- comment with <p>tag</p> inside -->", "<!-- unterminated comment",
    "<!---->", "<!-->", "tab\there", "line\nbreak", "ff\fchar", "cr\rchar",
    "  multiple   spaces  ", "&nbsp;&nbsp;", "a&gt;b&lt;c",
    "<script>a<script>nested</script>", "text]]>junk")

  // ----------------------------- test ------------------------------

  test("htmlToText matches an independent scanner reference over " +
       "randomized markup (60 docs x 5-15 fragments)") {
    val docs: Seq[(Long, String)] = (0L until 60L).map { i =>
      val n = 5 + rnd.nextInt(11)
      (i, (0 until n).map(_ => pick(fragments)).mkString(
        pick(Vector(" ", "", "\n", "\t"))))
    }
    val got = docs.toDF("id", "html")
      .select(col("id"), Text.htmlToText(col("html")).as("t"))
      .as[(Long, String)].collect().toMap
    docs.foreach { case (i, html) =>
      val want = reference(html)
      assert(got(i) == want,
        s"html=<<$html>>\ngate='${got(i)}'\nref ='$want'")
    }
  }
}
