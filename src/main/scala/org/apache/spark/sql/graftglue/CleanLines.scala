package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C4-style line-level cleaning (Raffel et al., JMLR 2020 §2.2) as ONE
  * native codegen expression: split the document on newlines, keep only
  * lines that
  *
  *   1. end in a terminal character (after right-trimming spaces) — the
  *      "retained lines ended in terminal punctuation" rule;
  *   2. have at least `minWords` whitespace-separated words;
  *   3. contain none of the `banned` substrings (compared lowercase) —
  *      the "javascript" / cookie-notice rule;
  *
  * and rejoin survivors with `\n`. Returns the cleaned string ('' when
  * nothing survives — the caller decides whether empty docs drop, same
  * posture as spanDedupClean's empty rows).
  *
  * Why a native expression: the natural `array_join(filter(split(...)))`
  * spelling puts a lambda HOF in a corpus-scale projection — filter() is
  * CodegenFallback, and ONE fallback drops the WHOLE projection out of
  * whole-stage codegen (the r6 fusion-sweep lesson). Here the rules run in
  * one compiled loop per row, rule parameters ride as reference objects,
  * and the projection stays fused (spec-pinned).
  *
  * Determinism: pure string/loop logic over code units — a DuckDB
  * `list_filter` lambda with the same three predicates reproduces it
  * exactly (q_c4_clean). Null input → null. Lowercasing for the banned
  * check is `String.toLowerCase(Locale.ROOT)` — locale-pinned so a Turkish
  * default locale can't change which lines die.
  */
case class CleanLines(child: Expression, minWords: Int, terminals: String,
                      banned: Seq[String]) extends UnaryExpression with ExpectsInputTypes {

  require(minWords >= 0, s"clean_lines: minWords must be >= 0, got $minWords")
  require(terminals.nonEmpty, "clean_lines: empty terminal-character set")
  require(banned.forall(b => b.nonEmpty && b == b.toLowerCase(java.util.Locale.ROOT)),
    "clean_lines: banned substrings must be non-empty and lowercase")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "clean_lines"

  @transient private lazy val terminalSet: Set[Char] = terminals.toSet
  @transient private lazy val bannedArr: Array[String] = banned.toArray

  /** Shared eval/codegen body (public for the generated code). */
  def doClean(v: UTF8String): UTF8String = {
    val lines = v.toString.split("\n", -1)
    val sb = new java.lang.StringBuilder
    var first = true
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (keep(line)) {
        if (!first) sb.append('\n')
        sb.append(line)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def keep(line: String): Boolean = {
    // rule 1: terminal character, ignoring trailing spaces
    var end = line.length
    while (end > 0 && line.charAt(end - 1) == ' ') end -= 1
    if (end == 0 || !terminalSet.contains(line.charAt(end - 1))) return false
    // rule 2: word count — SPACE-separated runs, empties don't count.
    // Deliberately space-only (not \t): the count is then exactly
    // `len(list_filter(string_split(l, ' '), w -> w <> ''))`, the oracle's
    // lambda, with no engine-specific whitespace-class nuance.
    var words = 0
    var inWord = false
    var j = 0
    while (j < end) {
      if (line.charAt(j) == ' ') inWord = false
      else if (!inWord) { words += 1; inWord = true }
      j += 1
    }
    if (words < minWords) return false
    // rule 3: banned substrings, lowercase
    val lower = line.toLowerCase(java.util.Locale.ROOT)
    var b = 0
    while (b < bannedArr.length) {
      if (lower.contains(bannedArr(b))) return false
      b += 1
    }
    true
  }

  override def nullSafeEval(v: Any): Any = doClean(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val self = ctx.addReferenceObj("cleanLines", this, classOf[CleanLines].getName)
      s"${ev.value} = $self.doClean($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): CleanLines =
    copy(child = newChild)
}
