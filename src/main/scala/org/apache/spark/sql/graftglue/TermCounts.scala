package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document term frequencies: `term_counts(tokens)` folds an
  * `array<string>` into `array<struct<term string, tf bigint>>` — one
  * struct per DISTINCT token, in first-occurrence order, `tf` its
  * occurrence count.
  *
  * This is the posting-row generator of the lexical-index family
  * (`Search.writeLexIndex` / `lexIndexDelta`): term frequency is a
  * function of ONE document's token array, so counting it per row and
  * exploding the result replaces the `explode → groupBy(id, dl, term)`
  * formulation — which shuffles the whole exploded corpus just to count
  * within-document duplicates — with a zero-exchange projection
  * (guide §2.4: remove shuffles outright). At 100 TB that is a
  * corpus-sized exchange deleted from every index build; the only
  * remaining shuffle is the bucket-layout repartition that the write
  * needs anyway.
  *
  * Equivalence with the groupBy form (same rows, any order) holds when
  * `id` is unique per input row — the corpus contract every caller
  * already relies on (a duplicated id would double-count `dl` in the
  * groupBy form too). Null ARRAY → null (explode then drops the row,
  * exactly as explode over a null array emits nothing); empty array →
  * empty array (no posting rows either way); null ELEMENTS count under
  * one null key, as groupBy groups nulls.
  */
case class TermCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_counts"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftglue.TermCounts.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  /** Shared by interpreted eval and codegen: one pass, first-occurrence
    * order (LinkedHashMap), so the output is a pure deterministic function
    * of the token array.
    */
  def compute(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    // null sentinel keeps one LinkedHashMap pass handling null elements in
    // first-occurrence order too (UTF8String keys are never this object)
    val counts =
      new java.util.LinkedHashMap[AnyRef, java.lang.Long](math.max(8, n))
    var i = 0
    while (i < n) {
      val key: AnyRef = if (toks.isNullAt(i)) NullKey else toks.getUTF8String(i)
      val prev = counts.get(key)
      counts.put(key, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val term = if (e.getKey eq NullKey) null else e.getKey
      out(j) = InternalRow(term, e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }

  private object NullKey
}
