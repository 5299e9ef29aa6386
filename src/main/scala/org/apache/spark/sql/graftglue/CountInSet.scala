package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count array elements that are members of a literal string set — the
  * stopword-ratio primitive of language ID and quality scoring.
  *
  * The HOF form `size(filter(toks, t => t.isin(words)))` is a lambda, and
  * lambdas are CodegenFallback: ONE of them in a projection disqualifies
  * the whole projection from whole-stage codegen, so a corpus-wide scoring
  * pass (langId evaluates it once per language per row) drops to
  * interpreted eval with per-element boxing and an O(|words|) isin chain.
  * Here membership is one hash probe per element against a reference-object
  * HashSet inside generated code, and the projection stays fused.
  *
  * Null array → null; a null ELEMENT counts as a miss (exactly what the
  * HOF form does: a null isin-predicate is not-true, so filter drops it).
  */
case class CountInSet(child: Expression, items: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) hits += 1L
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("set", set, "java.util.HashSet")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hits = ctx.freshName("hits")
      s"""
         |int $n = $a.numElements();
         |long $hits = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $s.contains($a.getUTF8String($i))) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}
