package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-shingling: `word_shingles(tokens, k)` yields the
  * `n - k + 1` space-joined k-grams of an `array<string>` (empty array when
  * `n < k`).
  *
  * The HOF formulation — `transform(sequence(0, n-k), i ->
  * array_join(slice(tokens, i+1, k), ' '))` — is THE hot loop of every
  * shingle-based dedup query (per document × per token position, each
  * evaluation an interpreted lambda dispatch plus a `slice` allocation).
  * This expression emits one fused loop into whole-stage codegen: per
  * window, a single `UTF8String.concatWs` over an index range, no
  * intermediate slice arrays, no lambda frames.
  *
  * Semantics match the HOF chain EXACTLY (null tokens are skipped by
  * `concatWs`, as `array_join` skips them; null input array → null), so
  * swapping it into `Dedup.shingleRows` changes no oracle result.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullable: Boolean = true

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val toks = l.asInstanceOf[ArrayData]
    val k = r.asInstanceOf[Int]
    if (k <= 0) return null
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, kVar) => {
      val sepRef = ctx.addReferenceObj("shingleSep", sep, classOf[UTF8String].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val u8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |if ($kVar <= 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  if ($n < $kVar) {
         |    ${ev.value} = new $gad(new Object[0]);
         |  } else {
         |    Object[] $out = new Object[$n - $kVar + 1];
         |    for (int $i = 0; $i <= $n - $kVar; $i++) {
         |      $u8[] $parts = new $u8[$kVar];
         |      for (int $j = 0; $j < $kVar; $j++) {
         |        $parts[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |      }
         |      $out[$i] = $u8.concatWs($sepRef, $parts);
         |    }
         |    ${ev.value} = new $gad($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}
