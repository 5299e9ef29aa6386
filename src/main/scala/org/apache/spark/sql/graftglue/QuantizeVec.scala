package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Elementwise `floor(x · scale)` over a float or double vector — the
  * quantization step of the similarity family's determinism contract
  * ([[graft.similarity.Clustering.quantize]]: integral doubles sum exactly,
  * so centroid means are partition-order-independent and engine-portable).
  *
  * Previously `transform(vec, x => floor(x.cast(double) * scale))` — a
  * higher-order function, hence CodegenFallback. Because Catalyst's
  * CollapseProject inlines the quantized column into the SAME projection
  * as the [[SqDistLit]] candidates, that single lambda was enough to keep
  * the whole k-means/PQ assignment projection interpreted; nativizing
  * [[SqDistLit]] alone would not restore fusion.
  *
  * Semantics match the HOF form exactly: cast-to-double then multiply then
  * `Math.floor`, per element; a null ELEMENT stays a null element (transform
  * maps nulls through); null input array → null.
  */
case class QuantizeVec(child: Expression, scale: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType =
    ArrayType(DoubleType, child.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "quantize_vec"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n)
    val isFloat = childIsFloat
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(x * scale)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = java.lang.Math.floor(($get) * $scale);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}
