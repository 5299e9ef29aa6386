package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Matrix–vector product against a literal row matrix: out[j] = m(j) · vec —
  * the embedding ROTATION primitive behind [[graft.similarity.Pca.rotate]]
  * (OPQ-style whitening before product quantization). Same fused-loop
  * design as [[HyperplaneSig]] (one codegen'd rows × dim multiply-add
  * loop, matrix as a task-local reference object), but emitting the dots
  * themselves instead of their sign bits.
  *
  * Output is FLOAT — the rotated vector feeds the same array<float>
  * consumers as raw embeddings ([[graft.similarity.Ann]]/[[graft
  * .similarity.Pq]]). Each dot accumulates in double left-to-right, then
  * narrows once — deterministic for a fixed matrix. A row-length mismatch
  * or a null element nulls the OUTPUT (a silently zero-padded rotation
  * would corrupt geometry); a null input vector is null.
  */
case class MatVecMul(child: Expression, m: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(m.nonEmpty && m.forall(_.length == m.head.length),
    "mat_vec_mul: matrix rows must be non-empty and equal length")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec_mul"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != m.head.length) return null
    val isFloat = childIsFloat
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Float](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += row(k) * x(k); k += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("m", m, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val row = ctx.freshName("row")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $mat[0].length);
         |double[] $x = $bad ? null : new double[$n];
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; }
         |  else { $x[$i] = ($get); }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[${m.length}];
         |  for (int $j = 0; $j < ${m.length}; $j++) {
         |    double $acc = 0.0;
         |    double[] $row = $mat[$j];
         |    for (int $k = 0; $k < $n; $k++) { $acc += $row[$k] * $x[$k]; }
         |    $out[$j] = (float) $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MatVecMul =
    copy(child = newChild)
}
