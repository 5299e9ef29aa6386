package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Element-wise sum of a matrix's row vectors: array<array<double>> →
  * array<double> — the SUM-pooling step of two-stage late-interaction
  * retrieval ([[graft.similarity.MaxSim.maxSimTopKPooled]]): dot(Σqᵢ, Σdⱼ)
  * = ΣᵢΣⱼ⟨qᵢ,dⱼ⟩, so one pooled dot per pair screens candidates at
  * dim-cost instead of the tokens²·dim exact interaction.
  *
  * On QUANTIZED (integral-double) inputs every addition is exact below
  * 2^53, so pooled vectors and their dots replay bit-for-bit in SQL.
  *
  * Null/edge device (the [[FloatVectorDot]] contract): null input → null;
  * null row vector or null component → null; rows of differing lengths →
  * null; an EMPTY matrix → null (a sum over no vectors has no width).
  */
case class SumVecs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sum_vecs"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val m = v.asInstanceOf[ArrayData]
    val n = m.numElements()
    if (n == 0) return null
    if (m.isNullAt(0)) return null
    val first = m.getArray(0)
    val dim = first.numElements()
    val out = new Array[Double](dim)
    var i = 0
    while (i < n) {
      if (m.isNullAt(i)) return null
      val row = m.getArray(i)
      if (row.numElements() != dim) return null
      var j = 0
      while (j < dim) {
        if (row.isNullAt(j)) return null
        out(j) += row.getDouble(j)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.map(Double.box(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dim = ctx.freshName("dim")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      val boxed = ctx.freshName("boxed")
      val done = ctx.freshName("done")
      s"""
         |int $n = $m.numElements();
         |if ($n == 0 || $m.isNullAt(0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $dim = $m.getArray(0).numElements();
         |  double[] $out = new double[$dim];
         |  boolean $done = false;
         |  for (int $i = 0; $i < $n && !$done; $i++) {
         |    if ($m.isNullAt($i)) { ${ev.isNull} = true; $done = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $m.getArray($i);
         |    if ($row.numElements() != $dim) { ${ev.isNull} = true; $done = true; break; }
         |    for (int $j = 0; $j < $dim; $j++) {
         |      if ($row.isNullAt($j)) { ${ev.isNull} = true; $done = true; break; }
         |      $out[$j] += $row.getDouble($j);
         |    }
         |  }
         |  if (!$done) {
         |    Object[] $boxed = new Object[$dim];
         |    for (int $j = 0; $j < $dim; $j++) $boxed[$j] = $out[$j];
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumVecs =
    copy(child = newChild)
}
