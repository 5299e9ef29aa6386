package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, TypeCollection}

/** Random-hyperplane signature against a literal plane matrix — the LSH
  * bucketing primitive for cosine similarity ([[graft.functions.Vectors
  * .hyperplaneSignature]]): bit j is 1 iff vec · planes(j) ≥ 0.
  *
  * Previously `transform(planes, p => when(dot(vec, p) >= 0, 1).otherwise(0))`
  * with the HOF `dot` — nested lambdas, hence CodegenFallback, so the
  * corpus-wide signature scan behind [[graft.dedup.Dedup.cosineNearDupLsh]]
  * and [[graft.similarity.Ann.lshTopK]] ran interpreted with per-element
  * boxing. Here all numPlanes · dim multiply-adds run in one fused loop.
  *
  * Dot semantics mirror the HOF form exactly: per-element cast to double,
  * accumulate left-to-right; a null element or a vec/plane length mismatch
  * poisons that plane's dot to null, and `when(null >= 0)` is not-true, so
  * the bit is 0. ONE deliberate difference: a NULL input vector returns
  * NULL here, where the HOF form returned the all-zeros signature (it
  * transforms over the non-null planes literal) and thereby BUCKETED null
  * vectors together — almost certainly unwanted. Embeddings are non-null
  * in every oracled path, so the outputs are identical where it matters.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = childIsFloat
    val bits = new Array[Int](planes.length)
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      if (n == p.length) {
        var acc = 0.0
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (a.isNullAt(i)) ok = false
          else {
            val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
            acc += x * p(i)
          }
          i += 1
        }
        if (ok && acc >= 0.0) bits(j) = 1
      }
      j += 1
    }
    new GenericArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val ok = ctx.freshName("ok")
      val bits = ctx.freshName("bits")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |int[] $bits = new int[${planes.length}];
         |for (int $j = 0; $j < ${planes.length}; $j++) {
         |  double[] $p = $pl[$j];
         |  if ($n == $p.length) {
         |    double $acc = 0.0;
         |    boolean $ok = true;
         |    for (int $i = 0; $ok && $i < $n; $i++) {
         |      if ($a.isNullAt($i)) { $ok = false; }
         |      else { $acc += ($get) * $p[$i]; }
         |    }
         |    if ($ok && $acc >= 0.0) $bits[$j] = 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
