package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns, accumulated in double
  * left-to-right.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are interpreted —
  * per-element lambda dispatch with boxing, and they break whole-stage
  * codegen around them. For ANN scoring the dot product is THE hot loop
  * (corpus × queries × dim evaluations), so this is the textbook case for a
  * custom Catalyst expression with `doGenCode`: a primitive float loop that
  * fuses into the surrounding generated code.
  *
  * Semantics match `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)),
  * 0.0, (acc,x) => acc+x)` EXACTLY, including the degenerate cases: same
  * IEEE operation order; null input array → null; a null element anywhere →
  * null (the HOF's null product poisons the running sum); mismatched lengths
  * → null (zip_with pads the shorter side with nulls). So [[graft.functions
  * .Vectors.dot]] and `fdot` agree on every input.
  *
  * (Lives in an `org.apache.spark.sql` subpackage because `ExpectsInputTypes`
  * uses the `private[sql]` AbstractDataType.)
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // The null checks stay out of the hot path's way: embeddings are
      // containsNull=false in practice, so the branch predicts perfectly.
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}
