package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Squared L2 distance between an `array<double>` column and a literal
  * centroid, accumulated in double left-to-right.
  *
  * This is the per-row × per-centroid hot loop of the whole similarity
  * family: k-means assignment evaluates it k times per row
  * ([[graft.similarity.Clustering.withCluster]]), PQ code assignment 256·m
  * times per row ([[graft.similarity.Pq.assignCodes]]), and both previously
  * used `aggregate(zip_with(v, cv, (a,b) => a-b), 0.0, (acc,d) => acc+d*d)`
  * — two nested lambdas, and higher-order functions are CodegenFallback, so
  * ONE of them dropped the entire assignment projection out of whole-stage
  * codegen into interpreted eval with per-element boxing.
  *
  * Semantics match that HOF form EXACTLY: same IEEE operation order
  * (d = a_i − c_i, acc += d·d, left to right — the determinism contract
  * shared with the DuckDB oracle's `list_transform` fold); null input
  * array → null; a null ELEMENT → null (the null difference poisons the
  * running sum); length mismatch → null (zip_with pads with nulls).
  */
case class SqDistLit(child: Expression, cv: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist_lit"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != cv.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getDouble(i) - cv(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.addReferenceObj("cv", cv, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != ${cv.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $arr[$i];
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqDistLit =
    copy(child = newChild)
}
