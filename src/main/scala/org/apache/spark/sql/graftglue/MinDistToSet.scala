package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Minimum squared L2 distance from an `array<double>` column to a SET of
  * literal centers — the per-round hot expression of
  * [[graft.similarity.Clustering.kCenterGreedy]] (farthest-point
  * selection scans the corpus once per pick, against every center picked
  * so far).
  *
  * Previously `least()` over one [[SqDistLit]] per center, each embedding
  * its center as a dim-length literal with a full distance expansion — the
  * expression TREE grew linearly with the picked count, so plan size,
  * analysis, and Janino time per round were O(picked · dim) and the whole
  * k-round run paid O(k² · dim) literal work: exactly the plan-size
  * pathology [[ProbeCells]] removed for IVF routing (nlist = 256 went from
  * plan-explosive to 0.56 s — plans/SCALE.md r8.5). Here the center matrix
  * rides as ONE reference object, the plan is constant size in the center
  * count, and the scoring loop is compiled Scala invoked from the
  * generated code — the surrounding stage stays whole-stage-codegen'd
  * (NOT a CodegenFallback).
  *
  * Semantics are IDENTICAL to `least(SqDistLit(v, c₁), …)`, bit for bit:
  * each matching-length center contributes `Σ (v_i − c_i)²` accumulated in
  * double left-to-right (the [[SqDistLit]] fold — the shared
  * [[graft.similarity.Clustering]] determinism contract); a
  * length-MISMATCHED center is skipped (its SqDistLit was null, and
  * `least` skips nulls); a null input array — or a null element, which
  * nulled every SqDistLit — is NULL, as is an input no center matches.
  * The min uses Spark's double order (NaN greatest, -0.0 = 0.0), matching
  * `least` on NaN-bearing inputs.
  */
case class MinDistToSet(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(centers.nonEmpty, "min_dist_to_set: center set must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "min_dist_to_set"
  override def nullable: Boolean = true

  /** Spark double order: NaN greatest, -0.0 = 0.0 (least's skip-nulls +
    * ordering semantics, minus the nulls this expression never produces
    * per-center).
    */
  private def lessThan(x: Double, y: Double): Boolean =
    if (x < y) true
    else if (x > y || x == y) false
    else y != y && x == x // y is NaN, x is not

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      x(i) = a.getDouble(i)
      i += 1
    }
    var best = 0.0
    var found = false
    var c = 0
    while (c < centers.length) {
      val cv = centers(c)
      if (cv.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) { val d = x(k) - cv(k); acc += d * d; k += 1 }
        if (!found || lessThan(acc, best)) { best = acc; found = true }
      }
      c += 1
    }
    if (found) best else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the distance loop runs as compiled Scala via a reference object —
      // constant generated-code size no matter the center count; the
      // enclosing stage stays fused
      val ref = ctx.addReferenceObj("minDistToSet", this,
        classOf[MinDistToSet].getName)
      s"""
         |Object md = $ref.nullSafeEval($a);
         |if (md == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) md).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinDistToSet =
    copy(child = newChild)
}
