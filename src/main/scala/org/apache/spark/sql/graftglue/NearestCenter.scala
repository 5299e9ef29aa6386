package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Nearest-center assignment of an `array<double>` column against a SET of
  * literal centers → `struct(dist2: double, cid: int)` — the per-row hot
  * expression of k-means assignment
  * ([[graft.similarity.Clustering.withCluster]]) and therefore of
  * SemDeDup's blocking pass and EVERY per-subspace Lloyd round of PQ
  * codebook training ([[graft.similarity.Pq.trainCodebooks]] calls it
  * m × rounds times).
  *
  * Previously `array_min(array(struct(SqDistLit(v, c₁), cid₁), …))` — one
  * struct per center, each embedding its center as a dim-length literal
  * with a full distance expansion, so plan size, analysis, and Janino time
  * scaled with k × dim: the exact pathology [[ProbeCells]] removed for IVF
  * routing (plans/SCALE.md r8.5) and [[MinDistToSet]] removed for k-center
  * rounds (r9.1). A production regime (k-means k in the hundreds for
  * SemDeDup blocks, PQ k = 256 per subspace) was a plan-size wall. Here
  * the (cid, center) set rides as ONE reference object — constant plan
  * size in k, scoring loop in compiled Scala invoked from the generated
  * code; the enclosing stage stays whole-stage-codegen'd.
  *
  * Distance semantics per center are the [[SqDistLit]] fold (d = v_i − c_i,
  * acc += d·d, left to right — the shared determinism contract); the min
  * uses Spark's double order (NaN greatest, -0.0 = 0.0) with ties broken
  * toward the EARLIEST center in the given order (callers pass centers
  * cid-ascending ⇒ min-cid tie-break, matching the struct form's
  * (dist2, cid) ordering). Null input array or null element → null struct.
  *
  * ONE deliberate divergence from the `array_min(struct…)` form, stated
  * rather than papered over (the [[ProbeCells]] review lesson): a
  * length-MISMATCHED center there produced `struct(null, cid)`, and
  * Spark's struct ordering sorts the null dist2 FIRST — a corrupt center
  * silently WON the assignment. Here mismatched centers are skipped (the
  * [[MinDistToSet]] rule), and an input no center matches is null.
  */
case class NearestCenter(child: Expression, cids: Array[Int],
                         centers: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(centers.nonEmpty, "nearest_center: center set must be non-empty")
  require(cids.length == centers.length,
    s"nearest_center: ${cids.length} ids vs ${centers.length} centers")
  // a duplicate cid is a corrupt model (e.g. a codebook join that fanned
  // out) — fail at construction like DistMap, not by iteration-order luck
  require(cids.distinct.length == cids.length, "nearest_center: duplicate cids")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("dist2", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def prettyName: String = "nearest_center"
  override def nullable: Boolean = true

  /** Spark double order: NaN greatest, -0.0 = 0.0. */
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
    var bestCid = 0
    var found = false
    var c = 0
    while (c < centers.length) {
      val cv = centers(c)
      if (cv.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) { val d = x(k) - cv(k); acc += d * d; k += 1 }
        if (!found || lessThan(acc, best)) {
          best = acc; bestCid = cids(c); found = true
        }
      }
      c += 1
    }
    if (found) InternalRow(best, bestCid) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the assignment loop runs as compiled Scala via a reference object —
      // constant generated-code size no matter the center count; the
      // enclosing stage stays fused
      val ref = ctx.addReferenceObj("nearestCenter", this,
        classOf[NearestCenter].getName)
      s"""
         |Object nc = $ref.nullSafeEval($a);
         |if (nc == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) nc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCenter =
    copy(child = newChild)
}
