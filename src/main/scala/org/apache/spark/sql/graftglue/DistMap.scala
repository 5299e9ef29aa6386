package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, MapType}

/** Squared L2 distances from an `array<double>` column to EVERY center in
  * a literal (cid, center) set, as one `map<int, double>` keyed by cid —
  * the query-side distance-table builder of ADC scoring
  * ([[graft.similarity.Pq.adcTopK]] / `ivfAdcTopK` build one cid→d2 map
  * per subspace BEFORE the corpus join, so each corpus row pays m map
  * lookups instead of m×k distance folds).
  *
  * Previously `map_from_arrays(typedLit(cids), array(SqDistLit(v, c₁), …))`
  * — one dim-length literal + inlined distance expansion per codeword,
  * m×k of them per query projection, PLUS the k-element cid literal per
  * subspace: the [[NearestCenter]]/[[ProbeCells]] plan-size pathology (a
  * production PQ at m = 8, k = 256 is 2048 literal expansions in ONE
  * projection). Here cids and the center matrix ride as reference objects
  * — plan text and generated code constant in k, loop in compiled Scala,
  * stage stays fused.
  *
  * Value semantics per center are the [[SqDistLit]] fold (d = v_i − c_i,
  * acc += d·d, left to right — the shared determinism contract); a
  * length-MISMATCHED center keeps its cid with a null value (its SqDistLit
  * was null, and an `element_at` lookup must yield null, not
  * key-not-found). Null input array → null map; a null input ELEMENT →
  * null map (every per-center value would have been null, and every
  * lookup on either form yields null — stated divergence from the literal
  * form's all-null-valued map, same observable behavior through
  * `element_at`).
  */
case class DistMap(child: Expression, cids: Array[Int],
                   centers: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(centers.nonEmpty, "dist_map: center set must be non-empty")
  require(cids.length == centers.length,
    s"dist_map: ${cids.length} ids vs ${centers.length} centers")
  require(cids.distinct.length == cids.length, "dist_map: duplicate cids")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    MapType(IntegerType, DoubleType, valueContainsNull = true)
  override def prettyName: String = "dist_map"
  override def nullable: Boolean = true

  // constant map keys, built once per expression instance
  @transient private lazy val keyArray: ArrayData =
    new GenericArrayData(cids.map(identity[Any]))

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
    val out = new Array[Any](centers.length)
    var c = 0
    while (c < centers.length) {
      val cv = centers(c)
      if (cv.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) { val d = x(k) - cv(k); acc += d * d; k += 1 }
        out(c) = acc
      } // else: null value for this cid (length mismatch — SqDistLit parity)
      c += 1
    }
    new ArrayBasedMapData(keyArray, new GenericArrayData(out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the distance loop runs as compiled Scala via a reference object —
      // constant generated-code size no matter the codebook size; the
      // enclosing stage stays fused
      val ref = ctx.addReferenceObj("distMap", this, classOf[DistMap].getName)
      s"""
         |Object dm = $ref.nullSafeEval($a);
         |if (dm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) dm;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DistMap =
    copy(child = newChild)
}
