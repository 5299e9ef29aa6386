package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Scalar-quantization (SQ8) encode: map a QUANTIZED vector (integral
  * doubles from [[QuantizeVec]] — the similarity family's shared
  * determinism step) to one byte-range code per dimension against the
  * per-dimension affine scales `lo`/`width` learned by
  * [[graft.similarity.Sq.trainScales]]:
  *
  *   code_i = ((clamp(x_i, lo_i, lo_i + width_i) − lo_i) · 255) / width_i
  *
  * all in EXACT long arithmetic (clamp-first keeps the numerator
  * non-negative, so Java's truncating division ≡ floor ≡ DuckDB `//` —
  * the cross-engine division contract); a zero-width dimension (constant
  * across the training corpus) encodes 0. Codes land in [0, 255] by
  * construction — the clamp, not a post-hoc cap, guarantees it, so
  * frozen-scale DELTA encodes of out-of-range vectors stay in range too.
  *
  * The scale arrays ride as reference objects (the
  * [[NearestCenter]]/[[DistMap]] recipe): plan text and generated code are
  * constant in the dimension count, the loop runs compiled, and the
  * enclosing projection stays fused. A length-MISMATCHED, null-element,
  * or non-finite-element vector nulls the OUTPUT (the [[MatVecMul]]
  * convention — a zero-padded code word would silently corrupt every
  * distance it later enters, and `NaN.toLong` would silently encode a
  * NaN dimension as the mid-range code for 0).
  *
  * Overflow posture (the [[GramSum]] lesson): multiplies and adds use
  * `Math.multiplyExact`/`addExact`, so a caller quantizing at a scale
  * beyond the documented headroom fails loudly instead of wrapping.
  */
case class SqEncode(child: Expression, lo: Array[Long], width: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(lo.nonEmpty && lo.length == width.length,
    s"sq_encode: ${lo.length} lo vs ${width.length} width entries")
  require(width.forall(_ >= 0), "sq_encode: negative width")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq_encode"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != lo.length) return null
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val xd = a.getDouble(i)
      // NaN/Infinity would coerce to 0L / saturate silently under toLong —
      // null the row instead (the null-element contract, stated above)
      if (java.lang.Double.isNaN(xd) || java.lang.Double.isInfinite(xd)) return null
      val x = xd.toLong
      val w = width(i)
      out(i) =
        if (w == 0L) 0
        else {
          val clamped = math.min(math.max(x, lo(i)), Math.addExact(lo(i), w))
          (Math.multiplyExact(clamped - lo(i), 255L) / w).toInt
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // loop runs as compiled Scala via a reference object — generated
      // code constant in dim, stage stays fused (the DistMap recipe)
      val ref = ctx.addReferenceObj("sqEncode", this, classOf[SqEncode].getName)
      s"""
         |Object se = $ref.nullSafeEval($a);
         |if (se == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) se;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
}

/** SQ8 asymmetric distance: squared L2 between an exact QUANTIZED query
  * vector and the reconstruction of a corpus code word under the same
  * `lo`/`width` scales —
  *
  *   recon_i = lo_i + (code_i · width_i) / 255
  *   dist    = Σ_i (q_i − recon_i)²
  *
  * entirely in long arithmetic (code·width ≥ 0, so truncating division ≡
  * floor ≡ DuckDB `//`; the squared differences and their left-to-right
  * sum are exact longs — no float ever enters, which is what makes
  * q_sq_topk's oracle a bit-for-bit replay). The asymmetry is the point
  * (Jégou et al.'s ADC convention, [[graft.similarity.Pq]]): only the
  * CORPUS is compressed; the query keeps full precision, so the only
  * error is the corpus rounding — half the symmetric-code error.
  *
  * Scales ride as reference objects (constant plan size in dim); a
  * length mismatch between query, codes, and scales nulls the output, as
  * does a non-finite query component (the [[SqEncode]] contract); EVERY
  * arithmetic step — reconstruction add, difference, square, accumulate —
  * overflows loudly via `Math.addExact`/`subtractExact`/`multiplyExact`
  * (the [[GramSum]] posture).
  */
case class SqAdcDist(left: Expression, right: Expression,
                     lo: Array[Long], width: Array[Long])
    extends BinaryExpression with ExpectsInputTypes {

  require(lo.nonEmpty && lo.length == width.length,
    s"sq_adc_dist: ${lo.length} lo vs ${width.length} width entries")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sq_adc_dist"
  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val n = lo.length
    if (qa.numElements() != n || ca.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (qa.isNullAt(i) || ca.isNullAt(i)) return null
      val qd = qa.getDouble(i)
      if (java.lang.Double.isNaN(qd) || java.lang.Double.isInfinite(qd)) return null
      val recon = Math.addExact(lo(i),
        Math.multiplyExact(ca.getInt(i).toLong, width(i)) / 255L)
      val d = Math.subtractExact(qd.toLong, recon)
      acc = Math.addExact(acc, Math.multiplyExact(d, d))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val ref = ctx.addReferenceObj("sqAdcDist", this, classOf[SqAdcDist].getName)
      s"""
         |Object sd = $ref.nullSafeEval($q, $c);
         |if (sd == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) sd).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SqAdcDist =
    copy(left = newLeft, right = newRight)
}
