package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

/** The `nprobe` nearest coarse cells for a vector, by cosine — the IVF
  * routing primitive behind [[graft.similarity.Ann.nearestCell]] /
  * [[graft.similarity.Ann.probeCells]].
  *
  * Previously a `least()` / `array_sort()` over nlist per-centroid STRUCT
  * expressions, each embedding the full centroid vector as a literal and a
  * full cosine expansion — the expression TREE scaled with nlist × dim
  * (nlist = 64 put 4096 doubles and 64 dot-product expansions into one
  * projection), costing seconds of analysis/Janino time per query and
  * capping nlist long before a production 4096-cell quantizer. Here the
  * centroid matrix rides as ONE reference object, the plan is constant
  * size in nlist, and the scoring loop is compiled Scala invoked from the
  * generated code (a virtual call per row — the surrounding stage stays
  * whole-stage-codegen'd, unlike a CodegenFallback which would unfuse it).
  *
  * Semantics are IDENTICAL to the struct formulation, bit for bit: cosine
  * = dot/(‖v‖·‖c‖) with left-to-right double accumulation (the
  * [[FloatVectorDot]] fold), 0.0 when either norm is zero, -∞ for a
  * dimension-MISMATCHED centroid (the struct form's fcosine nulled such
  * centroids out of contention; -∞ reproduces never-wins exactly — a 0.0
  * would let a corrupt centroid out-rank all-negative real cosines); cells
  * rank by
  * (cosine DESC, cent_id ASC) — Spark's double order (NaN greatest,
  * -0.0 = 0.0) with the UTF8String id tie-break; the output is the
  * best-first array of cent ids. A null vector (or null element) is NULL.
  */
case class ProbeCells(child: Expression, centIds: Array[String],
                      centVecs: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(centIds.length == centVecs.length && centIds.nonEmpty,
    "probe_cells: ids and vectors must align and be non-empty")
  require(nprobe >= 1 && nprobe <= centIds.length,
    s"probe_cells: nprobe ($nprobe) must be in [1, ${centIds.length}]")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "probe_cells"
  override def nullable: Boolean = true

  // precomputed once per plan: centroid norms with the fcosine fold
  // (Σ (double)c_i · c_i left-to-right, then sqrt — what fnorm over the
  // literal would have constant-folded to)
  @transient private lazy val centNorms: Array[Double] =
    centVecs.map { cv =>
      var acc = 0.0; var i = 0
      while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
      math.sqrt(acc)
    }
  @transient private lazy val centIdsU: Array[UTF8String] =
    centIds.map(UTF8String.fromString)

  /** Spark double order: NaN greatest, -0.0 = 0.0. */
  private def cmpCos(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else if (x == y) 0
    else { val xn = x != x; val yn = y != y
      if (xn && yn) 0 else if (xn) 1 else -1 }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = childIsFloat
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var vAcc = 0.0
    i = 0
    while (i < n) { vAcc += x(i) * x(i); i += 1 }
    val vNorm = math.sqrt(vAcc)
    // top-nprobe by (cos desc, id asc): sorted-insertion into a small
    // array — O(nlist · nprobe), nprobe is a routing knob (small)
    val keptCos = new Array[Double](nprobe)
    val keptIdx = new Array[Int](nprobe)
    var kept = 0
    var c = 0
    while (c < centVecs.length) {
      val cv = centVecs(c)
      val cos =
        // mismatched centroid: -∞, so it NEVER out-ranks a real cosine —
        // the struct form's fcosine nulled such centroids out of
        // contention, and a 0.0 here would let a corrupt centroid win
        // whenever every real cosine is negative
        if (cv.length != n) Double.NegativeInfinity
        else {
          var acc = 0.0; var k = 0
          while (k < n) { acc += x(k) * cv(k); k += 1 }
          val denom = vNorm * centNorms(c)
          if (denom == 0.0) 0.0 else acc / denom
        }
      // find insertion point among kept (kept are best-first)
      var pos = kept
      while (pos > 0 && {
        val cmp = cmpCos(cos, keptCos(pos - 1))
        cmp > 0 || (cmp == 0 && centIdsU(c).compareTo(centIdsU(keptIdx(pos - 1))) < 0)
      }) pos -= 1
      if (pos < nprobe) {
        val end = math.min(kept, nprobe - 1)
        var m = end
        while (m > pos) {
          keptCos(m) = keptCos(m - 1); keptIdx(m) = keptIdx(m - 1); m -= 1
        }
        keptCos(pos) = cos; keptIdx(pos) = c
        if (kept < nprobe) kept += 1
      }
      c += 1
    }
    val out = new Array[AnyRef](kept)
    i = 0
    while (i < kept) { out(i) = centIdsU(keptIdx(i)); i += 1 }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the scoring loop runs as compiled Scala via a reference object —
      // constant generated-code size no matter the centroid count; the
      // enclosing stage stays fused (this is NOT a CodegenFallback)
      val ref = ctx.addReferenceObj("probeCells", this,
        classOf[ProbeCells].getName)
      s"""
         |Object probed = $ref.nullSafeEval($a);
         |if (probed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) probed;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}
