package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Late-interaction MaxSim score between two token-vector matrices
  * (Khattab & Zaharia, ColBERT, SIGIR 2020): for each query token vector
  * qᵢ, take the maximum dot product against every document token vector
  * dⱼ, then sum the per-token maxima — Σᵢ maxⱼ qᵢ·dⱼ.
  *
  * One fused primitive loop per (query, document) PAIR — the relational
  * spelling (explode both token sets, join, two aggregations) shuffles a
  * |corpus tokens| × |query tokens| row blow-up where this expression
  * keeps the cross join at DOCUMENT granularity and the token×token work
  * inside whole-stage codegen, and the HOF spelling
  * (`aggregate(transform(...))` nested two deep) is CodegenFallback and
  * would de-fuse the scoring projection (the [[QuantizeVec]] lesson).
  *
  * Inputs are `array<array<double>>` of QUANTIZED (integral-double,
  * [[QuantizeVec]]) token vectors, so every dot, max, and the final sum
  * is exact integer arithmetic below 2^53 — the
  * [[graft.similarity.Clustering]] determinism contract: a SQL oracle
  * replays the score bit-for-bit and the result casts to LONG losslessly.
  *
  * Null/edge device (the [[FloatVectorDot]] contract): null input → null;
  * a null token vector or null component anywhere → null (poisons the
  * score rather than silently skipping a token); mismatched inner
  * dimensions → null; an EMPTY matrix on either side → null (a max over
  * zero vectors has no value — callers drop token-less rows before
  * scoring).
  *
  * Accumulation order: dots fold left-to-right in double (exact on the
  * quantized inputs, so order is immaterial); the max scans document
  * tokens in array order with strict `>` (first-best-wins — equivalent to
  * SQL MAX on exact values); the outer sum folds query tokens in array
  * order (again exact).
  */
case class MaxSimScore(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_sim_score"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val d = r.asInstanceOf[ArrayData]
    val nq = q.numElements()
    val nd = d.numElements()
    if (nq == 0 || nd == 0) return null
    var total = 0.0
    var i = 0
    while (i < nq) {
      if (q.isNullAt(i)) return null
      val qv = q.getArray(i)
      val dim = qv.numElements()
      var best = Double.NegativeInfinity
      var j = 0
      while (j < nd) {
        if (d.isNullAt(j)) return null
        val dv = d.getArray(j)
        if (dv.numElements() != dim) return null
        var acc = 0.0
        var t = 0
        while (t < dim) {
          if (qv.isNullAt(t) || dv.isNullAt(t)) return null
          acc += qv.getDouble(t) * dv.getDouble(t)
          t += 1
        }
        if (acc > best) best = acc
        j += 1
      }
      total += best
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, d) => {
      val nq = ctx.freshName("nq")
      val nd = ctx.freshName("nd")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val qv = ctx.freshName("qv")
      val dv = ctx.freshName("dv")
      val dim = ctx.freshName("dim")
      val best = ctx.freshName("best")
      val acc = ctx.freshName("acc")
      val total = ctx.freshName("total")
      val done = ctx.freshName("done")
      s"""
         |int $nq = $q.numElements();
         |int $nd = $d.numElements();
         |if ($nq == 0 || $nd == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $total = 0.0;
         |  boolean $done = false;
         |  for (int $i = 0; $i < $nq && !$done; $i++) {
         |    if ($q.isNullAt($i)) { ${ev.isNull} = true; $done = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $qv = $q.getArray($i);
         |    int $dim = $qv.numElements();
         |    double $best = Double.NEGATIVE_INFINITY;
         |    for (int $j = 0; $j < $nd && !$done; $j++) {
         |      if ($d.isNullAt($j)) { ${ev.isNull} = true; $done = true; break; }
         |      org.apache.spark.sql.catalyst.util.ArrayData $dv = $d.getArray($j);
         |      if ($dv.numElements() != $dim) { ${ev.isNull} = true; $done = true; break; }
         |      double $acc = 0.0;
         |      for (int $t = 0; $t < $dim; $t++) {
         |        if ($qv.isNullAt($t) || $dv.isNullAt($t)) { ${ev.isNull} = true; $done = true; break; }
         |        $acc += $qv.getDouble($t) * $dv.getDouble($t);
         |      }
         |      if (!$done && $acc > $best) $best = $acc;
         |    }
         |    if (!$done) $total += $best;
         |  }
         |  if (!$done) ${ev.value} = $total;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MaxSimScore =
    copy(left = newLeft, right = newRight)
}
