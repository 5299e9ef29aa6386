package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Round-robin bit interleave of d non-negative longs into one Z-order
  * (Morton) key: output bit `i*d + j` is bit `i` of dimension `j`, for
  * `i < bits` — dimension 0 owns the least-significant position of each
  * round, and every dimension contributes one bit per round, so a range
  * split on the result alternates splitting every dimension in turn.
  * That key is what [[graft.operators.Sinks.zorderWrite]] range-partitions
  * and sorts by: each output file then covers a small HYPER-RECTANGLE of
  * the value space instead of a thin slab of one column, and parquet
  * min/max footer stats become selective for predicates on ANY of the
  * interleaved columns (the multi-column data-skipping layout Delta's
  * OPTIMIZE ZORDER and Hudi's space-filling-curve clustering apply at
  * 100 TB).
  *
  * The interleave is the per-row hot loop of a full-corpus rewrite, so it
  * is a native expression with `doGenCode` — `d*bits` shift-or steps fused
  * into whole-stage codegen, no boxing, no HOF dispatch. Inputs are the
  * already-binned cell ids (see `Sinks.zorderBin`: integer arithmetic, so
  * an SQL oracle reproduces values bit-exactly); only the low `bits` bits
  * of each element are read. Null array → null; a null element → null;
  * `d*bits > 63` would silently alias distinct cells, so it throws.
  */
case class InterleaveBits(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits > 0 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    if (d * bits > 63)
      throw new IllegalArgumentException(
        s"interleave_bits: $d dims x $bits bits exceeds 63 result bits")
    var j = 0
    while (j < d) { if (a.isNullAt(j)) return null; j += 1 }
    var out = 0L
    var i = 0
    while (i < bits) {
      j = 0
      while (j < d) {
        out |= ((a.getLong(j) >>> i) & 1L) << (i * d + j)
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |int $d = $a.numElements();
         |if ($d * $bits > 63) {
         |  throw new IllegalArgumentException(
         |    "interleave_bits: " + $d + " dims x " + $bits +
         |    " bits exceeds 63 result bits");
         |}
         |for (int $j = 0; $j < $d; $j++) {
         |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    for (int $j = 0; $j < $d; $j++) {
         |      $out |= (($a.getLong($j) >>> $i) & 1L) << ($i * $d + $j);
         |    }
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): InterleaveBits =
    copy(child = newChild)
}
