package org.apache.spark.sql.graftglue

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact scatter-matrix aggregate: given a vector column, accumulate
  * S[i][j] = Σ_rows q_i · q_j with q_i = floor(v_i · scale) — the
  * second-moment (Gram/scatter) matrix over QUANTIZED components, as
  * integer sums.
  *
  * Why integers: a double accumulation is partition-order dependent, so a
  * covariance built from plain SUMs can never hash-match a SQL oracle.
  * floor-quantized products summed in long are EXACT and order-free —
  * any engine reproduces them bit-for-bit (the [[graft.similarity
  * .Clustering]] determinism contract, applied to a matrix).
  *
  * Why an aggregate: the relational formulation explodes every row into
  * d² (i, j, product) rows before the shuffle — a 4096× row blowup at
  * d = 64 — while this buffer carries ONE d²-long array per partition and
  * map-side combines, so the exchange moves P · d² longs total no matter
  * the corpus size. One pass, no blowup: the covariance/PCA input for
  * [[graft.similarity.Pca]] at 100 TB.
  *
  * Overflow headroom: |Σ q_i q_j| ≤ n · (scale · v_max)². At the default
  * scale 2²⁰ and |v| ≤ 4 that allows n ≈ 2¹⁹ rows per AGGREGATE before
  * approaching 2⁶³ — lower `scale` for bigger corpora; exactness holds at
  * any scale (the oracle replays whatever scale the query used). Past the
  * headroom the aggregate FAILS LOUDLY (`Math.multiplyExact`/`addExact`
  * in update and merge throw ArithmeticException) rather than silently
  * wrapping into a corrupted rotation — the overflow check is a single
  * branch the JIT intrinsifies, invisible next to the multiply itself.
  *
  * Emits the d² sums row-major; rows with a NULL vector or a null element
  * are skipped whole (a half-counted row would corrupt every pair).
  * Mixed dimensions throw — a silent mix would mis-sum silently.
  */
case class GramSum(
    vec: Expression, scale: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramSum.Buf]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def child: Expression = vec
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_sum"

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): GramSum.Buf = new GramSum.Buf()

  override def update(buf: GramSum.Buf, input: InternalRow): GramSum.Buf = {
    val v = vec.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val d = a.numElements()
      val q = new Array[Long](d)
      var ok = true
      var i = 0
      while (ok && i < d) {
        if (a.isNullAt(i)) ok = false
        else {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          q(i) = math.floor(x * scale).toLong
        }
        i += 1
      }
      // dimension fixes only from a row that actually counts — a skipped
      // (null-element) row must not pin d and poison every later row
      if (ok) {
        if (buf.d == 0) { buf.d = d; buf.s = new Array[Long](d * d) }
        require(buf.d == d, s"gram_sum: mixed vector dimensions ${buf.d} vs $d")
        var r = 0
        while (r < d) {
          val qr = q(r); val base = r * d
          var c = 0
          while (c < d) {
            buf.s(base + c) =
              Math.addExact(buf.s(base + c), Math.multiplyExact(qr, q(c)))
            c += 1
          }
          r += 1
        }
      }
    }
    buf
  }

  override def merge(buf: GramSum.Buf, other: GramSum.Buf): GramSum.Buf = {
    if (other.d != 0) {
      if (buf.d == 0) { buf.d = other.d; buf.s = new Array[Long](other.d * other.d) }
      require(buf.d == other.d,
        s"gram_sum: mixed vector dimensions ${buf.d} vs ${other.d}")
      var i = 0
      while (i < buf.s.length) {
        buf.s(i) = Math.addExact(buf.s(i), other.s(i)); i += 1
      }
    }
    buf
  }

  override def eval(buf: GramSum.Buf): Any =
    new GenericArrayData(if (buf.d == 0) Array.emptyLongArray else buf.s)

  override def serialize(buf: GramSum.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.d)
    var i = 0
    while (i < buf.d * buf.d) { out.writeLong(buf.s(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramSum.Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new GramSum.Buf()
    buf.d = in.readInt()
    if (buf.d != 0) {
      buf.s = new Array[Long](buf.d * buf.d)
      var i = 0
      while (i < buf.s.length) { buf.s(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSum =
    copy(vec = newChild)
}

object GramSum {
  /** d = 0 until the first row fixes the dimension. */
  final class Buf {
    var d: Int = 0
    var s: Array[Long] = Array.emptyLongArray
  }
}
