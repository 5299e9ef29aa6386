package org.apache.spark.sql.graftglue

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: keep the `k` (score, id) pairs with the highest
  * score (ties broken by ascending id), emitted as an array of
  * (neighbor, score) structs sorted best-first.
  *
  * This is the scale-correct tail for every top-k-per-query ranking
  * (ANN/PQ/margin mining): the `row_number() OVER (PARTITION BY query)`
  * formulation EXCHANGES every scored candidate pair — |Q|·|C| rows for a
  * brute-force pass (measured: the 10× margin-mining decade shuffles 625M
  * pair rows per direction, plans/SCALE.md r8.4) — while a bounded
  * TypedImperativeAggregate partial-aggregates map-side, so only
  * min(k, candidates-in-partition) rows per (query, partition) reach the
  * exchange: |Q|·k·P rows, independent of corpus size.
  *
  * Determinism contract: (score DESC, id ASC) is a TOTAL order whenever ids
  * are unique per group (the ANN invariant), so the kept set and its order
  * are independent of arrival/partition order — the aggregate is
  * bit-identical to the window form it replaces, and window-based SQL
  * oracles stay valid. Ids may be LONG, INT, or STRING (UTF8String binary
  * order ≡ Spark's string sort order).
  */
case class TopKStruct(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStruct.Buf]
  with ExpectsInputTypes with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, TypeCollection(LongType, IntegerType, StringType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor", id.dataType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_struct"

  private def isString: Boolean = id.dataType == StringType
  private def isInt: Boolean = id.dataType == IntegerType

  // worst-kept-first order: smaller score is worse; on equal scores the
  // LARGER id is worse (so the heap evicts it first)
  private def worseThan(aScore: Double, aId: Any, bScore: Double, bId: Any): Boolean =
    if (aScore != bScore) aScore < bScore
    else (aId, bId) match {
      case (x: Long, y: Long) => x > y
      case (x: Int, y: Int) => x > y
      case (x: UTF8String, y: UTF8String) => x.compareTo(y) > 0
      case _ => false
    }

  override def createAggregationBuffer(): TopKStruct.Buf = new TopKStruct.Buf()

  override def update(buf: TopKStruct.Buf, input: InternalRow): TopKStruct.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // copy string ids out of the reused input row
      val owned = i match {
        case u: UTF8String => u.clone()
        case other => other
      }
      insert(buf, s.asInstanceOf[Double], owned)
    }
    buf
  }

  private def insert(buf: TopKStruct.Buf, s: Double, i: Any): Unit = {
    if (buf.n < k) {
      buf.ensure(buf.n + 1)
      buf.scores(buf.n) = s; buf.ids(buf.n) = i; buf.n += 1
      if (buf.n == k) buf.heapify(worseThan)
    } else if (worseThan(buf.scores(0), buf.ids(0), s, i)) {
      buf.scores(0) = s; buf.ids(0) = i
      buf.siftDown(0, worseThan)
    }
  }

  override def merge(buf: TopKStruct.Buf, other: TopKStruct.Buf): TopKStruct.Buf = {
    var j = 0
    while (j < other.n) { insert(buf, other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKStruct.Buf): Any = {
    val idx = Array.range(0, buf.n).sortWith { (a, b) =>
      // best first = the reverse of worst-first
      worseThan(buf.scores(b), buf.ids(b), buf.scores(a), buf.ids(a))
    }
    new GenericArrayData(idx.map { j =>
      InternalRow(buf.ids(j), buf.scores(j))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKStruct.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var j = 0
    while (j < buf.n) {
      out.writeDouble(buf.scores(j))
      buf.ids(j) match {
        case x: Long => out.writeLong(x)
        case x: Int => out.writeInt(x)
        case u: UTF8String =>
          val b = u.getBytes; out.writeInt(b.length); out.write(b)
      }
      j += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStruct.Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKStruct.Buf()
    val n = in.readInt()
    buf.ensure(n)
    var j = 0
    while (j < n) {
      buf.scores(j) = in.readDouble()
      buf.ids(j) =
        if (isString) {
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        } else if (isInt) in.readInt()
        else in.readLong()
      j += 1
    }
    buf.n = n
    if (buf.n >= k) buf.heapify(worseThan)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStruct =
    copy(score = newLeft, id = newRight)
}

object TopKStruct {
  /** Growable (score, id) arrays; once full (n == k at the case-class
    * level) they are maintained as a binary min-heap with the WORST kept
    * element at index 0, so admission is O(log k).
    */
  final class Buf {
    var scores: Array[Double] = new Array[Double](8)
    var ids: Array[Any] = new Array[Any](8)
    var n: Int = 0

    def ensure(cap: Int): Unit = if (cap > scores.length) {
      val c = math.max(cap, scores.length * 2)
      scores = java.util.Arrays.copyOf(scores, c)
      ids = java.util.Arrays.copyOf(ids.asInstanceOf[Array[AnyRef]], c)
        .asInstanceOf[Array[Any]]
    }

    def heapify(worse: (Double, Any, Double, Any) => Boolean): Unit = {
      var i = n / 2 - 1
      while (i >= 0) { siftDown(i, worse); i -= 1 }
    }

    def siftDown(start: Int, worse: (Double, Any, Double, Any) => Boolean): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) return
        val ts = scores(i); scores(i) = scores(w); scores(w) = ts
        val ti = ids(i); ids(i) = ids(w); ids(w) = ti
        i = w
      }
    }
  }
}
