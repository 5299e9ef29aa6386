package org.apache.spark.sql.graftglue

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: keep the `k` (score, id) pairs with the best
  * score — highest by default, lowest with `smallest = true` — ties broken
  * by ascending id, emitted as an array of (neighbor, score) structs sorted
  * best-first.
  *
  * This is the scale-correct tail for every top/bottom-k-per-group
  * selection (ANN/PQ ranking, KMV sketches, deterministic per-group
  * sampling). Spark's own `WindowGroupLimit` pushdown already bounds the
  * SHUFFLE of a rank-filtered `row_number() OVER (PARTITION BY key)` — but
  * its partial mode requires its input sorted, so the window form still
  * SORTS every scored candidate row map-side (a full O(n·log n) SortExec
  * over |Q|·|C| rows for a brute-force ANN pass — 1.25G rows at the 10×
  * margin decade — with partition-sized sort/spill buffers), then sorts
  * again after the exchange. The bounded heap does O(n·log k) updates in
  * constant k-sized memory with NO sort on either side of its exchange,
  * and partial-aggregates map-side so ≤ min(k, candidates-in-partition)
  * rows per (group, partition) shuffle. Measured: 2.7× end-to-end on the
  * brute-force margin decade (plans/SCALE.md r8.4) — PROVIDED
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` exceeds
  * the per-task group count ([[graft.GraftSession.tune]] sets 65536):
  * past the threshold Spark silently re-sorts the input by group key,
  * giving back most of the win.
  *
  * Determinism contract: (score best-first, id ASC) is a TOTAL order
  * whenever ids are unique per group (the callers' invariant), so the kept
  * set and its order are independent of arrival/partition order — the
  * aggregate is bit-identical to the window form it replaces, and
  * window-based SQL oracles stay valid. Scores may be DOUBLE, LONG, or
  * STRING; ids may be LONG, INT, or STRING (UTF8String binary order ≡
  * Spark's string sort order). Double ordering follows Spark SQL's sort
  * semantics: NaN greatest, NaN = NaN, -0.0 = 0.0.
  */
case class TopKStruct(
    score: Expression, id: Expression, k: Int, smallest: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStruct.Buf]
  with ExpectsInputTypes with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(DoubleType, LongType, StringType),
      TypeCollection(LongType, IntegerType, StringType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor", id.dataType, nullable = false),
    StructField("score", score.dataType, nullable = false))), containsNull = false)
  override def prettyName: String = if (smallest) "bottom_k_struct" else "top_k_struct"

  private def idIsString: Boolean = id.dataType == StringType
  private def idIsInt: Boolean = id.dataType == IntegerType
  private def scoreIsString: Boolean = score.dataType == StringType
  private def scoreIsLong: Boolean = score.dataType == LongType

  /** Spark-SQL-consistent score comparison: doubles order with NaN
    * greatest, NaN = NaN, -0.0 = 0.0 (the `x == y` arm — primitive
    * equality — catches the signed zeros); longs and UTF8Strings order
    * naturally.
    */
  private def cmpScore(a: Any, b: Any): Int = (a, b) match {
    case (x: Double, y: Double) =>
      if (x < y) -1 else if (x > y) 1
      else if (x == y) 0
      else { val xn = x != x; val yn = y != y
        if (xn && yn) 0 else if (xn) 1 else -1 }
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: UTF8String, y: UTF8String) => Integer.signum(x.compareTo(y))
    case _ => 0
  }

  private def cmpId(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: UTF8String, y: UTF8String) => Integer.signum(x.compareTo(y))
    case _ => 0
  }

  // worst-kept-first order: a worse score is one that loses the keep
  // (lower when keeping the highest, higher when keeping the lowest); on
  // equal scores the LARGER id is worse (so the heap evicts it first)
  private def worseThan(aScore: Any, aId: Any, bScore: Any, bId: Any): Boolean = {
    val c = cmpScore(aScore, bScore)
    if (c != 0) { if (smallest) c > 0 else c < 0 }
    else cmpId(aId, bId) > 0
  }

  override def createAggregationBuffer(): TopKStruct.Buf = new TopKStruct.Buf()

  override def update(buf: TopKStruct.Buf, input: InternalRow): TopKStruct.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // copy string values out of the reused input row
      val ownedS = s match {
        case u: UTF8String => u.clone()
        case other => other
      }
      val ownedI = i match {
        case u: UTF8String => u.clone()
        case other => other
      }
      insert(buf, ownedS, ownedI)
    }
    buf
  }

  private def insert(buf: TopKStruct.Buf, s: Any, i: Any): Unit = {
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

  private def writeVal(out: DataOutputStream, v: Any): Unit = v match {
    case x: Long => out.writeLong(x)
    case x: Int => out.writeInt(x)
    case x: Double => out.writeDouble(x)
    case u: UTF8String =>
      val b = u.getBytes; out.writeInt(b.length); out.write(b)
  }

  private def readString(in: DataInputStream): UTF8String = {
    val len = in.readInt(); val b = new Array[Byte](len)
    in.readFully(b); UTF8String.fromBytes(b)
  }

  override def serialize(buf: TopKStruct.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var j = 0
    while (j < buf.n) {
      writeVal(out, buf.scores(j)); writeVal(out, buf.ids(j)); j += 1
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
      buf.scores(j) =
        if (scoreIsString) readString(in)
        else if (scoreIsLong) in.readLong()
        else in.readDouble()
      buf.ids(j) =
        if (idIsString) readString(in)
        else if (idIsInt) in.readInt()
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
    var scores: Array[Any] = new Array[Any](8)
    var ids: Array[Any] = new Array[Any](8)
    var n: Int = 0

    def ensure(cap: Int): Unit = if (cap > scores.length) {
      val c = math.max(cap, scores.length * 2)
      scores = java.util.Arrays.copyOf(scores.asInstanceOf[Array[AnyRef]], c)
        .asInstanceOf[Array[Any]]
      ids = java.util.Arrays.copyOf(ids.asInstanceOf[Array[AnyRef]], c)
        .asInstanceOf[Array[Any]]
    }

    def heapify(worse: (Any, Any, Any, Any) => Boolean): Unit = {
      var i = n / 2 - 1
      while (i >= 0) { siftDown(i, worse); i -= 1 }
    }

    def siftDown(start: Int, worse: (Any, Any, Any, Any) => Boolean): Unit = {
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
