package org.apache.spark.sql.graftglue

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded KMV set sketch: the `k` smallest DISTINCT values of a BIGINT
  * hash column, emitted ascending — the mergeable synopsis behind
  * k-minimum-values distinct estimation and KMV set-resemblance (Broder's
  * minwise resemblance over a bottom-k sample; Beyer et al., SIGMOD'07,
  * "On synopses for distinct-value estimation under multiset operations").
  *
  * The distinction from [[TopKStruct]] is DISTINCTNESS: KMV statistics are
  * defined over the distinct-value universe, so duplicate hashes must
  * occupy ONE slot — a plain bounded top-k of a dup-heavy corpus's
  * shingle stream would fill all k slots with copies of the most-common
  * shingles and wreck both estimators. The buffer is a sorted distinct
  * set (`TreeSet`), capped at k: admission is O(log k), state is ≤ k
  * longs regardless of input size, and partial aggregation runs map-side
  * so ONLY ≤ k·partitions rows ever reach the final exchange — the whole
  * corpus-vs-corpus overlap question ([[graft.dedup.Dedup.corpusOverlap]])
  * reduces to two corpus scans with k-sized exchanges and driver-side set
  * math on ≤ 2k hashes.
  *
  * Determinism: the k smallest distinct values of a set are a pure
  * function of the set — arrival order, partitioning, and merge order
  * cannot change the result, so a `SELECT DISTINCT … ORDER BY … LIMIT k`
  * oracle replays it exactly. Null inputs are skipped (SQL aggregate
  * convention).
  */
case class KmvSet(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_set"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[java.lang.Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSet =
    copy(child = newChild)
}
