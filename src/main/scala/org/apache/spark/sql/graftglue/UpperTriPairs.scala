package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Generator emitting each strictly-upper-triangular pair (i < j) of an
  * array as a two-column row — the in-bucket pair expander behind the whole
  * LSH family ([[graft.dedup.Dedup]]: lshPairs, simhashPairs,
  * cosineNearDupLsh, ngramJaccard, editDistancePairs, the PPJoin prefix).
  *
  * Replaces `explode(flatten(transform(ms, (x, i) => transform(slice(ms,
  * i + 2, …), y => mk(x, y)))))`, which has two scale problems the lazy
  * iterator removes:
  *
  *  1. MEMORY: `flatten` materializes ALL m·(m−1)/2 pair payloads of a
  *     bucket as ONE array value before explode iterates it — at the
  *     default maxBucket = 4096 that is ~8.4M structs in a single row
  *     buffer. Here each pair exists only for the instant the downstream
  *     projection consumes it, so the bucket cap bounds CPU (pair count),
  *     not a per-row allocation spike.
  *  2. CPU: the nested transform lambdas are interpreted (HOFs are
  *     CodegenFallback), paying per-pair lambda dispatch + boxing; the
  *     iterator copies two element references per pair.
  *
  * Pair ORDER matches the nested-loop form (i ascending, then j), and the
  * edge semantics mirror it exactly: null array → zero rows (explode of
  * null); a null ELEMENT still pairs (the HOF built its payload from null
  * fields); 0/1-element arrays emit nothing. The payload `mk` runs as a
  * codegen'd projection on the generator's output columns.
  */
case class UpperTriPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"upper_tri_pairs needs an array input, got ${other.catalogString}")
  }

  private lazy val at = child.dataType.asInstanceOf[ArrayType]

  override def elementSchema: StructType = StructType(Seq(
    StructField("__px", at.elementType, at.containsNull),
    StructField("__py", at.elementType, at.containsNull)))

  override def prettyName: String = "upper_tri_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val et = at.elementType
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = j < n
        override def next(): InternalRow = {
          val r = InternalRow(arr.get(i, et), arr.get(j, et))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): UpperTriPairs =
    copy(child = newChild)
}
