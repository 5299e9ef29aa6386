package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `array<float>` embedding columns — higher-order
  * functions only (codegen'd), no UDFs, no driver round-trips.
  *
  * Accumulation is in double, left-to-right (`aggregate` folds
  * sequentially), which matches a sequential double fold in any other
  * engine — rank comparisons are stable cross-engine.
  */
object Vectors {

  /** Σ aᵢ·bᵢ in double — NATIVE codegen path for `array<float>` columns
    * (bit-identical to [[dot]]; see [[graft.plans.FloatVectorDot]]). Use this
    * in hot loops: the HOF variant is interpreted per element.
    */
  def fdot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, FloatVectorDot}
    ColumnBridge.column(
      FloatVectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Cosine via [[fdot]] with caller-precomputed norms (compute each row's
    * norm ONCE before a pairwise join, not once per pair).
    */
  def fcosine(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val d = normA * normB
    when(d === 0.0, lit(0.0)).otherwise(fdot(a, b) / d)
  }

  /** ‖a‖₂ in double for `array<float>` (codegen path). */
  def fnorm(a: Column): Column = sqrt(fdot(a, a))

  /** Σ aᵢ·bᵢ in double. Works for any numeric array type; interpreted HOF —
    * prefer [[fdot]] for float arrays in hot paths.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Squared Euclidean distance in double. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast(DoubleType) - y.cast(DoubleType)
      diff * diff
    }), lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane signature against a literal plane matrix; output is
    * an array<int> of sign bits (1/0) — the LSH bucketing primitive for
    * cosine similarity. Native codegen (`graftglue.HyperplaneSig`): the
    * `transform(planes, p => when(dot(vec, p) >= 0, …))` HOF form was
    * CodegenFallback and kept the corpus-wide signature scan interpreted.
    */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, HyperplaneSig}
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(vec), planes))
  }
}
