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

  /** Σ aᵢ·bᵢ in double. */
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

  /** Random-hyperplane signature: `planes` is an array<array<double>> literal
    * column; output is an array<int> of sign bits (1/0) — the LSH bucketing
    * primitive for cosine similarity.
    */
  def hyperplaneSignature(vec: Column, planes: Column): Column =
    transform(planes, p => when(dot(vec, p) >= 0.0, lit(1)).otherwise(lit(0)))
}
