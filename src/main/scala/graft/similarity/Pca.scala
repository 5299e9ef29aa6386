package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PCA / OPQ-style embedding rotation (SURVEY §2.G48) — the whitening
  * step a vector-curation pipeline runs before product quantization or
  * clustering: rotate embeddings into their principal axes so PQ
  * subspaces carry balanced variance (Ge et al., "Optimized Product
  * Quantization", CVPR 2013 — the "parametric" variant: one global
  * rotation from the data's second moments, no iterative codebook
  * coupling).
  *
  * Scale shape: the scatter matrix is ONE pass via the bounded
  * [[org.apache.spark.sql.graftglue.GramSum]] aggregate (a d²-long buffer
  * per partition, map-side combined — the relational unnest-and-group
  * formulation would explode every row 4096×); the eigendecomposition is
  * driver-side cyclic Jacobi over a d×d matrix (model-sized by
  * definition); the rotation itself is the codegen'd
  * [[org.apache.spark.sql.graftglue.MatVecMul]] projection — zero
  * shuffle, matrix rides the task binary as a reference object.
  *
  * Determinism: the scatter sums are EXACT integers (floor-quantized
  * components — the [[Clustering]] contract), so the q_gram oracle
  * hash-matches; Jacobi on identical input doubles with a fixed sweep
  * schedule produces identical rotations on every run/JVM (pure
  * double arithmetic, no RNG); rotated outputs are therefore
  * deterministic end-to-end (spec-pinned, with orthonormality and
  * diagonalization invariants).
  */
object Pca {

  /** Scatter matrix as (i, j, s) rows: s = Σ_rows floor(v_i·scale) ·
    * floor(v_j·scale), exact longs. `dim` is declared, not probed (the
    * [[Ann]] no-driver-head lesson); rows whose vectors are null/mixed-dim
    * are rejected by the aggregate itself.
    */
  def gram(df: DataFrame, vecCol: String, dim: Int,
           scale: Double = 1048576.0): DataFrame = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, GramSum}
    val agg = ColumnBridge.column(GramSum(
      ColumnBridge.expression(col(vecCol)), scale).toAggregateExpression())
    df.agg(agg.as("__s"))
      .select(posexplode(col("__s")).as(Seq("__p", "s")))
      .select((col("__p") / dim).cast(LongType).as("i"),
        (col("__p") % dim).cast(LongType).as("j"), col("s"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix; returns the
    * rotation as ROWS = eigenvectors, ordered by eigenvalue descending,
    * each row sign-normalized so its largest-|component| entry is
    * positive (a total, engine-free convention — eigenvectors are only
    * defined up to sign).
    */
  private[similarity] def jacobiEigen(sym: Array[Array[Double]],
                                      sweeps: Int = 16): Array[Array[Double]] = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are eigenvectors; order by eigenvalue (diagonal) desc,
    // tie-break by column index (stable), sign-normalize each
    val order = (0 until d).sortBy(c => (-a(c)(c), c))
    order.map { cIdx =>
      val row = Array.tabulate(d)(k => v(k)(cIdx))
      val m = row.indices.maxBy(k => (math.abs(row(k)), -k))
      if (row(m) < 0) row.map(-_) else row
    }.toArray
  }

  /** The OPQ rotation for `df`'s vectors: one [[gram]] pass (exact integer
    * sums, collected — d² longs, model-sized), Jacobi on the scaled-back
    * scatter, rows = principal axes by variance descending.
    */
  def rotation(df: DataFrame, vecCol: String, dim: Int,
               scale: Double = 1048576.0): Array[Array[Double]] = {
    val rows = gram(df, vecCol, dim, scale).collect()
    require(rows.nonEmpty, "rotation of an empty frame")
    val sym = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      sym(r.getLong(0).toInt)(r.getLong(1).toInt) =
        r.getLong(2).toDouble / (scale * scale)
    }
    jacobiEigen(sym)
  }

  /** Rotate a vector column by a literal matrix — a zero-shuffle
    * codegen'd projection; output is array<float> so it feeds the same
    * consumers as raw embeddings ([[Ann]]/[[Pq]]/[[Clustering]]).
    */
  def rotate(vec: Column, r: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, MatVecMul}
    ColumnBridge.column(MatVecMul(ColumnBridge.expression(vec), r))
  }

  /** Whole-frame form: every column of `df` rides along, `vecCol` is
    * replaced by its rotation.
    */
  def rotateAll(df: DataFrame, vecCol: String,
                r: Array[Array[Double]]): DataFrame =
    df.withColumn(vecCol, rotate(col(vecCol), r))
}
