package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas, "Database-friendly
  * random projections", JCSS 2003): reduce embeddings from `dim` to
  * `outDim` dimensions with a dense ±1 sign matrix — pairwise distances
  * are preserved to within (1 ± ε) with ε ~ sqrt(log n / outDim), which
  * makes the REDUCED space a legitimate substrate for every consumer in
  * this package (brute/IVF/LSH top-k, k-means, k-center, margin mining)
  * at outDim/dim of the scan, shuffle, and memory cost. The complementary
  * reduction to [[Pca.rotation]]: PCA learns the directions from the data
  * (a gram pass over the corpus); JL needs NO training pass at all — the
  * right tool when the corpus is too large or too fresh to pre-scan, the
  * dimensionality is hostile (d in the thousands), or reduction must be
  * identical across corpora that share no training window (cross-snapshot
  * mining: both sides project with the same seed and land in the SAME
  * space).
  *
  * Determinism without RNG state (the [[Ann.hyperplanes]] device): entry
  * (i, j) is the PARITY of the 60-bit md5 prefix of "seed:i:j" mapped to
  * ±1 — reproducible across runs, partitions, AND engines, so an oracle
  * rebuilds the exact matrix in SQL from the same md5 recipe. The
  * projection itself is [[org.apache.spark.sql.graftglue.MatVecMul]]
  * (matrix as ONE reference object — constant plan size in outDim·dim,
  * fused codegen loop, double accumulation narrowed once per component:
  * DuckDB replays it as `list_dot_product` + `CAST(… AS REAL)`).
  *
  * Scale shape: zero-shuffle projection, no training job, no driver
  * state beyond the outDim·dim sign matrix. Sub-linear speedups come from
  * what follows: a cross join in the reduced space moves outDim/dim of
  * the bytes per pair.
  */
object Jl {

  /** The deterministic ±1 sign matrix (outDim rows × dim columns) —
    * parity of the shared [[Ann.md5Prefix60]] device.
    */
  def signMatrix(outDim: Int, dim: Int, seed: Int = 42): Array[Array[Double]] = {
    require(outDim > 0 && dim > 0, "jl: dimensions must be positive")
    Array.tabulate(outDim, dim) { (i, j) =>
      if (Ann.md5Prefix60(s"$seed:$i:$j") % 2 == 0) 1.0 else -1.0
    }
  }

  /** Replace `vecCol` with its `outDim`-dimensional projection (every
    * other column rides through) — `array<float>`, so the result feeds
    * the same consumers as raw embeddings. Parameter order matches
    * [[jlTopK]] (`dim` then `outDim`) — the same pair ordered two ways
    * across one object's API is a silent-empty-result trap (a transposed
    * call builds a mismatched matrix, MatVecMul nulls every vector, and
    * downstream top-k quietly drops the null scores).
    */
  def project(df: DataFrame, vecCol: String, dim: Int, outDim: Int,
              seed: Int = 42): DataFrame =
    Pca.rotateAll(df, vecCol, signMatrix(outDim, dim, seed))

  /** Brute-force cosine top-k in the REDUCED space: project both sides
    * with the same matrix, then [[Ann.bruteForceTopK]] — the baseline for
    * measuring how much neighborhood structure `outDim` dimensions keep
    * (plans/ANN.md records recall vs the full-space truth). Output and
    * conventions are bruteForceTopK's.
    */
  def jlTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, dim: Int, outDim: Int, k: Int,
             seed: Int = 42): DataFrame = {
    val r = signMatrix(outDim, dim, seed)
    Ann.bruteForceTopK(
      Pca.rotateAll(queries.select(col(idCol), col(vecCol)), vecCol, r),
      Pca.rotateAll(corpus.select(col(idCol), col(vecCol)), vecCol, r),
      idCol, vecCol, k)
  }
}
