package graft.operators.ann

import graft.operators.embed.Pca
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OPQ-style pre-rotation for product quantization (Ge et al. CVPR 2013,
  * "Optimized Product Quantization"; the FAISS `OPQMatrix,PQx` /
  * `PCAMatrix,PQx` pre-transform stack): rotate the vectors with an
  * orthonormal matrix BEFORE quantization so the codebook budget is spent
  * along the data's principal directions, then run the UNCHANGED PQ/ADC
  * machinery ([[Pq.search]]) in rotated space.
  *
  * The rotation is the full PCA eigenbasis ([[Pca.fit]] with k = dim — the
  * PCA initialisation of OPQ, which FAISS ships as `PCAMatrix` without
  * dimensionality reduction; full iterative OPQ alternates this with
  * codebook refits), applied WITHOUT mean-centering: a pure orthonormal
  * map preserves dot products and norms, so cosine in rotated space IS
  * cosine in the original space — the exact rerank needs no inverse
  * transform and returns the true similarities, while the compressed-
  * domain ADC scan sees variance-aligned subspaces.
  *
  * Scale shape: the fit is the bounded PCA sufficient-statistics pass
  * (driver holds dim² sums); the rotation is a map-only dim²-flop
  * expression with the matrix broadcast as a literal (spread past
  * single-row-group scans, a no-op once splits ≥ cores); everything
  * downstream is [[Pq.search]] verbatim — codes, ADC, rerank untouched.
  */
object Opq {

  /** Rotate `vecCol` in place: y = V·x as `array<float>` (V = the fit's
    * eigenvector rows). Rows whose vector length differs from the fit
    * dimension are dropped, as in [[Pca.project]].
    */
  def rotate(df: DataFrame, vecCol: String, f: Pca.Fit): DataFrame = {
    val dim = f.mean.length
    require(f.vectors.length == dim,
      s"OPQ needs the FULL rotation: fit k=${f.vectors.length} != dim=$dim")
    // native fused mat-vec (same double accumulation order as the HOF
    // spelling it replaced, so results are bit-identical — spec-pinned)
    graft.Tables.spread(df.filter(size(col(vecCol)) === dim))
      .withColumn(vecCol,
        graft.functions.MatVec(col(vecCol), f.vectors.toSeq.map(_.toSeq)))
  }

  /** PQ search over PCA-rotated space — parameters as [[Pq.search]]. */
  def search(
      queries: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 256, rerankFactor: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    val dim = targets.select(size(col(vecCol))).head().getInt(0)
    val f = Pca.fit(targets, vecCol, dim, dim)
    Pq.search(
      rotate(queries, vecCol, f), rotate(targets, vecCol, f),
      idCol, vecCol, k, m, ksub, rerankFactor, excludeSelf)
  }
}
