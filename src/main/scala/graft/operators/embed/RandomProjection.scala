package graft.operators.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003,
  * "Database-friendly random projections": entries drawn from ±1/√k
  * preserve pairwise distances within 1±ε for k = O(log n / ε²)) — the
  * cheap, data-independent dimensionality reduction an embedding
  * pipeline reaches for before the data-dependent one (PCA) is worth a
  * fit: no training pass, no sufficient statistics, one map-only scan.
  *
  * The projection matrix is deterministic — entry (r, c) takes the sign
  * of xxhash64's avalanche of (r·dim + c) — so every run, every engine,
  * and every executor agrees on it with zero driver state beyond the
  * (k × dim) literal. The matrix rides into the scan through the same
  * fused native kernel OPQ's rotation uses ([[graft.functions.MatVec]]):
  * flat double[] reference object, whole-stage codegen, no per-row
  * allocation beyond the output array.
  *
  * Scale shape: stateless map over the corpus — no shuffle, no fit, no
  * driver round trip; the 100 TB cost is exactly one read + one write.
  */
object RandomProjection {

  /** The deterministic ±1/√k matrix (k rows × dim cols). */
  def matrix(dim: Int, k: Int): Seq[Seq[Double]] = {
    require(dim >= 1 && k >= 1)
    val scale = 1.0 / math.sqrt(k.toDouble)
    (0 until k).map { r =>
      (0 until dim).map { c =>
        if (avalanche(r.toLong * dim + c) >= 0) scale else -scale
      }
    }
  }

  /** xxhash64-style avalanche of one long — cheap, deterministic,
    * sign-balanced (matches the spirit, not the wire format, of the
    * engine hash; nothing downstream depends on WHICH mixer this is,
    * only that it is fixed).
    */
  private def avalanche(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Project `vecCol` (length `dim`) down to `k` dims in place. Rows of
    * the wrong length are dropped, as in [[Pca.project]].
    */
  def project(df: DataFrame, vecCol: String, dim: Int, k: Int): DataFrame =
    graft.Tables.spread(df.filter(size(col(vecCol)) === dim))
      .withColumn(vecCol, graft.functions.MatVec(col(vecCol), matrix(dim, k)))
}
