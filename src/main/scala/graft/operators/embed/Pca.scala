package graft.operators.embed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the whitening/rotation step real
  * embedding pipelines run before quantization (OPQ's rotation, FAISS's
  * PCAMatrix) or semantic dedup.
  *
  * Determinism discipline (the repo's Num pattern, lifted to matrices):
  * inputs are quantized to integer micros (`round(v·10^6)` — documented
  * input quantization, the same contract as every scaled-integer money
  * sum here), and the Gram/linear sums are computed as DECIMAL(37,0)/
  * DECIMAL(38,0) — exact integer arithmetic, so the one distributed
  * aggregate is partition-order-insensitive and the downstream
  * eigendecomposition sees bit-identical input on every run. The driver
  * then holds only the (dim² + dim) sufficient statistics — the same
  * bounded object FAISS's PCA training holds — and runs a fixed-sweep
  * cyclic Jacobi eigensolver (no data-dependent iteration count, so the
  * whole fit is a pure function of the table).
  *
  * At 100 TB: one corpus pass emitting the upper-triangle products
  * (constant group domain — dim·(dim+1)/2 + dim ≈ 2.1k groups at
  * dim=64 — so partial aggregation collapses everything map-side), a
  * driver-side 64×64 eigensolve, and a map-only projection pass with the
  * rotation broadcast as a literal.
  */
object Pca {

  /** Exact sufficient statistics + the eigensolve result. */
  case class Fit(
      n: Long,
      mean: Array[Double], // in original (unscaled) units
      values: Array[Double], // ALL eigenvalues, descending
      vectors: Array[Array[Double]], // top-k rows, orthonormal, sign-fixed
      trace: Double)

  /** One pass of exact integer sums: S_i = Σ x_i and S_ij = Σ x_i·x_j
    * over micro-quantized components (i ≤ j; linear sums ride along as
    * j = −1 rows).
    */
  def sums(emb: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[java.math.BigDecimal], Array[Array[java.math.BigDecimal]]) = {
    // cast to DOUBLE before scaling: float·int would coerce to a FLOAT
    // multiply and quantize on a lower-precision product
    val q = graft.Tables.spread(emb.select(expr(
      s"""transform($vecCol,
         |  v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"""
        .stripMargin).as("x"))
      .filter(size(col("x")) === dim))
    // spread before the dim² fan-out: each input row explodes into
    // ~dim·(dim+3)/2 product structs (≈2.1k at dim=64), so a
    // single-row-group scan would run the whole Gram computation in ONE
    // task (r13 bench: 62-80 s serial). The aggregation below is exact
    // integer — partition-order-insensitive — so widening is free.
    //
    // Per-row products are exact LONGs (the Num.bigSum discipline: cheap
    // integer arithmetic per row, a 128-bit DECIMAL only in the
    // aggregation buffer where billions of rows can overflow a long).
    // x_i·x_j fits a long iff |micros| ≤ floor(sqrt(2^63−1)) ≈ 3.037e9,
    // i.e. |v| ≤ ~3037 — three orders of magnitude above any normalized
    // embedding. Guarded LOUDLY below (one cheap map-only aggregate), not
    // silently wrapped.
    val mxRow = q.agg(max(expr("array_max(transform(x, a -> abs(a)))"))).head()
    val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
    require(mx <= 3037000499L,
      s"PCA long-exact product domain exceeded: |component micros| = $mx > " +
        "3.037e9 (|v| > ~3037); quantized inputs must be embedding-scaled")
    // Products via the native GramFlat kernel (one fused loop per row, the
    // same exact long multiplies in the same canonical order) instead of
    // the interpreted flatten/transform/struct HOF nest, which paid a
    // lambda interpretation per product (~20 CPU-s per pass at 2 k×64 —
    // the dominant cost of this operator). posexplode positions map back
    // to (i, j) here; the decimal sums see the identical addends.
    val posI = Array.ofDim[Int](dim * (dim + 3) / 2)
    val posJ = Array.ofDim[Int](dim * (dim + 3) / 2)
    var pos0 = 0
    for (i <- 0 until dim) {
      posI(pos0) = i; posJ(pos0) = -1; pos0 += 1
      for (j <- i until dim) { posI(pos0) = i; posJ(pos0) = j; pos0 += 1 }
    }
    val agg = q
      .select(posexplode(graft.functions.GramFlat(col("x"), dim))
        .as(Seq("pos", "p")))
      .groupBy("pos").agg(
        sum(col("p").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sp"),
        count(lit(1)).as("cnt"))
      .collect()
    val lin = Array.fill(dim)(java.math.BigDecimal.ZERO)
    val quad = Array.fill(dim, dim)(java.math.BigDecimal.ZERO)
    var n = 0L
    agg.foreach { r =>
      val (i, j) = (posI(r.getInt(0)), posJ(r.getInt(0)))
      val s = r.getDecimal(1)
      if (j < 0) { lin(i) = s; n = r.getLong(2) }
      else { quad(i)(j) = s; quad(j)(i) = s }
    }
    (n, lin, quad)
  }

  /** Fixed-sweep cyclic Jacobi for a symmetric matrix: 12 row-cyclic
    * sweeps, rotations skipped only for exact zeros — iteration count
    * never depends on the data, so the result is a pure function of the
    * input matrix. Returns (eigenvalues, eigenvectors as rows), unsorted.
    */
  def jacobi(a0: Array[Array[Double]], sweeps: Int = 12)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - sn * vqk
              v(q)(k) = sn * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Full fit: exact sums → covariance → Jacobi → top-k descending
    * eigenpairs, each eigenvector sign-fixed (largest-|component| entry
    * positive; index ties take the first).
    */
  def fit(emb: DataFrame, vecCol: String, dim: Int, k: Int): Fit = {
    val (n, lin, quad) = sums(emb, vecCol, dim)
    fitFromSums(n, lin, quad, k)
  }

  /** Eigensolve from already-collected sufficient statistics — a pure
    * driver-side function (microseconds at dim=64). Callers that need
    * run-twice determinism evidence re-run [[sums]] and this separately
    * instead of paying the distributed pass once per [[fit]].
    */
  def fitFromSums(
      n: Long, lin: Array[java.math.BigDecimal],
      quad: Array[Array[java.math.BigDecimal]], k: Int): Fit = {
    val dim = lin.length
    require(n > 0L, "PCA needs a non-empty embedding table")
    val nd = n.toDouble
    val mean = Array.tabulate(dim)(i => lin(i).doubleValue() / nd / 1e6)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (quad(i)(j).doubleValue() / nd -
        lin(i).doubleValue() * lin(j).doubleValue() / (nd * nd)) / 1e12
    }
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val (vals, vecs) = jacobi(cov)
    val order = (0 until dim).sortBy(i => (-vals(i), i))
    val values = order.map(vals).toArray
    val top = order.take(k).map { i =>
      val row = vecs(i).clone()
      var best = 0
      var m = 0.0
      var c = 0
      while (c < dim) {
        val av = math.abs(row(c))
        if (av > m) { m = av; best = c }
        c += 1
      }
      if (row(best) < 0.0) { var t = 0; while (t < dim) { row(t) = -row(t); t += 1 } }
      row
    }.toArray
    Fit(n, mean, values, top, trace)
  }

  /** Map-only projection: micro-quantized, mean-centered dot products
    * against the broadcast rotation, emitted long-form as integer micros
    * — per-row pure functions, deterministic on any partitioning.
    */
  def project(emb: DataFrame, idCol: String, vecCol: String, f: Fit)
      : DataFrame = {
    // Native fused kernel (quantize → center → rotate → micro-round, the
    // rotation as a reference object) — the same arithmetic in the same
    // fold/rounding order as the interpreted transform/zip_with/aggregate
    // spelling it replaces, which paid k·dim lambda interpretations per
    // row. Spread past the single-row-group scan so the per-row cost
    // parallelizes; per-row pure, so output is unchanged.
    graft.Tables.spread(emb.filter(size(col(vecCol)) === f.mean.length))
      .select(col(idCol),
        graft.functions.PcaProjectMicros(col(vecCol), f.mean, f.vectors)
          .as("proj"))
      .select(col(idCol), posexplode(col("proj")).as(Seq("comp", "y_micro")))
  }
}
