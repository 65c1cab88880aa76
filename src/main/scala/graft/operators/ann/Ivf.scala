package graft.operators.ann

import graft.functions.Centroids
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor search.
  *
  * Coarse quantizer: spherical k-means fit with Lloyd iterations on a
  * bounded, deterministic sample of L2-normalized vectors, on the driver —
  * the standard IVF practice at corpus scale (FAISS trains its quantizer on
  * a sample too: the cells only need to partition space, not see every
  * point). Fitting on a 100 TB corpus with a distributed solver would spend
  * cluster-wide jobs to refine cells whose quality plateaus after a few
  * thousand samples.
  *
  * Targets are assigned to cells and queries ranked against centroids by
  * the native codegen'd [[graft.functions.NearestCentroids]] — one fused
  * loop per row, no row explosion, no assignment shuffle. A query probes
  * its `nprobe` nearest cells and exact-reranks only those targets; the
  * cell id is the only join key, so at scale the per-query scan drops from
  * N to ~N·nprobe/nlist.
  */
object Ivf {

  /** Driver-side Lloyd fit over a deterministic hash-ordered sample.
    * Returns `nlist` centroids of unit-normalized points (empty cells keep
    * their previous centroid).
    */
  private[graft] def fitCentroids(
      targets: DataFrame, idCol: String, vecCol: String,
      nlist: Int, maxSample: Int = 4096, iters: Int = 5,
      seed: Long = 42L): Seq[Seq[Double]] = {
    val sample = targets
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(maxSample)
      .select("v")
      .collect()
      .map { r =>
        val a = r.getSeq[Float](0).map(_.toDouble).toArray
        val n = math.sqrt(a.map(x => x * x).sum)
        if (n == 0) a else a.map(_ / n)
      }
    require(sample.nonEmpty, "cannot fit a quantizer on an empty target set")
    val dim = sample.head.length
    val rnd = new java.util.Random(seed)
    val centroids = Array.tabulate(nlist)(_ => sample(rnd.nextInt(sample.length)).clone())

    for (_ <- 1 to iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Long](nlist)
      sample.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < nlist) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = p(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      for (c <- 0 until nlist if counts(c) > 0; i <- 0 until dim)
        centroids(c)(i) = sums(c)(i) / counts(c)
    }
    centroids.map(_.toSeq).toSeq
  }

  /** @param excludeSelf as in [[Knn.bruteForce]]: default suits
    *   self-search; pass false for cross-dataset queries with colliding
    *   id spaces.
    */
  def search(
      queries: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    val cents = fitCentroids(targets, idCol, vecCol, nlist)

    val cells = targets
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("te"))
      .withColumn("cell", element_at(Centroids.nearest(col("te"), cents, 1), 1))

    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qe"))
      .withColumn("cell", explode(Centroids.nearest(col("qe"), cents, nprobe)))

    val scored = probes.join(cells, "cell")
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", graft.functions.CosineSimilarity(col("qe"), col("te")))
    Knn.topKPerQuery(scored, k)
  }
}
