package graft.operators.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor search.
  *
  * Coarse quantizer: MLlib KMeans over L2-normalized vectors (spherical
  * k-means approximation, so euclidean cell assignment tracks cosine
  * neighborhoods). Targets are partitioned into `nlist` cells; a query
  * probes its `nprobe` nearest cells and exact-reranks only those targets.
  * At corpus scale the cell id is the shuffle/partition key and the scan
  * per query drops from N to ~N * nprobe / nlist.
  */
object Ivf {

  private def normalized(vecCol: String) =
    expr(
      s"""transform($vecCol, x -> CAST(x AS DOUBLE) /
         | sqrt(aggregate($vecCol, 0D, (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""".stripMargin)

  def search(
      queries: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = targets.sparkSession
    import spark.implicits._

    val tv = targets
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("te"))
      .withColumn("features", array_to_vector(normalized("te")))
    // random init: k-means|| spends several jobs picking seeds, which
    // dominates fit time; for a coarse quantizer random seeds + a few
    // Lloyd iterations give equivalent cells
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(3)
      .setInitMode("random").fit(tv)
    val cells = model.transform(tv).select(col("neighbor_id"), col("te"), col("prediction").as("cell"))

    // Tiny centroid table (nlist rows) — broadcast for the probe ranking.
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")

    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qe"))
      .withColumn("qn", normalized("qe"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist",
        expr("aggregate(zip_with(qn, centroid, (a, b) -> (a - b) * (a - b)), 0D, (s, x) -> s + x)"))
      .withColumn("probe_rank",
        row_number().over(Window.partitionBy("query_id").orderBy(col("dist"), col("cell"))))
      .filter(col("probe_rank") <= nprobe)
      .select("query_id", "qe", "cell")

    probes.join(cells, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.functions.CosineSimilarity(col("qe"), col("te")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id")))
          .cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
