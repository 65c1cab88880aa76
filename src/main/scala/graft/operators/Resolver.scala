package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resolver: turn per-model scored edges into entity clusters
  * (reference: src/matchbox/client/resolvers/components.py
  * `Components.compute_clusters` — per-model score thresholds default 0.0,
  * edges filtered then unioned, connected components over the survivors).
  */
object Resolver {

  /** @param modelEdges  model name -> (left_id, right_id, score) edges
    * @param thresholds  per-model minimum score (inclusive); missing = 0.0
    * @return (id, component) cluster assignments, component = min member id
    */
  def computeClusters(
      modelEdges: Map[String, DataFrame],
      thresholds: Map[String, Double] = Map.empty): DataFrame = {
    require(modelEdges.nonEmpty, "resolver needs at least one model's edges")
    val unknown = thresholds.keySet -- modelEdges.keySet
    require(unknown.isEmpty, s"Unknown models in thresholds: $unknown")
    val filtered = modelEdges.map { case (name, edges) =>
      edges
        .filter(col("score") >= thresholds.getOrElse(name, 0.0))
        .select(col("left_id").cast("long").as("src"), col("right_id").cast("long").as("dst"))
    }
    Components.connected(filtered.reduce(_ union _))
  }
}
