package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resolution lookup: cluster assignments joined back to source membership
  * (reference: client/results.py `ResolverMatches.as_lookup` and the server
  * `match` operation).
  */
object Lookup {

  /** Cluster ↔ source-key lookup. `members` carries one row per namespaced
    * record: (id, source, rec_key, ...extra columns). Records no model
    * touched keep their own singleton cluster (left join + coalesce).
    */
  def asLookup(assignments: DataFrame, members: DataFrame): DataFrame =
    members.join(assignments, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("component"), col("id")))
      .drop("component")

  /** `match`: for probe keys in one source, return the co-clustered keys of
    * a target source.
    */
  def matchKeys(
      assignments: DataFrame, members: DataFrame,
      probeSource: String, targetSource: String): DataFrame = {
    val lookup = asLookup(assignments, members)
    val probe = lookup.filter(col("source") === probeSource)
      .select(col("cluster_id"), col("rec_key").as("key"))
    val target = lookup.filter(col("source") === targetSource)
      .select(col("cluster_id"), col("rec_key").as("matched_key"))
    probe.join(target, "cluster_id").select("key", "matched_key")
  }
}
