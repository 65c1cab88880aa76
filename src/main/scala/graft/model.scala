package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed model vocabulary — the matchbox data shapes as case classes, for
  * pipelines that want compile-time safety over the operator outputs
  * (reference: common/arrow.py SCHEMA_MODEL_EDGES / SCHEMA_CLUSTERS /
  * SCHEMA_JUDGEMENTS as the untyped contracts).
  */
object model {

  /** A scored pair edge — deduper/linker output. */
  final case class Edge(left_id: Long, right_id: Long, score: Double)

  /** A cluster assignment — resolver output. */
  final case class ClusterAssignment(id: Long, component: Long)

  /** A cluster ↔ source-key lookup row. */
  final case class LookupRow(cluster_id: Long, source: String, rec_key: Long)

  /** A pairwise judgement verdict (+1 endorsed / -1 rejected). */
  final case class Verdict(left_id: Long, right_id: Long, verdict: Int)

  implicit class EdgeOps(df: DataFrame) {
    /** Typed view of a (left_id, right_id, score) frame. */
    def asEdges: Dataset[Edge] = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select("left_id", "right_id", "score").as[Edge]
    }

    /** Typed view of an (id, component) frame. */
    def asClusters: Dataset[ClusterAssignment] = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select("id", "component").as[ClusterAssignment]
    }
  }
}
