package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-edge score handling (reference: src/matchbox/client/results.py
  * `normalise_model_scores`).
  */
object Scores {

  /** Canonicalise pair orientation (smaller id first) and keep the highest
    * score per pair — one groupBy-max, shuffled on the canonical pair.
    */
  def normalise(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("left_id"), col("right_id")).as("left_id"),
        greatest(col("left_id"), col("right_id")).as("right_id"),
        col("score"))
      .groupBy("left_id", "right_id")
      .agg(max("score").as("score"))
}
