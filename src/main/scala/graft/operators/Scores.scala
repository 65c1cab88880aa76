package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-edge score handling (reference: src/matchbox/client/results.py
  * `normalise_model_scores`).
  */
object Scores {

  /** Canonicalise pair orientation (smaller id first) and keep the highest
    * score per pair — one groupBy-max, shuffled on the canonical pair.
    *
    * Scores are validated the way the reference does (results.py
    * `normalise_model_scores` raises on null/NaN/out-of-[0,1]) — but as a
    * per-row check fused into the same scan, not a separate validation
    * pass: the guard is the score projection itself, so it can't be pruned
    * and costs no extra job at any scale.
    */
  def normalise(edges: DataFrame): DataFrame = {
    val invalid = col("score").isNull || isnan(col("score")) ||
      col("score") < 0.0 || col("score") > 1.0
    val checked = when(invalid, raise_error(concat(
        lit("model score must be in [0.0, 1.0], got "),
        coalesce(col("score").cast("string"), lit("null")))))
      .otherwise(col("score"))
    edges
      .select(
        least(col("left_id"), col("right_id")).as("left_id"),
        greatest(col("left_id"), col("right_id")).as("right_id"),
        checked.as("score"))
      .groupBy("left_id", "right_id")
      .agg(max("score").as("score"))
  }
}
