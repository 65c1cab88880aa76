package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Judgement processing: convert (shown cluster, endorsed sub-cluster) rows
  * into net pair-wise verdicts (reference: src/matchbox/common/eval.py
  * `process_judgements`).
  *
  * A user shown cluster (1234) who endorses (1), (23), (4) implies +1 for
  * pair (2,3) and -1 for every other pair of (1234). Because each
  * endorsement arrives as its own row, the reference uses weighted scoring
  * that sums to the right net regardless of row order:
  *
  * - pairs within the endorsed set: `+1 + (|shown| - |endorsed|) / |shown|`
  * - other pairs of the shown set: `-|endorsed| / |shown|`
  *
  * Implemented distributed: expansion joins, pair generation with a
  * sorted-array `transform` (no driver-side combinations), explode, and a
  * groupBy-sum keyed on the canonical pair.
  */
object Judgements {

  /** All sorted pairs of an array column, as structs (a, b). */
  private def pairsExpr(arr: String): String =
    s"""flatten(transform(array_sort($arr), (x, i) ->
       |  transform(slice(array_sort($arr), i + 2, size($arr)), y ->
       |    named_struct('a', x, 'b', y))))""".stripMargin

  /** @param judgements (shown, endorsed) cluster-id rows
    * @param expansion  (root, leaves array<long>) cluster expansion; endorsed
    *                   ids without an expansion are treated as singleton leaves
    * @return (a, b, net) canonical pairs with net endorsement weight
    */
  def net(judgements: DataFrame, expansion: DataFrame): DataFrame = {
    val shownExp = expansion.select(col("root").as("shown"), col("leaves").as("shown_leaves"))
    val endorsedExp = expansion.select(col("root").as("endorsed"), col("leaves").as("endorsed_leaves"))
    val expanded = judgements
      .join(shownExp, "shown")
      .join(endorsedExp, Seq("endorsed"), "left")
      .withColumn("endorsed_leaves",
        coalesce(col("endorsed_leaves"), array(col("endorsed").cast("long"))))
      .withColumn("n_shown", size(col("shown_leaves")))
      .withColumn("n_endorsed", size(col("endorsed_leaves")))

    val positive = expanded.select(
      explode(expr(pairsExpr("endorsed_leaves"))).as("p"),
      (lit(1.0) + (col("n_shown") - col("n_endorsed")) / col("n_shown")).as("w"))
    val allShown = expanded.select(
      col("n_shown"), col("n_endorsed"), col("endorsed_leaves"),
      explode(expr(pairsExpr("shown_leaves"))).as("p"))
    // negative = shown pairs not fully inside this row's endorsed set
    val negative = allShown
      .filter(not(
        array_contains(col("endorsed_leaves"), col("p.a")) &&
        array_contains(col("endorsed_leaves"), col("p.b"))))
      .select(col("p"), (-col("n_endorsed").cast("double") / col("n_shown")).as("w"))

    positive.unionByName(negative)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("w").as("net"))
  }

  /** All leaves endorsed across judgements (the judgement leaf universe). */
  def leaves(judgements: DataFrame, expansion: DataFrame): DataFrame = {
    val endorsedExp = expansion.select(col("root").as("endorsed"), col("leaves"))
    judgements
      .join(endorsedExp, Seq("endorsed"), "left")
      .withColumn("leaves", coalesce(col("leaves"), array(col("endorsed").cast("long"))))
      .select(explode(col("leaves")).as("id"))
      .distinct()
  }
}
