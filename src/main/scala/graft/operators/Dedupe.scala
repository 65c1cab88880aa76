package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication methodologies emitting scored pair edges
  * `(left_id, right_id, score)` — the matchbox model-output shape
  * (reference: src/matchbox/client/models/dedupers/naive.py).
  */
object Dedupe {

  /** NaiveDeduper: records agreeing on every `uniqueFields` column are
    * duplicates. Expressed as a hash self-equi-join on the fields (Catalyst
    * plans a shuffle on the composite key — no cross product), pairs
    * canonicalised as `left_id < right_id`, score 1.0.
    *
    * The reference suppresses row self-matches with a synthetic row index;
    * the canonical `<` comparison does the same here while also fixing the
    * pair orientation (the reference keeps an arbitrary orientation per
    * sorted pair — we keep the deterministic one).
    */
  def naive(df: DataFrame, id: String, uniqueFields: Seq[String]): DataFrame = {
    val l = df.select((id +: uniqueFields).map(col): _*).alias("l")
    val r = df.select((id +: uniqueFields).map(col): _*).alias("r")
    val on = uniqueFields
      .map(f => col(s"l.$f") === col(s"r.$f"))
      .reduce(_ && _) && (col(s"l.$id") < col(s"r.$id"))
    l.join(r, on)
      .select(
        col(s"l.$id").cast("long").as("left_id"),
        col(s"r.$id").cast("long").as("right_id"))
      .distinct()
      .withColumn("score", lit(1.0))
  }

  /** Connectivity-equivalent star form of [[naive]] for resolver
    * composition: one edge (block-min id → member id) per non-min block
    * member instead of all C(n,2) equality pairs. Connected components
    * over these edges EQUAL components over [[naive]]'s full pair set —
    * each equality block is one star, and every naive score is 1.0, so no
    * per-model threshold can distinguish the dropped pairs — but the edge
    * count is linear in rows where the pair set is quadratic in block
    * size: at 10× the data a fixed block vocabulary grows the pair set
    * 100× (measured: mb_pipeline_e2e 2.5 s → 98.5 s at sf0.1 → sf1 on the
    * pair form; linear on the star form). Rows with a NULL unique field
    * match nothing in [[naive]] (SQL equality) and are excluded here too.
    * Use [[naive]] when the deliverable IS the pair list (the reference
    * model-output contract); use this when the pairs only feed a resolver.
    */
  def naiveStarEdges(df: DataFrame, id: String, uniqueFields: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(uniqueFields.map(col): _*)
    df.select((id +: uniqueFields).map(col): _*)
      .filter(uniqueFields.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("rep", min(col(id)).over(w))
      .filter(col("rep") =!= col(id))
      .select(
        col("rep").cast("long").as("left_id"),
        col(id).cast("long").as("right_id"))
      .withColumn("score", lit(1.0))
  }

  /** SQL twin of [[naive]] for the DuckDB oracle. */
  def naiveSql(table: String, id: String, uniqueFields: Seq[String]): String = {
    val on = uniqueFields.map(f => s"l.$f = r.$f").mkString(" AND ")
    s"""SELECT DISTINCT l.$id AS left_id, r.$id AS right_id, CAST(1.0 AS DOUBLE) AS score
       |FROM $table l JOIN $table r ON $on AND l.$id < r.$id""".stripMargin
  }
}
