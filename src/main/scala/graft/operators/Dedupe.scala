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

  /** SQL twin of [[naive]] for the DuckDB oracle. */
  def naiveSql(table: String, id: String, uniqueFields: Seq[String]): String = {
    val on = uniqueFields.map(f => s"l.$f = r.$f").mkString(" AND ")
    s"""SELECT DISTINCT l.$id AS left_id, r.$id AS right_id, CAST(1.0 AS DOUBLE) AS score
       |FROM $table l JOIN $table r ON $on AND l.$id < r.$id""".stripMargin
  }
}
