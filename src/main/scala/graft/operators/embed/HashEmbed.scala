package graft.operators.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic hashing-trick bag-of-words embedding (Weinberger et al.
  * 2009, "Feature Hashing for Large Scale Multitask Learning"): token →
  * md5 bucket in [0, dim), vector = per-bucket token counts as doubles.
  *
  * This is the corpus-side ENCODER SLOT of the retrieval pipeline: a real
  * production stack swaps a neural encoder into the same (id, text) →
  * (id, float[dim]) contract; the hashing trick keeps the round's
  * composed flagship (`dx_rag_e2e`) fully deterministic and
  * cross-engine-exact (md5 nibbles and integer counts — the same device
  * `Selection.nbTokens` uses for its 256 NB buckets) while exercising the
  * identical downstream plumbing (QC census, index build, serving).
  *
  * Scale shape: explode + two keyed aggregations (map-side combine on
  * both), then a map-only densify from the collected (bucket, count)
  * pairs — no joins, no UDFs, nothing corpus-wide.
  */
object HashEmbed {

  def embed(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 256, s"dim must be in [1, 256], got $dim")
    docs
      .select(col(idCol).as("id"),
        explode(expr(s"split(trim($textCol), '\\\\s+')")).as("tok"))
      .withColumn("b",
        expr(s"CAST(conv(substring(md5(tok), 1, 2), 16, 10) AS BIGINT) % $dim"))
      .groupBy("id", "b").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(collect_list(struct(col("b"), col("c"))).as("bc"))
      // float, matching the embeddings table's physical type (the ANN
      // operators' native element type); counts < 2^24 are float-exact.
      // map_from_entries is hoisted OUT of the transform lambda: HOF
      // lambdas are interpreted and re-evaluate invariant subexpressions
      // per ELEMENT, so the inline spelling built the map dim× per row
      // (same values — the hoist is free).
      .withColumn("m", expr("map_from_entries(bc)"))
      .select(col("id"), expr(
        s"""transform(sequence(0L, ${dim - 1}L),
           | i -> CAST(coalesce(element_at(m, i), 0L) AS FLOAT))""".stripMargin)
        .as("embedding"))
  }
}
