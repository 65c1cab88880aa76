package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster sampling for human judgement (reference:
  * client/eval/samples.py + server sample_for_eval — serve clusters with
  * their member records for annotation).
  *
  * The reference backend samples uniformly from the not-recently-judged
  * clusters; the richer contract this twin implements (the r12 verdict's
  * eval-sample ask) stratifies by cluster-size band and, within each
  * band, prefers the clusters where two resolutions of the same records
  * DISAGREE most — the clusters whose judgement will actually move the
  * evaluation, which is what a judgement budget should buy. Everything is
  * exact integer arithmetic, so the pick is deterministic and
  * oracle-hashable.
  *
  * Disagreement of cluster c (of `resolution`) against `alternative`:
  * with members split over alternative clusters as counts n_1..n_k
  * (n = Σ n_i), the within-c pairs split apart by the alternative are
  *   split_pairs = C2(n) − Σ C2(n_i),   C2(x) = x(x−1)/2
  * — pair-counting sufficient statistics (the [[RandIndex]] machinery),
  * never materialised pairs. Rank key: integer ppm
  * `split_pairs·10⁶ DIV total_pairs` (truncating division — DuckDB `//`
  * matches Spark `DIV` exactly, including toward-zero behaviour).
  *
  * Size band: ⌊log2 n⌋ computed as `length(bin(n)) − 1` — exact in both
  * engines (no floating log whose last ulp could flip a band boundary).
  *
  * Scale shape at 100 TB: one groupBy to contingency cells, one to
  * cluster stats, a per-band window over cluster-level rows (bounded by
  * cluster count, not records), and one membership join for the sampled
  * clusters only.
  */
object Samples {

  /** @param resolution  (id, component) clustering under evaluation
    * @param alternative (id, alt) second resolution of the same ids
    * @param perBand     clusters to keep per size band
    * @return one row per sampled cluster: (band, cluster_id, csize,
    *         split_pairs, total_pairs, dis_ppm), deterministic
    */
  def disagreementStratified(
      resolution: DataFrame, alternative: DataFrame, perBand: Int): DataFrame = {
    require(perBand >= 1, s"perBand must be >= 1, got $perBand")
    def c2(c: org.apache.spark.sql.Column) = shiftright(c * (c - 1), 1)
    val cells = resolution.join(alternative, "id")
      .groupBy("component", "alt")
      .agg(count(lit(1)).as("n_i"))
    val clusters = cells.groupBy("component")
      .agg(sum("n_i").as("csize"), sum(c2(col("n_i"))).as("agree_pairs"))
      .select(
        col("component").as("cluster_id"),
        col("csize"),
        (c2(col("csize")) - col("agree_pairs")).as("split_pairs"),
        c2(col("csize")).as("total_pairs"),
        (length(bin(col("csize"))) - 1).cast("long").as("band"))
      .withColumn("dis_ppm",
        expr("(split_pairs * 1000000L) DIV greatest(total_pairs, 1L)"))
    clusters
      .withColumn("rn", row_number().over(
        Window.partitionBy("band")
          .orderBy(col("dis_ppm").desc, col("cluster_id").asc)))
      .filter(col("rn") <= perBand)
      .select("band", "cluster_id", "csize", "split_pairs", "total_pairs", "dis_ppm")
  }
}
