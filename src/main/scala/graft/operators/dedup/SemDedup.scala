package graft.operators.dedup

import graft.functions.CosineSimilarity
import graft.operators.cluster.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication: k-means-cluster the embedding space, then find
  * cosine near-duplicate pairs only WITHIN each cluster — the SemDeDup
  * recipe (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", arXiv:2303.09540).
  *
  * Exact all-pairs is Θ(n²) compare volume however it is partitioned;
  * clustering first drops that to Σ n_c² — with balanced cells a k-fold
  * reduction, and the misses are exactly the pairs k-means already called
  * semantically distant (cell-boundary straddlers). This is the standard
  * scale path for corpus-level semantic pruning.
  *
  * Plan shape: the cluster fit is the distributed Lloyd of
  * [[graft.operators.cluster.KMeans]]; within-cell candidates come from an
  * equi-join keyed on (cell, triangle-block-pair) — the cell bounds the
  * candidate set, the triangle sub-blocking (as in [[EmbedDedup.allPairs]])
  * spreads a mega-cell's quadratic compute over B(B+1)/2 reducers instead
  * of one, so a skewed cluster cannot pin a single reducer.
  */
object SemDedup {

  /** Within-cluster cosine near-dup pairs: (left_id, right_id, sim, cell).
    * Output is a subset of `EmbedDedup.allPairs(...)` at the same
    * threshold — identical vectors always land in the same cell (the
    * assignment is deterministic), so exact duplicates are never missed.
    */
  def pairs(
      vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int = 8, iters: Int = 4,
      numBlocks: Int = 4): DataFrame = {
    val spark = vectors.sparkSession
    val fit = KMeans.fit(vectors, idCol, vecCol, k, iters)
    val v = vectors
      .select(col(idCol).cast("long").as("vid"), col(vecCol).as("vec"))
      .join(fit.assignments.select(col("id").as("vid"), col("cell")), "vid")
      .withColumn("blk", pmod(col("vid"), lit(numBlocks)).cast("int"))
    val blockPairs = spark.range(numBlocks.toLong * numBlocks)
      .select(
        (col("id") / numBlocks).cast("int").as("bi"),
        pmod(col("id"), lit(numBlocks)).cast("int").as("bj"))
      .filter(col("bi") <= col("bj"))
    val left = v.join(broadcast(blockPairs), col("blk") === col("bi"))
      .select(col("cell"), col("bi"), col("bj"),
        col("vid").as("lid"), col("vec").as("lvec"))
    val right = v.join(broadcast(blockPairs), col("blk") === col("bj"))
      .select(col("cell").as("rcell"), col("bi").as("rbi"), col("bj").as("rbj"),
        col("vid").as("rid"), col("vec").as("rvec"))
    left.join(right,
        col("cell") === col("rcell") &&
          col("bi") === col("rbi") && col("bj") === col("rbj") &&
          (col("bi") < col("rbj") || col("lid") < col("rid")))
      .withColumn("sim", CosineSimilarity(col("lvec"), col("rvec")))
      .filter(col("sim") >= threshold)
      .select(
        least(col("lid"), col("rid")).as("left_id"),
        greatest(col("lid"), col("rid")).as("right_id"),
        col("sim"), col("cell"))
  }
}
