package graft.operators.dedup

import graft.functions.CosineSimilarity
import graft.operators.ann.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate pair detection.
  *
  * Two paths:
  *
  *  - [[allPairs]] — exact threshold join. A naive `a.join(b, idA < idB)`
  *    is a BroadcastNestedLoopJoin: one driver-fed cartesian that dies at
  *    scale. Here every vector is instead replicated to the block-pairs of a
  *    triangle partitioning (vector's block `b = id % B` joins block-pairs
  *    `(i, j), i <= j` where `b == i` or `b == j`), and candidate pairs come
  *    from an **equi-join on the block-pair key** — a plain shuffle join
  *    whose O(n²) compute is spread evenly over B(B+1)/2 reducers with
  *    O(n·B) shuffle volume. Result is bit-identical to the cartesian
  *    (cosine is exactly commutative in IEEE doubles). Exact all-pairs is
  *    inherently quadratic compute; pick `numBlocks` ≈ cluster parallelism
  *    so each reducer's (n/B)² chunk fits in memory.
  *
  *  - [[lshPairs]] — the corpus-scale approximate path: banded
  *    random-hyperplane signatures (OR over `bands` bands of
  *    `planesPerBand` AND-ed sign bits) generate candidates via a bucket
  *    equi-join; exact cosine verifies candidates only. Recall is tunable
  *    with bands/planes; candidates are a vanishing fraction of n².
  */
object EmbedDedup {

  /** Exact cosine-threshold self-join via triangle block partitioning. */
  def allPairs(
      vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBlocks: Int = 8): DataFrame = {
    val spark = vectors.sparkSession
    val v = vectors
      .select(col(idCol).cast("long").as("vid"), col(vecCol).as("vec"))
      .withColumn("blk", pmod(col("vid"), lit(numBlocks)).cast("int"))
    val blockPairs = spark.range(numBlocks.toLong * numBlocks)
      .select(
        (col("id") / numBlocks).cast("int").as("bi"),
        pmod(col("id"), lit(numBlocks)).cast("int").as("bj"))
      .filter(col("bi") <= col("bj"))
    val left = v.join(broadcast(blockPairs), col("blk") === col("bi"))
      .select(col("bi"), col("bj"), col("vid").as("lid"), col("vec").as("lvec"))
    val right = v.join(broadcast(blockPairs), col("blk") === col("bj"))
      .select(col("bi").as("rbi"), col("bj").as("rbj"),
        col("vid").as("rid"), col("vec").as("rvec"))
    // A cross-block pair materialises in exactly one orientation (lower
    // block on the left), so only same-block pairs need the id-order filter.
    left.join(right,
        col("bi") === col("rbi") && col("bj") === col("rbj") &&
          (col("bi") < col("rbj") || col("lid") < col("rid")))
      .withColumn("sim", CosineSimilarity(col("lvec"), col("rvec")))
      .filter(col("sim") >= threshold)
      .select(
        least(col("lid"), col("rid")).as("left_id"),
        greatest(col("lid"), col("rid")).as("right_id"),
        col("sim"))
  }

  /** (id, vec, band, key) banded hyperplane signatures — shared by the
    * batch self-join and the streaming twin
    * ([[graft.streaming.Streams.incrementalEmbedDedup]]): both sides of the
    * stream-vs-corpus contract MUST hash with the same plane families or
    * the stream never collides with the corpus buckets.
    */
  private[graft] def bandedSignatures(
      vectors: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String,
      bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    val sig = array((0 until bands).map { k =>
      struct(lit(k).as("band"),
        Knn.lshBucket(vecCol, planesPerBand, dim, planeOffset = k * planesPerBand).as("key"))
    }: _*)
    vectors
      .select(col(idCol).cast("long").as(idAs), col(vecCol).as(vecAs),
        explode(sig).as("bs"))
      .select(col(idAs), col(vecAs), col("bs.band").as("band"), col("bs.key").as("key"))
  }

  /** Approximate cosine-threshold self-join: banded hyperplane LSH
    * candidates, exact cosine verify. Output ⊆ [[allPairs]] output.
    */
  def lshPairs(
      vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 8, planesPerBand: Int = 4,
      dim: Int = 64): DataFrame = {
    val v = vectors.select(col(idCol).cast("long").as("vid"), col(vecCol).as("vec"))
    val banded = bandedSignatures(vectors, idCol, vecCol, "vid", "vec",
      bands, planesPerBand, dim)
    val cands = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("lid"), col("b.vid").as("rid"))
      .distinct()
    cands
      .join(v.select(col("vid").as("lid"), col("vec").as("lvec")), "lid")
      .join(v.select(col("vid").as("rid"), col("vec").as("rvec")), "rid")
      .withColumn("sim", CosineSimilarity(col("lvec"), col("rvec")))
      .filter(col("sim") >= threshold)
      .select(col("lid").as("left_id"), col("rid").as("right_id"), col("sim"))
  }
}
