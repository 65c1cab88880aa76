package graft.operators.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Brute force is the correctness baseline: broadcast the (small) query set
  * against the distributed target set, compute cosine with codegen'd
  * `zip_with`/`aggregate`, rank per query with a window. At 100 TB the
  * target side stays partitioned and never shuffles; only top-k rows per
  * query leave the executors.
  *
  * The LSH path buckets vectors by random-hyperplane sign bits
  * (deterministic pseudo-random hyperplanes derived from a hash-seeded
  * LCG), joins on the bucket, and reranks candidates exactly — the
  * standard recall/cost trade for corpus-scale ANN.
  */
object Knn {

  /** Cosine similarity between two float-array columns, in double precision
    * (sequential left-to-right fold — deterministic).
    */
  val cosineExpr: String =
    """aggregate(zip_with(%s, %s, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, p) -> a + p)
      | / (sqrt(aggregate(%s, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |    * sqrt(aggregate(%s, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin

  /** Native codegen'd cosine (graft.functions.CosineSimilarity) — same
    * accumulation order as the HOF formulation above, so results are
    * bit-identical, but the pair loop stays inside whole-stage codegen.
    */
  private def cosine(a: String, b: String) =
    graft.functions.CosineSimilarity(col(a), col(b))

  /** Per-query top-k via the custom bounded-heap operator
    * (graft.plans.TopK): O(n log k) per partition and O(queries·k) memory
    * after the hash exchange, where the window-function idiom would sort
    * every query's full candidate list.
    */
  private[ann] def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    graft.plans.TopK.perKey(
      scored, Seq("query_id"), "sim", k, tieCols = Seq("neighbor_id"))
      .select("query_id", "neighbor_id", "rank", "sim")

  /** @param excludeSelf drop (query_id == neighbor_id) pairs — correct for
    *   self-search over one corpus (the default usage); pass false when
    *   queries and targets are DIFFERENT datasets whose ids may
    *   coincidentally collide, or id-equal true neighbors are silently lost.
    */
  def bruteForce(
      queries: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qe"))
    val t = targets.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("te"))
    val scored = t.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", cosine("qe", "te"))
    topKPerQuery(scored, k)
  }

  /** Deterministic ±1 hyperplanes: component i of plane p is the sign of a
    * splitmix-style hash of (p, i).
    */
  private def hyperplane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      var z = (p.toLong << 32 | i.toLong) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if ((z ^ (z >>> 31)) >= 0) 1.0 else -1.0
    }

  /** Sign-bit bucket from `numPlanes` hyperplanes; `planeOffset` selects an
    * independent plane family so banded LSH can derive per-band buckets.
    * Runs as the native codegen'd
    * [[graft.functions.HyperplaneBits]] — one fused loop per row rather
    * than `numPlanes` interpreted higher-order-function lambdas.
    */
  def lshBucket(vecCol: String, numPlanes: Int, dim: Int,
      planeOffset: Int = 0): org.apache.spark.sql.Column =
    graft.functions.Sketches.hyperplaneBits(
      col(vecCol),
      (0 until numPlanes).map(p => hyperplane(planeOffset + p, dim).toSeq))

  /** Multi-table random-hyperplane LSH (the standard recall lever: a single
    * 6-plane table only finds neighbors agreeing on all 6 sign bits —
    * recall collapses as similarity falls below ~0.95). Each of `tables`
    * independent plane families hashes both sides; candidates are the union
    * of per-table bucket collisions, deduped once, then exact-reranked.
    * Recall rises as 1-(1-p^b)^T while candidate volume stays ~T·n/2^b per
    * query — the knob to turn at corpus scale is `tables`, not brute force.
    *
    * Scale shape: queries are broadcast, so the 8× target-side explode is
    * pure map-side compute (no target shuffle); only candidate pairs reach
    * the dedup exchange, and the top-k operator's map-side partial bounds
    * the rerank shuffle.
    */
  /** @param excludeSelf as in [[bruteForce]]: default suits self-search;
    *   pass false for cross-dataset queries with colliding id spaces.
    */
  def lsh(
      queries: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 6, dim: Int = 64, tables: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    require(tables >= 1, "need at least one hash table")
    val tableBuckets = (0 until tables)
      .map(t => lshBucket(vecCol, numPlanes, dim, planeOffset = t * numPlanes))
    def hashed(df: DataFrame, idAs: String) =
      df.select(col(idCol).cast("long").as(idAs),
        posexplode(array(tableBuckets: _*)).as(Seq("tbl", "bucket")))
    // Candidate generation and dedup carry bare id pairs — the vectors
    // would otherwise ride through the dedup exchange `tables` times over.
    // Vectors come back after: targets in one equi-join (broadcastable by
    // AQE when the candidate set is small), queries as an explicit broadcast.
    val cand = hashed(targets, "neighbor_id")
      .join(broadcast(hashed(queries, "query_id")), Seq("tbl", "bucket"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand
      .join(targets.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("te")), "neighbor_id")
      .join(broadcast(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qe"))), "query_id")
      .withColumn("sim", cosine("qe", "te"))
    topKPerQuery(scored, k)
  }
}
