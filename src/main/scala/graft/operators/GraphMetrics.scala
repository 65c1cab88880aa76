package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Distributed graph metrics over pair-edge lists (the shape every graft
  * linker/deduper emits: `left_id, right_id` match pairs).
  *
  * Matchbox resolves edges into clusters (components); these metrics answer
  * the next question an entity-resolution or dedup pipeline asks about its
  * pair graph: how dense is it, how skewed are the degrees, and how
  * clustered is it (triangles/wedges = global clustering coefficient —
  * a standard health check on candidate-pair quality: random noise pairs
  * produce wedges but few triangles, true duplicate groups close them).
  *
  * Triangle counting uses degree-ordered orientation (Suri &
  * Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
  * WWW 2011): orient each undirected edge from the lower-(degree, id) node
  * to the higher one. Every triangle then has exactly one vertex with two
  * outgoing edges, so counting (wedge ⋈ closing edge) counts each triangle
  * once — and the maximum out-degree is O(√m), which bounds the wedge
  * fan-out of hub nodes. At 100 TB this is the difference between a
  * shuffle-safe plan and "the last reducer" receiving a celebrity node's
  * square: all three steps (degree agg, wedge self-join on the wedge
  * centre, closing equi-join) are plain shuffle hash joins AQE can split.
  */
object GraphMetrics {

  /** Canonicalise an arbitrary pair list (possibly with both orientations,
    * self-loops, duplicates) to distinct undirected simple edges `a < b`.
    */
  def canonicalEdges(pairs: DataFrame, left: String, right: String): DataFrame =
    pairs
      .where(col(left) =!= col(right))
      .select(
        least(col(left), col(right)).as("a"),
        greatest(col(left), col(right)).as("b"))
      .distinct()

  /** Per-node degree of a canonical edge list: `(n, deg)`. One shuffle. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("deg"))

  /** Degree histogram `(degree, n_nodes)`, ordered by degree. */
  def degreeHistogram(edges: DataFrame): DataFrame =
    degrees(edges)
      .groupBy(col("deg").as("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")

  /** Single-row global stats of a canonical edge list:
    * `(n_nodes, n_edges, n_triangles, n_wedges)` — all exact BIGINT
    * (global clustering coefficient = 3·triangles / wedges, left to the
    * caller so the output stays integer-exact across engines).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // Feeds degree agg, two rank joins, the wedge join and the edge count —
    // materialise once.
    val e = edges.localCheckpoint(false)
    val deg = degrees(e).localCheckpoint(false)

    // Total order on nodes by (degree, id): ties broken by id so the
    // orientation is a strict tournament regardless of degree collisions.
    val rk = deg.select(col("n"), struct(col("deg"), col("n")).as("rk"))

    // Orient each edge low-rank → high-rank; keep the head's rank for the
    // wedge-ordering predicate below.
    val oriented = e
      .join(rk.select(col("n").as("a"), col("rk").as("rka")), "a")
      .join(rk.select(col("n").as("b"), col("rk").as("rkb")), "b")
      .select(
        when(col("rka") < col("rkb"),
          struct(col("a").as("u"), col("b").as("v"), col("rkb").as("rkv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("rka").as("rkv")))
          .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.rkv").as("rkv"))
      .localCheckpoint(false)

    // Semi-join reduction for the closure probe: the wedge stream is the
    // quadratic object here (Σ out-deg² rows — 1000× the edge count on a
    // dense graph), and every wedge would otherwise shuffle into the
    // closing-edge equi-join only for the overwhelming majority to miss.
    // Fit a Bloom filter over the oriented edge keys (Spark's native
    // BloomFilterAggregate — the same kernel Catalyst injects for runtime
    // join filters) and probe each wedge IN-STAGE, before the exchange:
    // only probable triangles (true ones + fpp misses) ever shuffle. False
    // positives are killed by the exact equi-join that follows, so the
    // count stays exact. The session runtime-filter caps are raised around
    // the fit (and restored) — this filter is deliberately edge-count
    // sized, not subject to the injected-filter heuristics.
    // Below ~1M edges (spark.graft.graph.bloomProbeMinEdges — specs lower
    // it to force the probe path) the wedge exchange is small enough that
    // the fit pass costs more than it saves — probe only at scale. (On one
    // box the enumeration is CPU-bound either way; on a real cluster the
    // eliminated exchange is the network win.)
    val spark = edges.sparkSession
    val minEdges = spark.conf
      .get("spark.graft.graph.bloomProbeMinEdges", "1000000").toLong
    val nEdgesV = e.count()
    val bloomBytes: Array[Byte] = if (nEdgesV < math.max(minEdges, 1L)) null else {
      val fpp = 0.01
      val numBits = math.max(
        org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(nEdgesV, fpp), 64L)
      val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      val oldItems = spark.conf.get(itemsKey, "4000000")
      val oldBits = spark.conf.get(bitsKey, "67108864")
      spark.conf.set(itemsKey, math.max(oldItems.toLong, nEdgesV).toString)
      spark.conf.set(bitsKey, math.max(oldBits.toLong, numBits).toString)
      try {
        val fit = ColumnBridge.column(
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            ColumnBridge.expression(xxhash64(col("u"), col("v"))),
            org.apache.spark.sql.catalyst.expressions.Literal(nEdgesV),
            org.apache.spark.sql.catalyst.expressions.Literal(numBits))
            .toAggregateExpression())
        oriented.agg(fit.as("bf")).head().getAs[Array[Byte]](0)
      } finally {
        spark.conf.set(itemsKey, oldItems)
        spark.conf.set(bitsKey, oldBits)
      }
    }
    def mightClose(x: Column, y: Column): Column =
      if (bloomBytes == null) lit(true) // small graph: no probe, no filter
      else ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(
            bloomBytes, org.apache.spark.sql.types.BinaryType),
          ColumnBridge.expression(xxhash64(x, y))))

    // Wedges at each orientation source: ordered pairs of out-neighbours.
    // Max out-degree is O(√m) under degree orientation, so the self-join
    // fan-out is bounded even on hub nodes.
    val e1 = oriented.select(col("u"), col("v").as("x"), col("rkv").as("rkx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("rkv").as("rky"))
    val wedges = e1.join(e2, Seq("u")).where(col("rkx") < col("rky"))
      .where(mightClose(col("x"), col("y")))
      .select(col("x").as("u"), col("y").as("v"))

    // A wedge (u; x, y) closes iff edge x→y exists — and x→y is exactly how
    // the closing edge is oriented (rk x < rk y), so a plain equi-join
    // counts each triangle once.
    val triangles = wedges.join(oriented.select("u", "v"), Seq("u", "v"))
      .agg(count(lit(1)).as("n_triangles"))

    val nodesWedges = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))

    nodesWedges.crossJoin(nEdges).crossJoin(triangles)
      .select("n_nodes", "n_edges", "n_triangles", "n_wedges")
  }

  /** Integer-exact PageRank over an undirected canonical edge list —
    * ranks in fixed-point `1/scale` units with ALL arithmetic in BIGINT,
    * so the result is bit-identical across engines and partitionings
    * (double-based PageRank sums in partition order and never is).
    *
    * Per iteration: `r'(n) = base + α·Σ_{m∼n} (r(m) div deg(m)) div 1`,
    * with `base = (1−α)·scale` and α = alphaNum/alphaDen, every division
    * a floor on nonnegative longs. Floor losses are ≤ deg(m) rank units
    * per node per iteration — at scale 1e8 that is an 1e-8-relative
    * perturbation, irrelevant for ranking, and identical in any engine
    * that floors the same way (DuckDB `//`, Spark `DIV`).
    *
    * Scale bound: `alphaNum · n_nodes · scale` must stay under 2^63 —
    * the default (85, 1e8) is safe past 10^9 nodes. Each iteration is
    * one equi-join + one aggregation on the node key (AQE-splittable);
    * the edge list and degrees are checkpointed once and reused, and
    * each round's rank frame is lazily checkpointed so the lineage stays
    * flat over iterations — the same discipline as
    * [[graft.operators.Components]].
    */
  def pageRank(
      edges: DataFrame, iters: Int, scale: Long = 100000000L,
      alphaNum: Long = 85, alphaDen: Long = 100): DataFrame =
    pageRankImpl(edges, None, iters, scale, alphaNum, alphaDen)

  /** Personalized PageRank: the teleport term lands only on `seeds` (one
    * id column), so rank mass diffuses OUT of the seed set — the standard
    * seed-expansion primitive ("find records/documents most connected to
    * a curated set"). Same integer fixed-point arithmetic as [[pageRank]],
    * so equally bit-exact across engines; non-seed nodes start at 0 and
    * earn rank only through in-flow.
    */
  def pageRankPersonalized(
      edges: DataFrame, seeds: DataFrame, iters: Int,
      scale: Long = 100000000L,
      alphaNum: Long = 85, alphaDen: Long = 100): DataFrame =
    pageRankImpl(edges, Some(seeds), iters, scale, alphaNum, alphaDen)

  private def pageRankImpl(
      edges: DataFrame, seeds: Option[DataFrame], iters: Int,
      scale: Long, alphaNum: Long, alphaDen: Long): DataFrame = {
    require(iters >= 1 && scale > 0 && alphaDen > 0 &&
      alphaNum >= 0 && alphaNum <= alphaDen)
    val e2 = edges.select(col("a").as("s"), col("b").as("t"))
      .unionAll(edges.select(col("b").as("s"), col("a").as("t")))
      .localCheckpoint(false)
    val deg = e2.groupBy(col("s").as("n")).agg(count(lit(1)).as("d"))
    val base = (alphaDen - alphaNum) * scale / alphaDen
    // sflag ∈ {0,1}: which nodes receive the teleport term. The global
    // variant tags every node, so the plan keeps one shape; the tag join
    // is on the node key the aggregation already shuffles on.
    val tagged = (seeds match {
      case None => deg.select(col("n"), col("d"), lit(1L).as("sflag"))
      case Some(sd) =>
        deg.join(
            sd.select(col(sd.columns.head).as("n")).distinct()
              .withColumn("sflag", lit(1L)),
            Seq("n"), "left")
          .select(col("n"), col("d"), coalesce(col("sflag"), lit(0L)).as("sflag"))
    }).localCheckpoint(false)
    var pr = tagged.select(col("n"), (lit(scale) * col("sflag")).as("r"))
    (1 to iters).foreach { _ =>
      val contrib = pr.join(tagged, "n")
        .select(col("n").as("s"), expr("r DIV d").as("c"))
      pr = e2.join(contrib, "s")
        .groupBy(col("t").as("n"))
        .agg(expr(s"($alphaNum * sum(c)) DIV $alphaDen").as("flow"))
        .join(tagged.select(col("n"), col("sflag")), "n")
        .select(col("n"), (col("flow") + lit(base) * col("sflag")).as("r"))
        .localCheckpoint(false)
    }
    pr
  }

  /** Synchronous label-propagation community detection (Raghavan, Albert
    * & Kumara 2007, Phys. Rev. E 76) made fully deterministic: labels
    * start as node ids; each iteration every node adopts the label most
    * frequent among its neighbours, ties broken by the SMALLEST label
    * (the paper breaks ties randomly; a total order makes the result a
    * pure function of the graph — bit-identical across engines and
    * partitionings, and expressible as an unrolled SQL oracle). A fixed
    * iteration count replaces the convergence test for the same reason.
    *
    * Per iteration: one equi-join (directed edge list ⋈ labels on the
    * source key) + a (node, label) count aggregation + a per-node argmin
    * of `struct(-count, label)` — all shuffle hash operations on the node
    * key with partial aggregation; no windows, no driver state. Each
    * round is lazily checkpointed to keep lineage flat, as in
    * [[pageRank]].
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val e2 = edges.select(col("a").as("s"), col("b").as("t"))
      .unionAll(edges.select(col("b").as("s"), col("a").as("t")))
      .localCheckpoint(false)
    var lab = e2.select(col("s").as("n")).distinct()
      .withColumn("lab", col("n"))
    (1 to iters).foreach { _ =>
      lab = e2.join(lab.withColumnRenamed("n", "s"), "s")
        .groupBy(col("t").as("n"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("n")
        .agg(min(struct((-col("cnt")).as("negc"), col("lab").as("lab"))).as("w"))
        .select(col("n"), col("w.lab").as("lab"))
        .localCheckpoint(false)
    }
    lab
  }

  /** Fixed-round k-core peeling (Seidman 1983 "Network structure and
    * minimum degree"; the distributed formulation is Montresor et al.
    * 2013's message-passing peeling): repeatedly drop nodes whose degree
    * in the SURVIVING subgraph is < k. The true k-core is the fixpoint;
    * a FIXED round count replaces the data-dependent convergence test so
    * the result is expressible as an unrolled SQL oracle — after R
    * rounds the survivor set is the standard "peeling depth R"
    * approximation from above (⊇ k-core, equal once peeling stabilises,
    * which on real graphs happens in a handful of rounds). k-core is the
    * classic graph-quality filter: spam/bot candidate pairs live in
    * low-core fringe, dense duplicate groups in high cores.
    *
    * Per round: one degree aggregation + two semi-joins (edges to
    * surviving endpoints) — all equi-operations on node keys, lazily
    * checkpointed per round like [[pageRank]].
    *
    * @return surviving edges after `rounds` peels at threshold `k`.
    */
  def kCoreEdges(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = edges.localCheckpoint(false)
    // Fixed-point early exit: if a round removes no edge, every surviving
    // node already has deg >= k, so all remaining rounds are no-ops — stop
    // issuing cluster jobs. On dense graphs (where no node ever peels) this
    // turns O(rounds) full-graph passes into one, which is what blew up
    // 10×-data wall time before. Cost: one count() per executed round, on a
    // frame the checkpoint materialises anyway.
    var prev = e.count()
    var round = 0
    var fixed = false
    while (round < rounds && !fixed) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("n"))
      e = e
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(false)
      val cnt = e.count()
      fixed = cnt == prev || cnt == 0L
      prev = cnt
      round += 1
    }
    e
  }

  /** Per-round peeling summary of [[kCoreEdges]]: `(round, n_nodes, n_edges)`
    * after each of `rounds` peels at threshold `k` — always exactly `rounds`
    * rows, so the health view stays non-empty even when the core collapses.
    * Early-exits at the fixed point like [[kCoreEdges]] and replays the
    * settled row for the remaining rounds driver-side (bit-identical to the
    * unrolled oracle, which computes the no-op rounds explicitly).
    */
  def kCorePeelStats(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges.localCheckpoint(false)
    var prev = e.count()
    var lastNodes = 0L
    var lastEdges = 0L
    var fixed = false
    val rows = (1 to rounds).map { r =>
      if (!fixed) {
        val keep = degrees(e).filter(col("deg") >= k).select(col("n"))
        e = e
          .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
          .select("a", "b")
          .localCheckpoint(false)
        lastEdges = e.count()
        lastNodes =
          if (lastEdges == 0L) 0L
          else e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
            .distinct().count()
        fixed = lastEdges == prev || lastEdges == 0L
        prev = lastEdges
      }
      (r, lastNodes, lastEdges)
    }
    rows.toDF("round", "n_nodes", "n_edges").orderBy("round")
  }

  /** Reference-quality O(n³) triangle count for specs. */
  private[graft] def triangleStatsNaive(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col("a").as("x"), col("b").as("y"))
    val e2 = edges.select(col("a").as("y"), col("b").as("z"))
    val e3 = edges.select(col("a").as("x"), col("b").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = degrees(edges)
    val nw = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    val ne = edges.agg(count(lit(1)).as("n_edges"))
    nw.crossJoin(ne).crossJoin(tri)
      .select("n_nodes", "n_edges", "n_triangles", "n_wedges")
  }
}
