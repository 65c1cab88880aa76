package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise precision / recall of model clusters against human judgements
  * (reference: src/matchbox/common/eval.py `precision_recall`).
  *
  * The reference expands clusters to pairs with itertools.combinations on
  * the driver; here cluster→pair expansion is a self-equi-join on the
  * cluster id (shuffle on cluster id; skew-safe for matching workloads where
  * cluster sizes are bounded), and the endorse/reject netting is a groupBy
  * sum. Everything stays distributed until the final two ratios.
  */
object PrecisionRecall {

  /** @param assignments (id, component) cluster assignments (model output)
    * @param judgements  (left_id, right_id, verdict) verdict +1 endorsed / -1 rejected,
    *                    possibly many judgements per pair
    * @return single row: tp, n_model, n_validation, precision, recall
    *
    * Semantics follow the reference: model pairs are implied within-cluster
    * pairs restricted to leaves that were judged; neutrally-netted pairs
    * (sum verdict == 0) are discarded from both sides; validation pairs are
    * those with positive net. Ratios are computed as exact integer counts
    * divided once — deterministic across engines.
    */
  def apply(assignments: DataFrame, judgements: DataFrame): DataFrame =
    fromNet(assignments, netOf(judgements))

  /** Canonicalise (left, right) pair orientation and net the verdicts —
    * shared by single- and multi-model scoring so the netting semantics
    * cannot diverge between them.
    */
  private def netOf(judgements: DataFrame): DataFrame = judgements
    .select(
      least(col("left_id"), col("right_id")).as("a"),
      greatest(col("left_id"), col("right_id")).as("b"),
      col("verdict"))
    .groupBy("a", "b")
    .agg(sum("verdict").cast("double").as("net"))

  /** Full reference semantics: judgements as (shown, endorsed) cluster rows
    * plus a cluster expansion table — netted by [[Judgements.net]].
    */
  def fromJudgements(
      assignments: DataFrame, judgements: DataFrame, expansion: DataFrame): DataFrame =
    fromNet(assignments, Judgements.net(judgements, expansion))

  /** Multi-model scoring (reference eval.py:52-153 `precision_recall` over a
    * *list* of models): pairs are restricted to leaves present in **all**
    * models ∩ the judgement leaves, so every model is scored on the same
    * universe; validation pairs (net > 0 within shared leaves) are common to
    * all models. Returns one row per model: (model, tp, n_model,
    * n_validation, precision, recall), ordered by model index.
    *
    * Distributed shape: the leaf intersection is one unioned groupBy
    * (id → count == nModels + 1), not N sequential joins; each model's pair
    * expansion is a self-equi-join on its cluster id over shared leaves
    * only.
    */
  def multi(models: Seq[DataFrame], judgements: DataFrame): DataFrame = {
    val net = netOf(judgements)
    val leaves = net.filter(col("net") =!= 0.0)
      .select(col("a").as("id"))
      .union(net.filter(col("net") =!= 0.0).select(col("b").as("id")))
      .distinct()
    multiFromNet(models, net, leaves)
  }

  /** Multi-model scoring from (shown, endorsed) judgement rows + cluster
    * expansion — the full reference input shape (eval.py:52 signature).
    */
  def multiFromJudgements(
      models: Seq[DataFrame], judgements: DataFrame, expansion: DataFrame): DataFrame =
    multiFromNet(models, Judgements.net(judgements, expansion),
      Judgements.leaves(judgements, expansion))

  /** Pair expansion is quadratic in cluster size: one over-merged cluster of
    * judged leaves emits |C|²/2 pairs out of a single reducer — and an
    * over-permissive linker is exactly what eval exists to catch, so the
    * "clusters are small" assumption cannot be trusted here. Any cluster
    * with more judged members than `spark.graft.eval.maxClusterSize`
    * (default 100000) either fails loudly, naming the cluster, or — with
    * `spark.graft.eval.expandLargeClusters=true` — has its expansion spread
    * over triangle blocks (see [[expandPairs]]) so the evaluator still
    * completes. The probe is one map-side-combinable count aggregate over
    * the (already checkpointed) membership — negligible next to the
    * expansion. Returns the components that need the blocked path (empty in
    * the usual case).
    */
  private def guardClusterSizes(member: DataFrame, what: String): Seq[Any] = {
    val conf = member.sparkSession.conf
    val maxSize = conf.get("spark.graft.eval.maxClusterSize", "100000").toLong
    val expand = conf.get("spark.graft.eval.expandLargeClusters", "false").toBoolean
    val oversized = member.groupBy("component").agg(count(lit(1)).as("csize"))
      .filter(col("csize") > maxSize)
      .orderBy(col("csize").desc)
      .collect()
    if (oversized.nonEmpty && !expand) {
      val r = oversized.head
      val size = r.getLong(1)
      throw new IllegalStateException(
        s"$what cluster ${r.get(0)} has $size judged members; pair expansion would " +
          s"emit ~${size * size / 2} pairs on one reducer. This usually means the " +
          "model over-merged. Raise spark.graft.eval.maxClusterSize only if a " +
          s"cluster of $size is genuinely expected, or set " +
          "spark.graft.eval.expandLargeClusters=true to spread the expansion " +
          "over triangle blocks.")
    }
    // read generically — components may carry string ids upstream of hashing
    oversized.map(_.get(0)).toSeq
  }

  /** Within-cluster pair expansion. Clusters under the size cap use the
    * plain self-equi-join on the cluster id (one shuffle, one reducer per
    * cluster). Oversized clusters take the triangle block partition
    * (the [[graft.operators.dedup.EmbedDedup.allPairs]] device): members
    * replicate to the block-pairs of a B×B triangle and pairs come from an
    * equi-join on (component, blockPair), so the |C|²/2 compute spreads
    * over B(B+1)/2 reducers with O(|C|·B) shuffle instead of one reducer.
    * Output for both paths: canonical (a < b) pairs, each exactly once.
    */
  private def expandPairs(member: DataFrame, oversized: Seq[Any]): DataFrame = {
    val plain = {
      val m = if (oversized.isEmpty) member
        else member.filter(!col("component").isInCollection(oversized))
      m.alias("x")
        .join(m.alias("y"),
          col("x.component") === col("y.component") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b"))
    }
    if (oversized.isEmpty) plain
    else {
      val spark = member.sparkSession
      val numBlocks = spark.conf.get("spark.graft.eval.expansionBlocks", "16").toInt
      require(numBlocks >= 1,
        s"spark.graft.eval.expansionBlocks must be >= 1, got $numBlocks " +
          "(a non-positive block count would silently drop every pair from " +
          "oversized clusters)")
      // hash the id before pmod: ids need not be numeric (pmod on a string id
      // yields null → zero pairs, silently), and hashing also spreads skewed
      // numeric id ranges evenly over blocks
      val big = member.filter(col("component").isInCollection(oversized))
        .withColumn("blk", pmod(xxhash64(col("id")), lit(numBlocks.toLong)).cast("int"))
      val blockPairs = spark.range(numBlocks.toLong * numBlocks)
        .select(
          (col("id") / numBlocks).cast("int").as("bi"),
          pmod(col("id"), lit(numBlocks)).cast("int").as("bj"))
        .filter(col("bi") <= col("bj"))
      val left = big.join(broadcast(blockPairs), col("blk") === col("bi"))
        .select(col("component"), col("bi"), col("bj"), col("id").as("xa"))
      val right = big.join(broadcast(blockPairs), col("blk") === col("bj"))
        .select(col("component").as("rc"), col("bi").as("rbi"),
          col("bj").as("rbj"), col("id").as("xb"))
      // cross-block pairs materialise in exactly one orientation; same-block
      // pairs need the id-order filter (the allPairs invariant)
      val blocked = left.join(right,
          col("component") === col("rc") &&
            col("bi") === col("rbi") && col("bj") === col("rbj") &&
            (col("bi") < col("rbj") || col("xa") < col("xb")))
        .select(least(col("xa"), col("xb")).as("a"), greatest(col("xa"), col("xb")).as("b"))
      plain.unionByName(blocked)
    }
  }

  private def multiFromNet(
      models: Seq[DataFrame], rawNet: DataFrame,
      rawJudgementLeaves: DataFrame): DataFrame = {
    require(models.nonEmpty, "at least one model required")
    val net = rawNet.filter(col("net") =!= 0.0).localCheckpoint(false)
    val judgementLeaves = rawJudgementLeaves
    val leafSets = models.map(_.select(col("id")).distinct()) :+ judgementLeaves
    val shared = leafSets.reduce(_ union _)
      .groupBy("id").count()
      .filter(col("count") === leafSets.size)
      .select("id")
      .localCheckpoint(false)

    val validation = net.filter(col("net") > 0)
      .join(shared.withColumnRenamed("id", "a"), "a")
      .join(shared.withColumnRenamed("id", "b"), "b")
      .select(col("a"), col("b"), lit(1L).as("v"))

    val perModel = models.zipWithIndex.map { case (assignments, i) =>
      val member = assignments.join(shared, "id").localCheckpoint(false)
      val oversized = guardClusterSizes(member, s"model $i")
      val modelPairs = expandPairs(member, oversized)
        .join(net, Seq("a", "b")) // drop un-judged and neutrally-judged pairs
        .select(col("a"), col("b"), lit(1L).as("m"))
      modelPairs.join(validation, Seq("a", "b"), "full_outer")
        .agg(
          coalesce(sum(col("m") * col("v")), lit(0L)).as("tp"),
          coalesce(sum("m"), lit(0L)).as("n_model"),
          coalesce(sum("v"), lit(0L)).as("n_validation"))
        .select(
          lit(i.toLong).as("model"),
          col("tp"), col("n_model"), col("n_validation"),
          (col("tp").cast("double") / col("n_model")).as("precision"),
          (col("tp").cast("double") / col("n_validation")).as("recall"))
    }
    perModel.reduce(_ unionByName _).orderBy("model")
  }

  private def fromNet(assignments: DataFrame, rawNet: DataFrame): DataFrame = {
    // materialised once: the model side and the validation side of the
    // final full-outer join both read the netted pairs
    val net = rawNet.filter(col("net") =!= 0.0).localCheckpoint(false)

    val judgedLeaves = net.select(col("a").as("id"))
      .union(net.select(col("b").as("id"))).distinct()

    val member = assignments.join(judgedLeaves, "id").localCheckpoint(false)
    val oversized = guardClusterSizes(member, "model")
    val modelPairs = expandPairs(member, oversized)
      .join(net, Seq("a", "b")) // drop un-judged and neutrally-judged pairs

    // Shared-leaves rule: validation pairs must lie within the model's leaf
    // universe too (reference eval.py computes the intersection of leaf sets).
    val modelLeaves = assignments.select(col("id")).distinct()
    val validation = net.filter(col("net") > 0)
      .join(modelLeaves.withColumnRenamed("id", "a"), "a")
      .join(modelLeaves.withColumnRenamed("id", "b"), "b")
      .select("a", "b")

    // Single-pass counts: full-outer join model and validation pairs once,
    // then one aggregation yields all three counts (avoids three separate
    // count jobs chained by cross joins).
    val m = modelPairs.select(col("a"), col("b"), lit(1L).as("m"))
    val v = validation.select(col("a"), col("b"), lit(1L).as("v"))
    val counts = m.join(v, Seq("a", "b"), "full_outer")
      .agg(
        coalesce(sum(col("m") * col("v")), lit(0L)).as("tp"),
        coalesce(sum("m"), lit(0L)).as("n_model"),
        coalesce(sum("v"), lit(0L)).as("n_validation"))

    counts.select(
      col("tp"), col("n_model"), col("n_validation"),
      (col("tp").cast("double") / col("n_model")).as("precision"),
      (col("tp").cast("double") / col("n_validation")).as("recall"))
  }
}
