package graft

import graft.operators.{Components, Dedupe, Link, Scores}
import org.apache.spark.sql.functions._

class MatchboxSpec extends SparkSpec {
  import spark.implicits._

  test("components recovers the (nation, segment) groups from chain edges") {
    val customer = Tables(spark, sfDir, "customer")
    val truth = customer
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(min("c_custkey").as("component"), collect_list("c_custkey").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id"), col("component"))
    val got = Registry.byName("mb_components").fn(spark, sfDir)
    assert(got.count() == truth.count())
    assert(got.except(truth).isEmpty && truth.except(got).isEmpty)
  }

  test("components handles a long path and isolated cliques (both paths)") {
    val edges = ((1L to 99L).map(i => (i, i + 1)) ++ Seq((1000L, 1001L), (1001L, 1002L)))
      .toDF("src", "dst")
    for (threshold <- Seq(0L, Long.MaxValue)) { // distributed and driver path
      val comp = Components.connected(edges, smallGraphThreshold = threshold).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((1L to 100L).forall(comp(_) == 1L), s"threshold=$threshold")
      assert(Seq(1000L, 1001L, 1002L).forall(comp(_) == 1000L), s"threshold=$threshold")
    }
  }

  test("distributed and driver components agree on the customer chain graph") {
    val customer = Tables(spark, sfDir, "customer")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey", "c_mktsegment").orderBy("c_custkey")
    val edges = customer
      .withColumn("dst", lead("c_custkey", 1).over(w))
      .filter(col("dst").isNotNull)
      .select(col("c_custkey").cast("long").as("src"), col("dst").cast("long").as("dst"))
    val dist = Components.connected(edges, smallGraphThreshold = 0)
    val local = Components.connected(edges)
    assert(dist.except(local).isEmpty && local.except(dist).isEmpty)
  }

  test("naive dedupe emits each duplicate pair exactly once, canonically") {
    val pairs = Dedupe.naive(Tables(spark, sfDir, "customer"), "c_custkey",
      Seq("c_nationkey", "c_mktsegment"))
    assert(pairs.filter(col("left_id") >= col("right_id")).isEmpty)
    assert(pairs.groupBy("left_id", "right_id").count().filter(col("count") > 1).isEmpty)
  }

  test("naiveStarEdges: components equal the full pair set's, with linear edges") {
    val cust = Tables(spark, sfDir, "customer")
    val fields = Seq("c_nationkey", "c_mktsegment")
    val pairEdges = Dedupe.naive(cust, "c_custkey", fields)
      .select(col("left_id").as("src"), col("right_id").as("dst"))
    val starEdges = Dedupe.naiveStarEdges(cust, "c_custkey", fields)
      .select(col("left_id").as("src"), col("right_id").as("dst"))
    assert(starEdges.count() < pairEdges.count())
    val a = Components.connected(pairEdges)
    val b = Components.connected(starEdges)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // NULL unique fields match nothing in either form
    val withNulls = Seq((1L, Option("x")), (2L, Option("x")),
      (3L, None), (4L, None)).toDF("id", "v")
    assert(Dedupe.naiveStarEdges(withNulls, "id", Seq("v")).count() == 1)
  }

  test("mergeResolutions unions co-membership transitively and keeps singletons") {
    import graft.operators.Lookup
    // A: {1,2} {3} {4,5}; B: {2,3} {4} {6}
    val a = Seq((1L, 1L), (1L, 2L), (3L, 3L), (4L, 4L), (4L, 5L)).toDF("cluster_id", "leaf_id")
    val b = Seq((2L, 2L), (2L, 3L), (4L, 4L), (6L, 6L)).toDF("cluster_id", "leaf_id")
    val merged = Lookup.mergeResolutions(a, b).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    // {1,2}∪{2,3} → {1,2,3} rep 1; {4,5} stays; 6 singleton
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("mergeResolutions never merges unrelated clusters that reuse an id") {
    import graft.operators.Lookup
    // both resolutions use cluster id 1 for disjoint leaf sets — ids are
    // arbitrary per resolution, so these must stay separate components
    val a = Seq((1L, 1L), (1L, 2L)).toDF("cluster_id", "leaf_id")
    val b = Seq((1L, 10L), (1L, 11L)).toDF("cluster_id", "leaf_id")
    val merged = Lookup.mergeResolutions(a, b).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("viewCluster gathers one cluster's records across sources, qualified or merged") {
    import graft.operators.Lookup
    val custSrc = Seq((1L, "alice", 10L), (2L, "bob", 20L)).toDF("k", "name", "bal")
    val suppSrc = Seq((1L, "acme"), (9L, "other")).toDF("k", "name")
    val lookup = Seq(
      (100L, "customer", 1L), (100L, "supplier", 1L),
      (200L, "customer", 2L), (300L, "supplier", 9L))
      .toDF("cluster_id", "source", "rec_key")
    val sources = Seq(
      ("customer", custSrc, "k"), ("supplier", suppSrc, "k"))
    val v = Lookup.viewCluster(100L, sources, lookup)
    assert(v.columns.take(2).toSeq == Seq("customer_k", "supplier_k"))
    assert(v.count() == 2) // one row from each source
    assert(v.filter(col("customer_name") === "alice").count() == 1)
    assert(v.filter(col("supplier_name") === "acme").count() == 1)
    val m = Lookup.viewCluster(100L, sources, lookup, mergeFields = true)
    // merged fields share the unqualified name; keys stay qualified
    assert(m.columns.contains("name") && m.columns.contains("customer_k"))
    assert(m.filter(col("name").isin("alice", "acme")).count() == 2)
  }

  test("fused weighted linker matches the naive per-comparison formulation") {
    val customer = Tables(spark, sfDir, "customer")
    val supplier = Tables(spark, sfDir, "supplier")
    val comparisons = Seq(
      "l.c_custkey = r.s_suppkey" -> 1.0,
      "l.c_nationkey = r.s_nationkey" -> 0.5,
      "l.c_nationkey = r.s_nationkey AND abs(l.c_acctbal - r.s_acctbal) < 50" -> 0.5)
    val fused = Link.weighted(customer, supplier, "c_custkey", "s_suppkey",
      comparisons, threshold = 0.5)
    // naive: one join + DISTINCT per comparison, union, sum
    val totalMilli = comparisons.map(c => math.round(c._2 * 1000)).sum
    val naive = comparisons.map { case (cond, w) =>
      customer.alias("l").join(supplier.alias("r"), expr(cond))
        .select(col("l.c_custkey").cast("long").as("left_id"),
          col("r.s_suppkey").cast("long").as("right_id"))
        .distinct()
        .withColumn("w", lit(math.round(w * 1000)))
    }.reduce(_ union _)
      .groupBy("left_id", "right_id")
      .agg((sum(col("w")) / (1.0 * totalMilli)).as("score"))
      .filter(col("score") >= 0.5)
    assert(fused.count() > 0)
    assert(fused.except(naive).isEmpty && naive.except(fused).isEmpty)
    // the two nationkey-blocked comparisons must share a single join
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(fused.queryExecution.executedPlan.toString).size
    assert(joins <= 2, s"expected at most 2 joins after fusing, saw $joins")
  }

  test("asLeafSets groups sorted distinct leaves per cluster") {
    import graft.operators.Lookup
    val dump = Seq((1L, 5L), (1L, 3L), (1L, 5L), (2L, 9L)).toDF("cluster_id", "leaf_id")
    val sets = Lookup.asLeafSets(dump).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sets == Map(1L -> Seq(3L, 5L), 2L -> Seq(9L)))
  }

  test("clean passes leaf_id through and treats None as no-op (reference contract)") {
    import graft.operators.Combine
    val df = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "leaf_id", "value")
    val cleaned = Combine.clean(df, "id", Map("doubled" -> "value * 2"))
    assert(cleaned.columns.toSeq == Seq("id", "leaf_id", "doubled"))
    assert(cleaned.orderBy("id").collect().map(_.getInt(2)).toSeq == Seq(20, 40))
    // None = original unchanged; empty dict = id (+ leaf_id) only
    assert(Combine.clean(df, "id", None).columns.toSeq == df.columns.toSeq)
    assert(Combine.clean(df, "id", Map.empty[String, String]).columns.toSeq ==
      Seq("id", "leaf_id"))
    // a cleaning alias that redefines leaf_id wins — no duplicate column
    val aliased = Combine.clean(df, "id", Map("leaf_id" -> "upper(leaf_id)"))
    assert(aliased.columns.toSeq == Seq("id", "leaf_id"))
    assert(aliased.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("A", "B"))
  }

  test("reference empty-result edge cases return empty, not errors") {
    // mirrors test_dedupers_deterministic.py::test_no_deduplication,
    // test_linkers_deterministic.py::test_no_matching_entities_linking,
    // test_components.py::test_components_compute_clusters_returns_empty_for_no_edges
    val unique = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(Dedupe.naive(unique, "id", Seq("v")).isEmpty)
    val l = Seq((1L, "x")).toDF("id", "v")
    val r = Seq((2L, "y")).toDF("id", "v")
    assert(Link.deterministic(l, r, "id", "id", Seq("l.v = r.v")).isEmpty)
    import graft.operators.Resolver
    val weak = Seq((1L, 2L, 0.4)).toDF("left_id", "right_id", "score")
    assert(Resolver.computeClusters(Map("m" -> weak), Map("m" -> 0.9)).isEmpty)
  }

  test("comparison validation requires l./r. qualification on both sides") {
    Link.validateComparison("l.name = r.name AND abs(l.x - r.y) < 2")
    // lambda variables are bound at analysis, not qualification errors
    Link.validateComparison("exists(l.tags, t -> t = r.tag)")
    intercept[IllegalArgumentException] {
      Link.validateComparison("exists(l.tags, t -> u = r.tag)") // u unbound
    }
    intercept[IllegalArgumentException] {
      Link.validateComparison("l.name = name2") // unqualified column
    }
    intercept[IllegalArgumentException] {
      Link.validateComparison("l.a = l.b") // never references r
    }
    intercept[IllegalArgumentException] {
      Link.validateComparison("t.a = r.b") // unknown table alias
    }
    intercept[IllegalArgumentException] {
      Link.validateComparison("l.a == == r.b") // unparseable
    }
  }

  test("weighted linker splits conjuncts on the parsed AST, not text") {
    def equis(cond: String) = Link.splitConjuncts(cond).flatMap(Link.asEquiConjunct)
    // paren-guarded OR stays one conjunct; the equi key and residual split out
    assert(Link.splitConjuncts("l.a = r.a AND (l.b = r.b OR l.c = r.c) AND abs(l.x) < 2").size == 3)
    assert(equis("l.a = r.a AND (l.b = r.b OR l.c = r.c) AND abs(l.x) < 2") == Seq(("a", "a")))
    // SQL precedence: "a AND b OR c" is (a AND b) OR c — the top level is an
    // Or, so NO equi conjunct may be hoisted into a join key
    assert(equis("l.a = r.a AND l.b = r.b OR l.c = r.c").isEmpty)
    // ' AND ' inside a string literal is not a connective
    val lits = Link.splitConjuncts("l.a = r.a AND l.tag = 'fish AND chips'")
    assert(lits.size == 2 && equis("l.a = r.a AND l.tag = 'fish AND chips'") == Seq(("a", "a")))
    // reversed equality canonicalises to the same key
    assert(equis("r.a = l.a") == Seq(("a", "a")))
  }

  test("weighted linker keeps OR-branch matches (no unsound equi hoisting)") {
    val src = Seq((1L, "x", "k1"), (2L, "y", "k2")).toDF("id", "name", "key")
    val dst = Seq((10L, "x", "k1"), (20L, "zzz", "k2"), (30L, "y", "other"))
      .toDF("id", "name", "key")
    // (key match AND name match) OR name match: pair (2, 30) matches only via
    // the OR branch — a textual splitter that hoisted `l.key = r.key` into the
    // join would silently drop it.
    val scored = Link.weighted(
      src, dst, "id", "id",
      Seq(("l.key = r.key AND l.name = r.name OR l.name = r.name", 1.0)),
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scored == Set((1L, 10L), (2L, 30L)))
  }

  test("sampled u matches exact all-pairs u, and EM holds a fixed u") {
    val even = Tables(spark, sfDir, "customer").filter(col("c_custkey") % 2 === 0)
    val odd = Tables(spark, sfDir, "customer").filter(col("c_custkey") % 2 === 1)
    val comparisons = Seq(
      "l.c_mktsegment = r.c_mktsegment",
      "abs(l.c_acctbal - r.c_acctbal) < 100")
    // exact u: agreement rate over the full cross product
    val exact = even.alias("l").crossJoin(odd.alias("r"))
      .agg(
        avg(when(expr(comparisons(0)), 1.0).otherwise(0.0)),
        avg(when(expr(comparisons(1)), 1.0).otherwise(0.0)))
      .head()
    val exactU = Seq(exact.getDouble(0), exact.getDouble(1))
    // sample big enough to cover both sides completely → bit-identical
    val full = Link.estimateU(even, odd, "c_custkey", "c_custkey", comparisons,
      maxPairs = 4000000L)
    // same pair set, different plan → allow last-ulp double-sum divergence
    comparisons.indices.foreach { i =>
      assert(math.abs(full(i) - exactU(i)) < 1e-12,
        s"full-cover sample should be exact: $full vs $exactU")
    }
    // a 100x smaller sample stays within loose tolerance and is deterministic
    val sampled = Link.estimateU(even, odd, "c_custkey", "c_custkey", comparisons,
      maxPairs = 40000L)
    comparisons.indices.foreach { i =>
      assert(math.abs(sampled(i) - exactU(i)) < 0.1,
        s"sampled u($i)=${sampled(i)} far from exact ${exactU(i)}")
    }
    assert(sampled == Link.estimateU(even, odd, "c_custkey", "c_custkey", comparisons,
      maxPairs = 40000L))
    // trainU = false pins u at the sampled values through EM
    val (_, params) = Link.fellegiSunterEm(
      even, odd, "c_custkey", "c_custkey",
      blocking = "l.c_nationkey = r.c_nationkey",
      comparisons = comparisons,
      uInit = Some(sampled), trainU = false)
    assert(params.map(_._2) == sampled)
    assert(params.forall { case (m, u) => m > 0 && m < 1 && u > 0 && u < 1 })
  }

  test("EM linker learns m > u for discriminative comparisons") {
    val even = Tables(spark, sfDir, "customer").filter(col("c_custkey") % 2 === 0)
    val odd = Tables(spark, sfDir, "customer").filter(col("c_custkey") % 2 === 1)
    val (scored, params) = Link.fellegiSunterEm(
      even, odd, "c_custkey", "c_custkey",
      blocking = "l.c_nationkey = r.c_nationkey",
      comparisons = Seq(
        "l.c_mktsegment = r.c_mktsegment",
        "abs(l.c_acctbal - r.c_acctbal) < 100"))
    assert(scored.columns.toSeq == Seq("left_id", "right_id", "score"))
    val s = scored.agg(min("score"), max("score")).head()
    assert(s.getDouble(0) >= 0.5 && s.getDouble(1) <= 1.0)
    assert(params.nonEmpty)
  }

  test("resolver applies per-model thresholds before clustering") {
    import graft.operators.Resolver
    val strong = Seq((1L, 2L, 0.9), (3L, 4L, 0.9)).toDF("left_id", "right_id", "score")
    val weak = Seq((2L, 3L, 0.4)).toDF("left_id", "right_id", "score")
    // weak edge below its threshold: two separate clusters
    val split = Resolver.computeClusters(
      Map("strong" -> strong, "weak" -> weak), Map("weak" -> 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split(2L) == 1L && split(4L) == 3L && !split.contains(5L))
    // threshold relaxed: one merged cluster
    val merged = Resolver.computeClusters(
      Map("strong" -> strong, "weak" -> weak), Map("weak" -> 0.3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(2L, 3L, 4L).forall(merged(_) == 1L))
    intercept[IllegalArgumentException] {
      Resolver.computeClusters(Map("strong" -> strong), Map("nope" -> 0.5))
    }
  }

  test("score normalisation keeps max score per canonical pair") {
    val edges = Seq((1L, 2L, 0.4), (2L, 1L, 0.9), (3L, 4L, 0.5)).toDF("left_id", "right_id", "score")
    val out = Scores.normalise(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 0.9 && out((3L, 4L)) == 0.5 && out.size == 2)
  }

  test("score normalisation rejects out-of-range, NaN, and null scores") {
    // reference results.py normalise_model_scores raises on invalid scores
    def run(score: java.lang.Double) = Scores.normalise(
      Seq((1L, 2L)).toDF("left_id", "right_id")
        .withColumn("score", lit(score).cast("double"))).collect()
    run(0.0); run(1.0) // bounds are inclusive
    for (bad <- Seq[java.lang.Double](1.5, -0.1, Double.NaN, null)) {
      val e = intercept[Exception](run(bad))
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("must be in [0.0, 1.0]")),
        s"score $bad: unexpected error ${e.getMessage}")
    }
  }

  test("rounds linker never rematches a pool removed in round 1") {
    val df = Registry.byName("mb_link_rounds").fn(spark, sfDir)
    // round-1 matches are key-equality; any id matched there must not appear
    // with a different partner from round 2
    val perLeft = df.groupBy("left_id").count()
    assert(perLeft.filter(col("left_id") < 10 && col("count") > 1).isEmpty)
  }

  test("unlinkables chart is a monotone CDF ending at 1000 permille") {
    val rows = Registry.byName("mb_unlinkables").fn(spark, sfDir)
      .orderBy("threshold_tenths").collect()
    assert(rows.length == 17)
    val total = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) == total))
    // counts grow monotonically with the threshold (it's a CDF of best
    // weights) and the top grid point (6.0) exceeds the max possible
    // weight 5.6, so every record is unlinkable there
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a <= b })
    assert(counts.last == total && rows.last.getLong(3) == 1000L)
    assert(rows.forall(r => r.getLong(3) == 1000L * r.getLong(1) / total))
  }

  test("cluster graph metrics satisfy the graph identities per cluster") {
    val rows = Registry.byName("mb_cluster_graph_metrics").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, e, dmax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 2, s"cluster ${r.getLong(0)}: every component has an edge")
      assert(e >= n - 1 && e <= n * (n - 1) / 2, "connected, simple")
      assert(dmax >= 1 && dmax <= n - 1)
      val density = r.getLong(4)
      assert(density == 2000L * e / (n * (n - 1)) && density > 0 && density <= 1000)
      if (n > 2) {
        val c = r.getLong(5)
        // Σ(degmax − deg) = n·degmax − 2E, Freeman-normalised by (n−1)(n−2)
        assert(c == 1000L * (n * dmax - 2 * e) / ((n - 1) * (n - 2)))
        assert(c >= 0 && c <= 1000)
      } else assert(r.isNullAt(5))
    }
  }
}
