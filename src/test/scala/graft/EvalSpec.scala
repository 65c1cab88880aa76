package graft

import graft.eval.PrecisionRecall
import org.apache.spark.sql.functions._

/** Replicates the reference's eval example end-to-end
  * (test/common/test_eval.py::test_precision_recall).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def expansion = Seq(
    (123L, Seq(1L, 2L, 3L)),
    (67L, Seq(6L, 7L)),
    (45L, Seq(4L, 5L)),
    (12L, Seq(1L, 2L))).toDF("root", "leaves")

  private def judgements = Seq(
    // ambiguous but more positive than negative on (1,2)
    (123L, 12L), (123L, 3L), (123L, 12L), (123L, 3L), (123L, 1L), (123L, 2L), (123L, 3L),
    // ambiguous but more negative than positive on (4,5)
    (45L, 45L), (45L, 4L), (45L, 4L), (45L, 5L), (45L, 5L),
    // these neutralise each other on (6,7)
    (67L, 67L), (67L, 6L), (67L, 7L)).toDF("shown", "endorsed")

  private def model(rootLeaf: Seq[(Long, Long)]) =
    rootLeaf.toDF("component", "id").select("id", "component")

  test("matches the reference precision_recall example: model 1") {
    val model1 = model(Seq(
      (123L, 1L), (123L, 2L), (123L, 3L),
      (45L, 4L), (45L, 5L), (67L, 6L), (67L, 7L), (89L, 8L), (89L, 9L)))
    val r = PrecisionRecall.fromJudgements(model1, judgements, expansion).head()
    assert(r.getAs[Long]("tp") == 1)
    assert(r.getAs[Long]("n_model") == 4) // (1,2),(1,3),(2,3),(4,5); (6,7) neutralised
    assert(r.getAs[Long]("n_validation") == 1) // only (1,2)
    assert(r.getAs[Double]("precision") == 0.25)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  test("matches the reference precision_recall example: model 2") {
    val model2 = model(Seq(
      (13L, 1L), (13L, 3L), (2L, 2L), (4L, 4L), (5L, 5L), (67L, 6L), (67L, 7L)))
    val r = PrecisionRecall.fromJudgements(model2, judgements, expansion).head()
    assert(r.getAs[Long]("tp") == 0)
    assert(r.getAs[Long]("n_model") == 1) // only (1,3)
    assert(r.getAs[Double]("precision") == 0.0)
    assert(r.getAs[Double]("recall") == 0.0)
  }

  test("multi-model PR restricts to the shared-leaf intersection (reference example)") {
    // model1 leaves {1..9}, model2 leaves {1..7}, judgement leaves {1..7}
    // → shared {1..7}: model1's (8,9) pair is out of universe for scoring.
    val model1 = model(Seq(
      (123L, 1L), (123L, 2L), (123L, 3L),
      (45L, 4L), (45L, 5L), (67L, 6L), (67L, 7L), (89L, 8L), (89L, 9L)))
    val model2 = model(Seq(
      (13L, 1L), (13L, 3L), (2L, 2L), (4L, 4L), (5L, 5L), (67L, 6L), (67L, 7L)))
    val rows = PrecisionRecall.multiFromJudgements(Seq(model1, model2), judgements, expansion)
      .collect()
    assert(rows.length == 2)
    val r1 = rows(0); val r2 = rows(1)
    // reference asserts pr_scores[0] == (1/4, 1) and pr_scores[1] == (0, 0)
    assert(r1.getAs[Long]("model") == 0 && r1.getAs[Double]("precision") == 0.25
      && r1.getAs[Double]("recall") == 1.0)
    assert(r2.getAs[Long]("model") == 1 && r2.getAs[Double]("precision") == 0.0
      && r2.getAs[Double]("recall") == 0.0)
  }

  test("mega-cluster evaluates pair-free: cost tracks judged pairs, not cluster size") {
    // 40 judged leaves all merged into one cluster: before r13 this tripped
    // a quadratic-expansion guard (spark.graft.eval.maxClusterSize); the
    // pair-free formulation never expands cluster pairs at all — the
    // evaluator reads exactly the 39 judged chain pairs and completes with
    // no conf knobs. Counts: all 39 pairs co-clustered and net-positive.
    val ids = (1L to 40L)
    val mega = ids.map(i => (i, 1L)).toDF("id", "component")
    val judged = ids.sliding(2).map(p => (p.head, p.last, 1)).toSeq
      .toDF("left_id", "right_id", "verdict")
    val r = PrecisionRecall(mega, judged).head()
    assert(r.getAs[Long]("tp") == 39L)
    assert(r.getAs[Long]("n_model") == 39L)
    assert(r.getAs[Long]("n_validation") == 39L)
    assert(r.getAs[Double]("precision") == 1.0 && r.getAs[Double]("recall") == 1.0)
    // a model that withholds half the leaves: pairs with an unassigned
    // endpoint leave the universe for BOTH sides (validation too)
    val half = ids.filter(_ % 2 == 1).map(i => (i, 1L)).toDF("id", "component")
    val rh = PrecisionRecall(half, judged).head()
    assert(rh.getAs[Long]("n_validation") == 0L) // chain pairs straddle parities
    assert(rh.getAs[Long]("n_model") == 0L)
  }

  test("pair-free evaluation handles string ids and rejected pairs") {
    // ids need not be numeric anywhere in the evaluator (the pre-r13
    // blocked expansion once pmod'ed raw ids); rejected pairs count
    // toward nothing, endorsed cross-cluster pairs hit recall only
    val ids = (1 to 25).map(i => s"doc-$i")
    val mega = ids.map(i => (i, "c1")).toDF("id", "component")
    val judged = ids.sliding(2).map(p => (p.head, p.last, 1)).toSeq
      .toDF("left_id", "right_id", "verdict")
    val plain = PrecisionRecall(mega, judged).head()
    assert(plain.getAs[Long]("n_validation") == 24L)
    assert(plain.getAs[Long]("tp") == 24L)
    // split model: doc-1..doc-9 and doc-10.. live apart (string order!),
    // so some judged pairs cross components → tp < n_validation
    val split = ids.map(i => (i, if (i.length == 5) "s" else "l")).toDF("id", "component")
    val rs = PrecisionRecall(split, judged).head()
    assert(rs.getAs[Long]("n_validation") == 24L)
    assert(rs.getAs[Long]("tp") < 24L && rs.getAs[Long]("tp") > 0L)
    assert(rs.getAs[Long]("n_model") == rs.getAs[Long]("tp")) // all judged pairs positive
  }

  test("disagreement-stratified sampling ranks planted disagreement first within bands") {
    import graft.eval.Samples
    // resolution: A={1..6}, D={10..15} (both band 2), B={7,8} (band 1),
    // C={9} (band 0). alternative splits A as {1,2,3},{4,5},{6} -> 11 of
    // A's 15 pairs split (dis_ppm = 733333); keeps D and B intact (0).
    val resolution = (
      (1L to 6L).map(_ -> 100L) ++ (10L to 15L).map(_ -> 400L) ++
        Seq(7L -> 200L, 8L -> 200L, 9L -> 300L)).toDF("id", "component")
    val alternative = (
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 3L,
        7L -> 5L, 8L -> 5L, 9L -> 6L) ++ (10L to 15L).map(_ -> 7L))
      .toDF("id", "alt")
    val one = Samples.disagreementStratified(resolution, alternative, perBand = 1)
      .collect().map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("split_pairs"),
          r.getAs[Long]("dis_ppm")))).toMap
    assert(one(2L) == ((100L, 11L, 733333L)), s"band 2 pick: ${one(2L)}")
    assert(one(1L) == ((200L, 0L, 0L)))
    assert(one(0L) == ((300L, 0L, 0L)))
    // perBand=2 admits the agreeing band-2 cluster D behind A
    val two = Samples.disagreementStratified(resolution, alternative, perBand = 2)
      .filter(col("band") === 2L).orderBy(col("dis_ppm").desc)
      .collect().map(_.getAs[Long]("cluster_id")).toSeq
    assert(two == Seq(100L, 400L), s"band 2 order: $two")
  }

  test("judgement validation flags duplicates and shown/endorsed inconsistency") {
    import graft.eval.Judgements
    val exp = Seq(
      (12345L, Seq(1L, 2L, 3L, 4L, 5L)), (123L, Seq(1L, 2L, 3L)),
      (345L, Seq(3L, 4L, 5L)), (45L, Seq(4L, 5L)), (12L, Seq(1L, 2L)),
      (34L, Seq(3L, 4L)), (1231L, Seq(1L, 2L, 3L, 1L))).toDF("root", "leaves")
    // j1: leaf 3 repeated across endorsed groups; j2: repeated within group;
    // j3: missing leaf 3; j4: extra leaf 4; j5: well-formed
    val js = Seq(
      (1L, 12345L, 123L), (1L, 12345L, 345L),
      (2L, 123L, 1231L),
      (3L, 123L, 12L),
      (4L, 123L, 12L), (4L, 123L, 34L),
      (5L, 12345L, 123L), (5L, 12345L, 45L)).toDF("jid", "shown", "endorsed")
    val bad = Judgements.invalid(js, exp, "jid").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bad.keySet == Set(1L, 2L, 3L, 4L))
    assert(bad(1L).contains("repeated") && bad(2L).contains("repeated"))
    assert(bad(3L).contains("inconsistent") && bad(4L).contains("inconsistent"))
    intercept[IllegalArgumentException] {
      Judgements.validate(js, exp, "jid")
    }
    // the well-formed judgement alone validates
    Judgements.validate(js.filter(col("jid") === 5L), exp, "jid")
  }

  test("judgement netting produces the implied verdicts") {
    val net = graft.eval.Judgements.net(judgements, expansion).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(net((1L, 2L)) > 0, s"(1,2) should be net-positive: $net")
    assert(net((4L, 5L)) < 0, s"(4,5) should be net-negative: $net")
    assert(math.abs(net((6L, 7L))) < 1e-9, s"(6,7) should neutralise: $net")
    assert(net((1L, 3L)) < 0 && net((2L, 3L)) < 0)
  }

  test("judgement netting refuses an oversized cluster expansion") {
    spark.conf.set("spark.graft.eval.maxClusterSize", "10")
    try {
      val bigExpansion = Seq((100L, (1L to 20L).toSeq)).toDF("root", "leaves")
      val oneJudgement = Seq((100L, 100L)).toDF("shown", "endorsed")
      val e = intercept[IllegalStateException](
        graft.eval.Judgements.net(oneJudgement, bigExpansion).collect())
      assert(e.getMessage.contains("maxClusterSize"))
      // and the bounded path still works under the tightened cap
      assert(graft.eval.Judgements.net(judgements, expansion).count() > 0)
    } finally spark.conf.set("spark.graft.eval.maxClusterSize", "100000")
  }

  test("b-cubed: perfect clustering scores 1/1; merges cut precision, splits cut recall") {
    import graft.eval.BCubed
    // truth: classes {1,2}, {3,4,5}, {6}
    val truth = Seq(1L -> 10L, 2L -> 10L, 3L -> 30L, 4L -> 30L, 5L -> 30L,
      6L -> 60L).toDF("id", "entity_id")
    def assign(pairs: (Long, Long)*) = pairs.toSeq.toDF("id", "component")
    val perfect = assign(1L -> 1, 2L -> 1, 3L -> 3, 4L -> 3, 5L -> 3, 6L -> 6)
    assert(BCubed.precisionRecall(BCubed.stats(perfect, truth)) == ((1.0, 1.0)))
    // everything merged into one cluster: recall 1, precision < 1
    val merged = assign(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 1)
    val (pM, rM) = BCubed.precisionRecall(BCubed.stats(merged, truth))
    assert(rM == 1.0 && pM < 1.0)
    // per-record precision of the all-merged clustering:
    // (2·(2/6) + 3·(3/6) + 1·(1/6)) / 6 = 14/36
    assert(math.abs(pM - 14.0 / 36.0) < 1e-12)
    // all singletons: precision 1, recall < 1
    val split = assign(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5, 6L -> 6)
    val (pS, rS) = BCubed.precisionRecall(BCubed.stats(split, truth))
    assert(pS == 1.0 && rS < 1.0)
    assert(math.abs(rS - (2.0 / 2 / 2 + 2.0 / 2 / 2 + 3.0 / 3 / 3 + 3.0 / 3 / 3 +
      3.0 / 3 / 3 + 1.0) / 6) < 1e-12)
    // registered-query shape: coarse clustering over fine truth => recall 1
    val coarse = assign(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 9)
    val fineTruth = Seq(1L -> 10L, 2L -> 10L, 3L -> 30L, 4L -> 30L, 5L -> 30L,
      6L -> 61L).toDF("id", "entity_id")
    val (_, rC) = BCubed.precisionRecall(BCubed.stats(coarse, fineTruth))
    assert(rC == 1.0)
  }

  test("adjusted rand index: identical partitions 1, independent ~0, integer sums exact") {
    import graft.eval.RandIndex
    val truth = Seq(1L -> 10L, 2L -> 10L, 3L -> 30L, 4L -> 30L, 5L -> 30L,
      6L -> 60L).toDF("id", "entity_id")
    def assign(pairs: (Long, Long)*) = pairs.toSeq.toDF("id", "component")
    val perfect = assign(1L -> 1, 2L -> 1, 3L -> 3, 4L -> 3, 5L -> 3, 6L -> 6)
    assert(RandIndex.adjusted(RandIndex.stats(perfect, truth)) == 1.0)
    // all-merged: index = within-class pairs = 1 + 3 = 4; sumC = C2(6)=15,
    // sumT = 4, total = 15 -> ARI = (4 - 4)/(9.5 - 4) = 0
    val merged = assign(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 1)
    val mStats = RandIndex.stats(merged, truth).head()
    assert((mStats.getLong(0), mStats.getLong(1), mStats.getLong(2),
      mStats.getLong(3)) == ((4L, 15L, 4L, 15L)))
    assert(RandIndex.adjusted(RandIndex.stats(merged, truth)) == 0.0)
    // all singletons vs all singletons: degenerate (max == expected),
    // partitions identical -> 1 by convention
    val single = assign(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5, 6L -> 6)
    val singleTruth = Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L,
      6L -> 6L).toDF("id", "entity_id")
    assert(RandIndex.adjusted(RandIndex.stats(single, singleTruth)) == 1.0)
    // a wrong merge scores strictly below a perfect one
    val wrong = assign(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 3, 5L -> 3, 6L -> 6)
    val ari = RandIndex.adjusted(RandIndex.stats(wrong, truth))
    assert(ari > 0.0 && ari < 1.0)
  }
}
