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

  test("mega-cluster trips the pair-expansion guard; bounded clusters pass") {
    // 40 judged leaves all merged into one cluster: with the cap at 10 the
    // evaluator must refuse the quadratic expansion instead of attempting it
    val ids = (1L to 40L)
    val mega = ids.map(i => (i, 1L)).toDF("id", "component")
    val judged = ids.sliding(2).map(p => (p.head, p.last, 1)).toSeq
      .toDF("left_id", "right_id", "verdict")
    spark.conf.set("spark.graft.eval.maxClusterSize", "10")
    try {
      val e = intercept[IllegalStateException] {
        PrecisionRecall(mega, judged).head()
      }
      assert(e.getMessage.contains("40 judged members"))
      assert(e.getMessage.contains("maxClusterSize"))
      // opt-in triangle-block expansion: same cap, but the mega-cluster's
      // pairs spread over block-pair reducers — results identical to naive
      spark.conf.set("spark.graft.eval.expandLargeClusters", "true")
      spark.conf.set("spark.graft.eval.expansionBlocks", "4")
      val blocked = PrecisionRecall(mega, judged).head()
      spark.conf.unset("spark.graft.eval.expandLargeClusters")
      spark.conf.unset("spark.graft.eval.maxClusterSize")
      val r = PrecisionRecall(mega, judged).head()
      assert(r.getAs[Long]("n_validation") == 39L)
      assert(blocked == r, s"blocked expansion diverged: $blocked vs $r")
    } finally {
      spark.conf.unset("spark.graft.eval.maxClusterSize")
      spark.conf.unset("spark.graft.eval.expandLargeClusters")
      spark.conf.unset("spark.graft.eval.expansionBlocks")
    }
  }

  test("blocked expansion handles string ids and rejects non-positive block counts") {
    // pre-fix, pmod(string_id, B) was null → the blocked path silently
    // emitted zero pairs for any non-numeric id; now ids are hashed first
    val ids = (1 to 25).map(i => s"doc-$i")
    val mega = ids.map(i => (i, "c1")).toDF("id", "component")
    val judged = ids.sliding(2).map(p => (p.head, p.last, 1)).toSeq
      .toDF("left_id", "right_id", "verdict")
    try {
      val plain = PrecisionRecall(mega, judged).head()
      spark.conf.set("spark.graft.eval.maxClusterSize", "10")
      spark.conf.set("spark.graft.eval.expandLargeClusters", "true")
      spark.conf.set("spark.graft.eval.expansionBlocks", "4")
      val blocked = PrecisionRecall(mega, judged).head()
      assert(blocked.getAs[Long]("n_validation") == 24L)
      assert(blocked == plain, s"string-id blocked expansion diverged: $blocked vs $plain")
      spark.conf.set("spark.graft.eval.expansionBlocks", "0")
      val e = intercept[IllegalArgumentException] {
        PrecisionRecall(mega, judged).head()
      }
      assert(e.getMessage.contains("expansionBlocks"))
    } finally {
      spark.conf.unset("spark.graft.eval.maxClusterSize")
      spark.conf.unset("spark.graft.eval.expandLargeClusters")
      spark.conf.unset("spark.graft.eval.expansionBlocks")
    }
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
