package graft

import graft.operators.{Components, Scores}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized properties for the core invariants. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def referenceComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("components matches a reference union-find on random graphs, both paths") {
    val rng = new Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rng.nextInt(60)
      val m = 1 + rng.nextInt(3 * n)
      val edges = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val expected = referenceComponents(edges)
        for (threshold <- Seq(0L, Long.MaxValue)) {
          val got = Components.connected(edges.toDF("src", "dst"), smallGraphThreshold = threshold)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == expected, s"trial $trial threshold $threshold: $got != $expected")
        }
      }
    }
  }

  test("triangle block join equals the naive cartesian on random vectors for any B") {
    val rng = new Random(11)
    for (trial <- 1 to 3) {
      val n = 20 + rng.nextInt(40)
      val dim = 4
      val vecs = (0 until n).map { i =>
        // sparse-ish ids (not 0..n-1) to exercise pmod blocking
        (i.toLong * 3 + rng.nextInt(2), Array.fill(dim)(rng.nextFloat() * 2 - 1))
      }
      val df = vecs.toDF("vec_id", "embedding")
      val naive = df.select(col("vec_id").as("left_id"), col("embedding").as("ea"))
        .join(df.select(col("vec_id").as("right_id"), col("embedding").as("eb")),
          col("left_id") < col("right_id"))
        .withColumn("sim", graft.functions.CosineSimilarity(col("ea"), col("eb")))
        .filter(col("sim") >= 0.2)
        .select("left_id", "right_id", "sim")
      for (b <- Seq(1, 3, 8)) {
        val tri = graft.operators.dedup.EmbedDedup
          .allPairs(df, "vec_id", "embedding", threshold = 0.2, numBlocks = b)
        assert(tri.except(naive).isEmpty && naive.except(tri).isEmpty,
          s"trial $trial B=$b")
      }
    }
  }

  test("n-ary explode equals chained binary explode on random sources") {
    import graft.operators.Combine
    val rng = new Random(7)
    for (trial <- 1 to 3) {
      def src(c: String) = Seq.fill(10 + rng.nextInt(20))(
        (rng.nextInt(12).toLong, rng.nextInt(5))).toDF("id", c)
      val (a, b, c) = (src("x"), src("y"), src("z"))
      val nary = Combine.explode(Seq(a, b, c), "id")
      val chained = Combine.explode(Combine.explode(a, b, "id"), c, "id")
      assert(nary.except(chained).isEmpty && chained.except(nary).isEmpty,
        s"trial $trial: n-ary and chained explode disagree")
      // every source id survives some row (full-outer semantics)
      val ids = nary.select("id").distinct().collect().map(_.getLong(0)).toSet
      val expected = (a.select("id") union b.select("id") union c.select("id"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(ids == expected)
    }
  }

  test("sampled u is clamped, deterministic, and exact under full coverage") {
    import graft.operators.Link
    val rng = new Random(13)
    val left = Seq.fill(40)((rng.nextInt(1000).toLong, rng.nextInt(4)))
      .distinctBy(_._1).toDF("id", "g")
    val right = Seq.fill(40)((rng.nextInt(1000).toLong + 10000, rng.nextInt(4)))
      .distinctBy(_._1).toDF("id", "g")
    val cond = Seq("l.g = r.g")
    val u = Link.estimateU(left, right, "id", "id", cond, maxPairs = 1000000L)
    assert(u.head > 0 && u.head < 1)
    assert(u == Link.estimateU(left, right, "id", "id", cond, maxPairs = 1000000L))
    // full coverage: the sample is the whole cross product, so u is the
    // exact agreement rate
    val exact = left.alias("l").crossJoin(right.alias("r"))
      .agg(avg(when(expr("l.g = r.g"), 1.0).otherwise(0.0))).head().getDouble(0)
    assert(math.abs(u.head - exact) < 1e-12, s"${u.head} vs $exact")
  }

  test("normalise is idempotent and orientation-invariant on random edge lists") {
    val rng = new Random(7)
    val edges = Seq.fill(300)((rng.nextInt(40).toLong, rng.nextInt(40).toLong,
      math.rint(rng.nextDouble() * 100) / 100))
      .filter { case (a, b, _) => a != b }
    val df = edges.toDF("left_id", "right_id", "score")
    val once = Scores.normalise(df)
    val twice = Scores.normalise(once)
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
    assert(once.filter(col("left_id") >= col("right_id")).isEmpty)
    // swapping every pair's orientation must not change the result
    val swapped = Scores.normalise(df.select(
      col("right_id").as("left_id"), col("left_id").as("right_id"), col("score")))
    assert(once.except(swapped).isEmpty && swapped.except(once).isEmpty)
    // max semantics: every output score is the max over that canonical pair
    val truth = df.select(
      least(col("left_id"), col("right_id")).as("left_id"),
      greatest(col("left_id"), col("right_id")).as("right_id"), col("score"))
      .groupBy("left_id", "right_id").agg(max("score").as("score"))
    assert(once.except(truth).isEmpty && truth.except(once).isEmpty)
  }
}
