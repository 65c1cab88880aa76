package graft

import graft.operators.GraphMetrics
import org.apache.spark.sql.functions._
import scala.util.Random

/** Degree-oriented triangle counting must agree exactly with the naive
  * canonical triple-join on arbitrary graphs, count each triangle once
  * regardless of degree ties, and survive messy (duplicated / reversed /
  * self-loop) pair input through canonicalisation.
  */
class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def randomEdges(seed: Int, n: Int, m: Int) = {
    val rng = new Random(seed)
    Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .toDF("left_id", "right_id")
  }

  test("oriented triangle count equals the naive triple join on random graphs") {
    for ((seed, n, m) <- Seq((11, 20, 60), (12, 50, 300), (13, 8, 80))) {
      val e = GraphMetrics.canonicalEdges(randomEdges(seed, n, m), "left_id", "right_id")
      val fast = GraphMetrics.triangleStats(e).collect()(0)
      val naive = GraphMetrics.triangleStatsNaive(e).collect()(0)
      assert(fast == naive, s"seed=$seed: oriented=$fast naive=$naive")
    }
  }

  test("a k-clique has C(k,3) triangles and C(k,2) edges; ties in degree are fine") {
    val k = 7
    val pairs = (for (i <- 0 until k; j <- 0 until k if i != j)
      yield (i.toLong, j.toLong)).toDF("left_id", "right_id")
    val e = GraphMetrics.canonicalEdges(pairs, "left_id", "right_id")
    val row = GraphMetrics.triangleStats(e).collect()(0)
    assert(row.getLong(0) == k)                      // nodes
    assert(row.getLong(1) == k * (k - 1) / 2)        // edges
    assert(row.getLong(2) == k * (k - 1) * (k - 2) / 6) // triangles
    assert(row.getLong(3) == k.toLong * ((k - 1) * (k - 2) / 2)) // wedges
  }

  test("canonicalisation drops self-loops and merges duplicate orientations") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (2L, 3L), (3L, 1L))
      .toDF("left_id", "right_id")
    val e = GraphMetrics.canonicalEdges(pairs, "left_id", "right_id")
    assert(e.count() == 3)
    val row = GraphMetrics.triangleStats(e).collect()(0)
    assert(row.getLong(2) == 1, s"expected the single 1-2-3 triangle: $row")
    val hist = GraphMetrics.degreeHistogram(e).as[(Long, Long)].collect().toSeq
    assert(hist == Seq((2L, 3L)), s"all three nodes have degree 2: $hist")
  }

  test("a path graph has zero triangles but n-2 wedges") {
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("left_id", "right_id")
    val e = GraphMetrics.canonicalEdges(pairs, "left_id", "right_id")
    val row = GraphMetrics.triangleStats(e).collect()(0)
    assert(row.getLong(0) == 10 && row.getLong(1) == 9)
    assert(row.getLong(2) == 0 && row.getLong(3) == 8)
  }
}
