package graft

import graft.operators.dedup.{EmbedDedup, SemDedup}
import org.apache.spark.sql.functions._
import scala.util.Random

/** SemDeDup contracts: within-cluster pairs are a strict subset of exact
  * all-pairs with identical similarity values, and exact duplicates are
  * never lost to cell boundaries.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int, dim: Int = 16) = {
    val rng = new Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("pairs are a subset of exact all-pairs with identical sims") {
    val df = corpus(1, 150)
    val sem = SemDedup.pairs(df, "vec_id", "embedding",
      threshold = 0.3, k = 4, iters = 3)
      .select("left_id", "right_id", "sim")
    val exact = EmbedDedup.allPairs(df, "vec_id", "embedding", threshold = 0.3)
      .select("left_id", "right_id", "sim")
    assert(sem.exceptAll(exact).isEmpty,
      "every semantic pair must appear in the exact join with the same sim")
  }

  test("identical planted vectors are always recovered across any clustering") {
    val base = corpus(2, 120)
    val planted = base.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val df = base.unionByName(planted)
    val got = SemDedup.pairs(df, "vec_id", "embedding",
      threshold = 0.99, k = 5, iters = 3)
      .select("left_id", "right_id")
    val want = base.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("left_id"), (col("vec_id") + 10000).as("right_id"))
    assert(want.exceptAll(got).isEmpty, "planted exact duplicates were lost")
  }

  test("every emitted pair shares the cell it was found in") {
    val df = corpus(3, 100)
    val pairs = SemDedup.pairs(df, "vec_id", "embedding",
      threshold = 0.2, k = 3, iters = 2)
    // the cell column exists and left/right were joined within it by
    // construction; spot-check the schema contract
    assert(pairs.columns.toSeq == Seq("left_id", "right_id", "sim", "cell"))
    assert(pairs.filter(col("left_id") >= col("right_id")).isEmpty,
      "pairs must be canonically ordered")
  }
}
