package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import scala.util.Random

/** Misra–Gries sketch: candidate set must cover every key with frequency
  * > n/k, and merged estimates must satisfy f − n/k ≤ f̂ ≤ f — the
  * mergeable-summaries bound the operator's 100 TB story rests on.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def zipfish(seed: Int, n: Int, vocab: Int) = {
    val rng = new Random(seed)
    // quadratic skew: low ids vastly more frequent
    Seq.fill(n)(s"w${(rng.nextDouble() * rng.nextDouble() * vocab).toInt}")
      .toDF("token")
  }

  test("covers all true heavy hitters and never overcounts, across k and partitioning") {
    for ((seed, k, parts) <- Seq((1, 4, 1), (2, 8, 4), (3, 16, 7))) {
      val df = zipfish(seed, n = 5000, vocab = 200).repartition(parts)
      val n = df.count()
      val exact = df.groupBy("token").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sketch = HeavyHitters.candidates(df, "token", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val heavy = exact.filter { case (_, c) => c * k > n }
      val missing = heavy.keySet -- sketch.keySet
      assert(missing.isEmpty, s"seed=$seed k=$k lost heavy hitters: $missing")
      sketch.foreach { case (t, est) =>
        val truth = exact(t)
        assert(est <= truth, s"$t overcounted: est=$est true=$truth")
        assert(est >= truth - n / k, s"$t undercounted past the n/k bound")
      }
    }
  }

  test("rejects a counter budget below 2") {
    intercept[IllegalArgumentException] {
      HeavyHitters.candidates(Seq("a").toDF("token"), "token", 1)
    }
  }
}
