package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("bloomFlagged never misses a true member and bounds false positives") {
    val vocab = (0 until 500).map(i => s"gram$i").toDF("k")
    // postings: ids 0..9 each carry 3 true vocab grams; ids 100.. carry
    // only out-of-vocab grams
    val contaminated = for (id <- 0 until 10; j <- 0 until 3)
      yield (id.toLong, s"gram${id * 3 + j}")
    val clean = for (id <- 100 until 400; j <- 0 until 5)
      yield (id.toLong, s"novel_${id}_$j")
    val postings = (contaminated ++ clean).toDF("id", "k")
    val out = Decontaminate.bloomFlagged(postings, "id", "k", vocab, "k", fpp = 0.001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every contaminated id flagged with count >= truth
    (0 until 10).foreach(id => assert(out.getOrElse(id.toLong, 0L) >= 3L, s"id $id missed"))
    // false positives bounded: 1500 clean probes at fpp 0.001 -> expect ~1.5
    val fpPostings = out.filter(_._1 >= 100L).values.sum
    assert(fpPostings <= 20, s"excessive bloom false positives: $fpPostings")
  }

  test("bloomFlagged is deterministic across runs") {
    val vocab = (0 until 100).map(i => s"v$i").toDF("k")
    val postings = (0 until 1000).map(i => (i.toLong % 50, s"p$i")).toDF("id", "k")
    def run() = Decontaminate.bloomFlagged(postings, "id", "k", vocab, "k", 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run() == run())
  }
}
