package graft

import graft.plans.{NnMerge, TopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** The NN-Descent merge combiner ([[graft.plans.NnMerge]]) must be
  * result-invariant: dedup(id,nbr)+top-k applied map-side BEFORE the merge
  * exchange may only ever drop rows the global merge aggregate + TopK would
  * truncate anyway. The adversarial inputs here stress exactly the risky
  * cases — duplicate (id,nbr) pairs split across partitions with DIFFERENT
  * fresh flags, per-id row counts straddling k, and a flush bound small
  * enough to force multiple emit epochs per partition.
  */
class NnMergeSpec extends SparkSpec {
  import spark.implicits._

  private def mergeReference(df: DataFrame, k: Int): DataFrame =
    TopK.perKey(
      df.groupBy("id", "nbr")
        .agg(max("sim").as("sim"), min("fresh").as("fresh")),
      Seq("id"), "sim", k, tieCols = Seq("nbr")).drop("rank")

  private def viaCombine(df: DataFrame, k: Int): DataFrame =
    TopK.perKey(
      NnMerge.combine(df, k)
        .repartition(col("id"))
        .groupBy("id", "nbr")
        .agg(max("sim").as("sim"), min("fresh").as("fresh")),
      Seq("id"), "sim", k, tieCols = Seq("nbr")).drop("rank")

  private def randomEdges(seed: Int, nIds: Int, nRows: Int) = {
    val rng = new Random(seed)
    // duplicates across the frame are the point: the same (id,nbr) appears
    // with fresh=true AND fresh=false; sims for a given (id,nbr) are equal
    // (the kernel-determinism invariant the combiner relies on)
    val sims = Map.empty[(Long, Long), Double]
    var simFor = Map.empty[(Long, Long), Double]
    Seq.fill(nRows) {
      val id = rng.nextInt(nIds).toLong
      val nbr = rng.nextInt(nIds).toLong
      val key = (id, nbr)
      val sim = simFor.getOrElse(key, {
        val s = rng.nextInt(1000) / 1000.0
        simFor += key -> s
        s
      })
      (id, nbr, sim, rng.nextBoolean())
    }.toDF("id", "nbr", "sim", "fresh")
  }

  test("combine + merge == plain merge, including fresh flags and ties") {
    for ((seed, k, parts) <- Seq((1, 2, 3), (2, 5, 8), (3, 20, 2))) {
      val df = randomEdges(seed, nIds = 12, nRows = 600).repartition(parts)
        .localCheckpoint(true)
      val ref = mergeReference(df, k)
      val got = viaCombine(df, k)
      assert(got.count() == ref.count(), s"seed=$seed k=$k")
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"seed=$seed k=$k")
    }
  }

  test("flush epochs (tiny flushRows) keep the result identical") {
    val prev = spark.conf.getOption("spark.graft.topk.flushRows")
    spark.conf.set("spark.graft.topk.flushRows", "7")
    try {
      val df = randomEdges(11, nIds = 9, nRows = 500).repartition(4)
        .localCheckpoint(true)
      val ref = mergeReference(df, 3)
      val got = viaCombine(df, 3)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topk.flushRows", v)
        case None => spark.conf.unset("spark.graft.topk.flushRows")
      }
    }
  }

  test("combiner bounds per-partition output to ids·k deduplicated rows") {
    // one partition, 4 ids × 200 rows each (with duplicates) → combine
    // output must be ≤ 4·k rows and contain no (id,nbr) duplicates
    val df = randomEdges(21, nIds = 4, nRows = 800).coalesce(1)
      .localCheckpoint(true)
    val k = 5
    val combined = NnMerge.combine(df, k)
    val out = combined.collect()
    assert(out.length <= 4 * k, s"expected <= ${4 * k} rows, got ${out.length}")
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "duplicate (id,nbr) in combine output")
  }
}
