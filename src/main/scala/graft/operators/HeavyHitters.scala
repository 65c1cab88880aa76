package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed Misra–Gries heavy-hitters sketch.
  *
  * The exact path for "most frequent tokens" is a two-phase groupBy — fine
  * whenever the key cardinality fits a shuffle. At open-vocabulary corpus
  * scale (trillions of distinct n-grams) the exact groupBy shuffles the full
  * key set; the sketch path bounds per-partition state at `k` counters and
  * shuffles only the ≤ k survivors per partition.
  *
  * Guarantee (mergeable-summaries bound, Agarwal et al., PODS 2012): a
  * Misra–Gries summary with k counters undercounts any key by at most
  * (items processed)/k; summing per-partition summaries keeps the total
  * undercount ≤ n/k. Hence every key with true frequency > n/k survives in
  * at least one partition summary, and the merged estimate f̂ satisfies
  * f − n/k ≤ f̂ ≤ f. The candidate set is a superset of the true heavy
  * hitters — re-count the candidates exactly with a second broadcast-filtered
  * pass when exact counts are needed.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries over `keyCol` (string), merged by key:
    * returns (key, est_count) for the union of partition survivors.
    * `k` is the counter budget per partition (candidates have true
    * frequency > n/k guaranteed present).
    */
  def candidates(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"counter budget k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keys: Dataset[String] = df.select(col(keyCol).cast("string")).as[String]
    keys.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { key =>
        if (counters.contains(key)) counters(key) += 1L
        else if (counters.size < k - 1) counters(key) = 1L
        else {
          // decrement-all step: drop every counter by 1, evict zeros
          val dead = List.newBuilder[String]
          counters.keysIterator.foreach { c =>
            val nv = counters(c) - 1L
            if (nv == 0L) dead += c else counters(c) = nv
          }
          dead.result().foreach(counters.remove)
        }
      }
      counters.iterator.map { case (key, est) => (key, est) }
    }.toDF("key", "est_count")
      .groupBy("key")
      .agg(sum("est_count").as("est_count"))
  }
}
