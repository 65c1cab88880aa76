package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession defaults for graft workloads.
  *
  * On a real cluster, leave parallelism to dynamic allocation and AQE;
  * the settings here are the ones that matter at any scale:
  * - AQE on (runtime coalescing, skew-join splitting, join re-planning)
  * - shuffle partitions sized to the environment (32 for local[32]; on a
  *   1000-executor cluster start near 2-3x total cores and let AQE coalesce)
  * - ANSI arithmetic kept on: overflow surfaces as an error, not silent
  *   corruption (graft operators are written overflow-free)
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")

  /** Build the session and register graft's native SQL functions and the
    * per-key top-k planner strategy.
    */
  def create(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    functions.GraftExtensions.register(spark)
    plans.TopK.register(spark)
    spark
  }
}
