package graft
import org.apache.spark.sql.SparkSession

/** Between-query block-manager cleanup shared by [[Bench]] and [[Verify]]:
  * drop every retained cache/localCheckpoint block so ~130 queries' worth
  * of leftovers don't squeeze the block manager and evict LATER queries'
  * checkpoints mid-job (the r7 dx_embed_kmeans 4x "regression" was exactly
  * this cross-query interference).
  *
  * Unpersisting a locally-checkpointed RDD is intentional here — the query
  * is finished and its frame discarded — but Spark logs a WARN that the
  * RDD's truncated lineage can no longer be recomputed. Those WARNs pollute
  * the bench tail (the driver keeps only the last ~2000 stdout chars) and
  * mask real warnings, so the `org.apache.spark.rdd` logger is held at
  * ERROR for just this loop and restored after.
  */
object BlockCleanup {
  def dropRetainedBlocks(spark: SparkSession): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val logger = "org.apache.spark.rdd"
    val prev: Level = LogManager.getLogger(logger).getLevel
    Configurator.setLevel(logger, Level.ERROR)
    try spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    catch { case _: Throwable => () }
    finally Configurator.setLevel(logger, prev)
  }
}
