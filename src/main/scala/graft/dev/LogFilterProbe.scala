package graft.dev

import org.apache.spark.sql.SparkSession

/** Empirical probe for BlockCleanup.muteBenignCleanupSpam: emits a
  * synthetic clone of the benign DAGScheduler accumulator-cleanup ERROR
  * (marker only in the attached throwable, like the real event) before
  * and after installing the filter, so the filter's effect is observable
  * in the captured log instead of guessed at. Dev-only.
  */
object LogFilterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = org.slf4j.LoggerFactory.getLogger(
      "org.apache.spark.scheduler.DAGScheduler")
    val boom = new org.apache.spark.SparkException(
      "attempted to access non-existent accumulator 99999")
    log.error("PROBE-BEFORE Failed to update accumulator 99999 (Unknown class) for task 0", boom)
    graft.BlockCleanup.muteBenignCleanupSpam()
    log.error("PROBE-AFTER Failed to update accumulator 99999 (Unknown class) for task 0", boom)
    log.error("PROBE-CONTROL a real error must still surface")
    spark.stop()
  }
}
