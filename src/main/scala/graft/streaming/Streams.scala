package graft.streaming

import graft.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch operators — matchbox's
  * "batch and real-time matching" surface (reference README; the server's
  * incremental upload/match path). The same declarative plans run on
  * `readStream` inputs; Spark handles incremental state.
  */
object Streams {

  /** Tumbling-window event rates with a watermark for late data. The
    * watermark bounds aggregation state at scale — without it a 100 TB/day
    * stream would accumulate windows forever.
    */
  def eventRates(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(Num.cents(col("value"))) / 100.0).as("sum_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Incremental matching: a stream of new records equi-joined against a
    * static, already-indexed reference (stream-static join — stateless on
    * the stream side, so it scales to unbounded input; the reference side
    * is re-broadcast / re-read per micro-batch).
    *
    * Multiple comparison conditions are unioned; duplicate pairs across
    * conditions are dropped with `dropDuplicates` (bound its state with a
    * watermark on the stream side in production).
    */
  def incrementalMatch(
      stream: DataFrame, reference: DataFrame,
      streamId: String, refId: String,
      comparisons: Seq[String]): DataFrame =
    comparisons
      .map { c =>
        stream.alias("l")
          .join(reference.alias("r"), expr(c))
          .select(
            col(s"l.$streamId").cast("long").as("left_id"),
            col(s"r.$refId").cast("long").as("right_id"))
      }
      .reduce(_ union _)
      .dropDuplicates("left_id", "right_id")
      .withColumn("score", lit(1.0))
}
