package graft.dev

import graft.Tables
import graft.operators.multimodal.Media
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures dHash hamming distance between DIB-coded AVI frames and their
  * lossy Motion-JPEG transcodes — the evidence for whether the vhash
  * family's hamming ≤ 3 / 600‰ thresholds catch REAL lossy re-encodes
  * (not just the structurally-exact planted variants).
  *
  * Usage: runMain graft.dev.MjpgProbe <sfDir>
  */
object MjpgProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, dir, "documents").orderBy("doc_id").limit(120)
    val base = Media.synthesizeAvi(docs, "doc_id", "text", 16, 16,
      nFrames = 5, fps = 10).localCheckpoint(false)
    val h0 = Media.frameDHash64(base).filter(col("decode_ok"))
      .select(col("media_id"), col("frame_idx"), col("dhash").as("h0"))
    val hj = Media.frameDHash64(Media.transcodeAvi(base, "MJPG"))
      .filter(col("decode_ok"))
      .select(col("media_id"), col("frame_idx"), col("dhash").as("hj"))
    val d = h0.join(hj, Seq("media_id", "frame_idx"))
      .withColumn("ham", expr("bit_count(h0 ^ hj)"))
    d.groupBy("ham").count().orderBy("ham").show(70, false)
    val stats = d.agg(count(lit(1)).as("n"),
      avg("ham").as("mean"),
      expr("percentile(ham, 0.5)").as("p50"),
      expr("percentile(ham, 0.9)").as("p90"),
      expr("percentile(ham, 0.99)").as("p99"),
      expr("CAST(max(ham) AS BIGINT)").as("max"),
      sum(when(col("ham") <= 3, 1L).otherwise(0L)).as("le3")).head()
    println(s"frames=${stats.getLong(0)} mean=${stats.getDouble(1)} " +
      s"p50=${stats.getDouble(2)} p90=${stats.getDouble(3)} " +
      s"p99=${stats.getDouble(4)} max=${stats.getLong(5)} le3=${stats.getLong(6)}")
    // video-level: fraction of clips whose matched positions (ham<=3)
    // reach the 600-permille floor against their own MJPG transcode
    val perClip = d.groupBy("media_id")
      .agg(sum(when(col("ham") <= 3, 1L).otherwise(0L)).as("m"),
        count(lit(1)).as("nf"))
      .withColumn("permille", (lit(1000L) * col("m")) / col("nf"))
    val caught = perClip.filter(col("permille") >= 600).count()
    val total = perClip.count()
    println(s"clips caught at >=600 permille: $caught / $total")
    spark.stop()
  }
}
