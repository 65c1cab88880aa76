package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: at a scaled replica, what does the brute-force top-5 truth
  * look like — same-copy genuine neighbors or cross-copy noise maxima? */
object TruthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10m"
    val base = args.lift(1).map(_.toLong).getOrElse(2000L) // rows per copy
    val emb = graft.Tables(spark, dir, "embeddings")
    val brute = graft.operators.ann.Knn.bruteForce(
      emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
    brute
      .withColumn("same_copy", (col("neighbor_id") / base).cast("long") === 0)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id", "rank", "sim", "same_copy")
      .show(50, false)
    spark.stop()
  }
}
