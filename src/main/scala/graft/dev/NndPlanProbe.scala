package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: print the post-AQE executed plan of one NN-Descent build
  * (iters=1) so the per-round exchange/join shapes are facts, not guesses.
  */
object NndPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val g = graft.operators.ann.NnDescent.knnGraph(
      emb, "vec_id", "embedding", k = 10, iters = 1, cap0 = 40)
    g.queryExecution.toRdd.count()
    println("===== executed plan (iters=1 build) =====")
    println(g.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
