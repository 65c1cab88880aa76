package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the EXECUTED (post-AQE) plan of one descent-round block
  * assembly — capped neighborhood ⋈ vectors → collect_list — to check
  * whether the vector-attach join runs as a runtime broadcast (AQE
  * converting the SMJ once it sees the materialized vecs size) or as a
  * sort-merge join, and where the vector payload actually crosses the
  * wire.
  */
object NndRoundPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val vecs = emb
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
      .localCheckpoint(false)
    vecs.count()
    // a realistic capped frame: 2 pseudo-random neighbors per node
    val capped = vecs.select(col("id"))
      .withColumn("salt", explode(array(lit(1), lit(2))))
      .withColumn("nbr", pmod(xxhash64(col("id"), col("salt")), lit(2000L)))
      .withColumn("fresh", lit(true))
      .select("id", "nbr", "fresh")
      .groupBy("id", "nbr").agg(max("fresh").as("fresh"))
    val blocks = capped
      .join(vecs.select(col("id").as("nbr"), col("v")), "nbr")
      .groupBy("id")
      .agg(collect_list(struct(col("nbr"), col("fresh"), col("v")))
        .as("members"))
    blocks.queryExecution.toRdd.count()
    println("===== executed block-assembly plan =====")
    println(blocks.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
