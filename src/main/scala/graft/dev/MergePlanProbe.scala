package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r19): executed plans of NN-Descent's per-round merge in both
  * spellings — the r18 shape (union → groupBy(id,nbr) exchange → TopK
  * final = SECOND exchange on id) and the r19 shape (map-side NnMerge
  * combine → ONE repartition(id) exchange shared by the dedup aggregate
  * AND the TopK final). Committed as plans/r19/dx_knn_graph_{before,after}
  * evidence; byte/job deltas come from JobStatsProbe.
  */
object MergePlanProbe {
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
    // a realistic current-graph frame and a proposals frame (both
    // checkpointed, as in the descent loop)
    val nn = vecs.select(col("id"))
      .withColumn("salt", explode(array((1 to 20).map(lit): _*)))
      .select(col("id"),
        pmod(xxhash64(col("id"), col("salt")), lit(2000L)).as("nbr"),
        (pmod(xxhash64(col("id"), col("salt"), lit(1)), lit(1000L)) / 1000.0).as("sim"))
      .filter(col("id") =!= col("nbr"))
      .localCheckpoint(false)
    val proposals = vecs.select(col("id"))
      .withColumn("salt", explode(array((1 to 40).map(lit): _*)))
      .select(col("id"),
        pmod(xxhash64(col("id"), col("salt"), lit(2)), lit(2000L)).as("nbr"),
        (pmod(xxhash64(col("id"), col("salt"), lit(3)), lit(1000L)) / 1000.0).as("sim"))
      .filter(col("id") =!= col("nbr"))
      .localCheckpoint(false)
    nn.count(); proposals.count()
    val kBuild = 20
    val before = nn.withColumn("fresh", lit(false))
      .unionByName(proposals.withColumn("fresh", lit(true)))
      .groupBy("id", "nbr")
      .agg(max("sim").as("sim"), min("fresh").as("fresh"))
    val beforeTop = graft.plans.TopK.perKey(before, Seq("id"), "sim", kBuild,
      tieCols = Seq("nbr")).drop("rank")
    beforeTop.queryExecution.toRdd.count()
    println("===== BEFORE (r18): groupBy(id,nbr) exchange + TopK exchange =====")
    println(beforeTop.queryExecution.executedPlan.toString.take(6000))
    val after = graft.operators.ann.NnDescent.mergeTopKForProbe(nn, proposals, kBuild)
    after.queryExecution.toRdd.count()
    println("===== AFTER (r19): NnMerge combine + ONE shared exchange =====")
    println(after.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
