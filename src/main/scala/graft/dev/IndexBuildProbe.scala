package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose GraphIndex.build wall into its stages. */
object IndexBuildProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.BlockCleanup.muteBenignCleanupSpam()
    val dir = args(0)
    import graft.operators.ann._
    val emb = graft.Tables(spark, dir, "embeddings")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-14s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = timed("full_knn_graph") {
      NnDescent.knnGraph(emb, "vec_id", "embedding", 10, iters = 4)
        .localCheckpoint(false)
    }
    println(s"edges=${g.count()}")
    val hubs = emb.filter(
      pmod(xxhash64(col("vec_id").cast("long"), lit(7L)), lit(16)) === 0)
    val hg = timed("hub_knn_graph") {
      NnDescent.knnGraph(hubs, "vec_id", "embedding", 8, iters = 4)
        .localCheckpoint(false)
    }
    println(s"hub_edges=${hg.count()}")
    val tmp = java.nio.file.Files.createTempDirectory("idxprobe").toString
    timed("merge_write") {
      g.withColumn("long", lit(false))
        .unionByName(hg.withColumn("long", lit(true)))
        .groupBy("id", "nbr")
        .agg(max("sim").as("sim"), min("long").as("long"))
        .repartition(32, col("id"))
        .write.mode("overwrite").parquet(s"$tmp/g")
    }
    spark.stop()
  }
}
