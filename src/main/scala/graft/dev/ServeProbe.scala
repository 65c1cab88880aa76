package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: recall/wall of beam search over the PERSISTED long-linked
  * index at varying hops/seeds/beam — sizes the dx_knn_graph_serve config.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val emb = graft.Tables(spark, dir, "embeddings")
    val tmp = java.nio.file.Files.createTempDirectory("probe_idx").toString
    val t0 = System.nanoTime()
    graft.operators.ann.GraphIndex.build(
      emb, "vec_id", "embedding", k = 10, path = s"$tmp/g", iters = 4,
      numFiles = 8)
    println(s"BUILD+WRITE ${(System.nanoTime() - t0) / 1e9}s")
    val g = graft.operators.ann.GraphIndex.load(spark, s"$tmp/g")
      .localCheckpoint(false)
    println(s"edges=${g.count()} long=${g.filter(col("long")).count()}")
    val brute = graft.operators.ann.Knn.bruteForce(
      emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").localCheckpoint(false)
    val nb = brute.count()
    for ((hp, sd, bm) <- Seq((2, 8, 20), (2, 12, 32), (3, 8, 20), (3, 8, 32), (4, 8, 20))) {
      val t1 = System.nanoTime()
      val top5 = graft.operators.ann.NnDescent.searchGraph(
          emb.filter(col("vec_id") < 10), g, emb, "vec_id", "embedding",
          5, bm, hp, sd)
        .select("query_id", "neighbor_id").localCheckpoint(false)
      val hits = brute.join(top5, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"SERVE hops=$hp seeds=$sd beam=$bm recall=${hits.toDouble / nb} wall=${(System.nanoTime() - t1) / 1e9}s")
    }
    spark.stop()
  }
}
