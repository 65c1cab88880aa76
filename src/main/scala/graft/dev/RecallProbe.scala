package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    for (dir <- dirs; (it, cp) <- Seq((4,40)); (sd, hp) <- Seq((8,4))) {
      val emb = graft.Tables(spark, dir, "embeddings")
      val t0 = System.nanoTime()
      val g = graft.operators.ann.NnDescent.knnGraph(emb, "vec_id", "embedding", 10, it, cp)
        .localCheckpoint(false)
      println(s"BUILD it=$it cap=$cp ${(System.nanoTime()-t0)/1e9}s")
      val top5 = graft.operators.ann.NnDescent.searchGraph(
        emb.filter(col("vec_id") < 10), g, emb, "vec_id", "embedding", 5, 20, hp, sd)
        .select("query_id", "neighbor_id")
      val brute = graft.operators.ann.Knn.bruteForce(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val nb = brute.count()
      val hits = brute.join(top5, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"RECALL seeds=$sd hops=$hp $hits/$nb = ${hits.toDouble / nb}")
    }
    spark.stop()
  }
}
