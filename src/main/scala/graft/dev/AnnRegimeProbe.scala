package graft.dev
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: top-5 recall of every ANN family member vs brute force on a
  * given corpus — the two-regime evidence (uniform-random vs clustered). */
object AnnRegimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import graft.operators.ann._
    val emb = graft.Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    // truth held driver-side (50 rows) so between-family block cleanup can
    // drop EVERY retained block — accumulated checkpoints OOM'd the graph
    // build at 200k before this
    val truth = Knn.bruteForce(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.BlockCleanup.dropRetainedBlocks(spark)
    def recall(name: String, res: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        val hits = res.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).count(truth)
        println(f"REGIME $name%-12s ${hits.toDouble / truth.size}%.2f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
      } catch { case e: Throwable => println(s"REGIME $name ERR ${e.getMessage}") }
      graft.BlockCleanup.dropRetainedBlocks(spark)
    }
    recall("lsh", Knn.lsh(q, emb, "vec_id", "embedding", 5, tables = 12))
    recall("ivf", Ivf.search(q, emb, "vec_id", "embedding", 5, nprobe = 6))
    recall("pq", Pq.search(q, emb, "vec_id", "embedding", 5))
    recall("ivfpq", Pq.searchIvf(q, emb, "vec_id", "embedding", 5))
    recall("sq", Sq.search(q, emb, "vec_id", "embedding", 5))
    recall("ivfsq", Sq.searchIvf(q, emb, "vec_id", "embedding", 5))
    recall("opq", Opq.search(q, emb, "vec_id", "embedding", 5))
    recall("graph", {
      val g = NnDescent.knnGraph(emb, "vec_id", "embedding", 10, iters = 4, cap0 = 40)
      NnDescent.searchGraph(q, g, emb, "vec_id", "embedding", 5,
        beam = 20, hops = 4, seeds = 8)
    })
    spark.stop()
  }
}
