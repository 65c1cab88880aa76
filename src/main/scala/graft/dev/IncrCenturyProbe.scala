package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: century-scale (100×) evidence for the r15 ANN additions —
  * persisted-index build vs serve walls, and incremental addVectors vs
  * full-rebuild walls, with top-5 recall vs brute on the union corpus.
  * Run on BOTH regimes (sf10c clustered / sf10m uniform) per the r14
  * two-regime protocol.
  */
object IncrCenturyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.BlockCleanup.muteBenignCleanupSpam()
    val dir = args(0)
    val what = if (args.length > 1) args(1) else "all" // serve|incr|all
    import graft.operators.ann._
    // NOT localCheckpointed: the between-stage dropRetainedBlocks calls
    // would drop its blocks and later scans would die on
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the parquet re-read is cheap
    val emb = graft.Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth = Knn.bruteForce(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.BlockCleanup.dropRetainedBlocks(spark)
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val hits = res.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).count(truth)
      hits.toDouble / truth.size
    }
    // no automatic block cleanup inside timed(): later stages REUSE the
    // localCheckpointed frames a stage returns (g0 feeds addVectors)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CENTURY $name%-18s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    if (what == "serve" || what == "all") {
      val tmp = java.nio.file.Files.createTempDirectory("century_idx").toString
      timed("index_build") {
        GraphIndex.build(emb, "vec_id", "embedding", k = 10,
          path = s"$tmp/g", iters = 4, numFiles = 32)
      }
      val g = GraphIndex.load(spark, s"$tmp/g")
      val rec = timed("serve_h3b32") {
        recallOf(NnDescent.searchGraph(q, g, emb, "vec_id", "embedding",
          5, beam = 32, hops = 3, seeds = 8))
      }
      println(f"CENTURY serve_recall $rec%.2f")
      graft.BlockCleanup.dropRetainedBlocks(spark)
    }

    if (what == "incr" || what == "all") {
      val delta = emb.filter(col("vec_id") % 5 === 3)
      val base = emb.filter(col("vec_id") % 5 =!= 3)
      val g0 = timed("base_build_80pct") {
        NnDescent.knnGraph(base, "vec_id", "embedding", 10,
          iters = 4, cap0 = 40).localCheckpoint(false)
      }
      val g = timed("addVectors_20pct") {
        NnDescent.addVectors(g0, base, delta, "vec_id", "embedding",
          k = 10, iters = 2, cap0 = 40).localCheckpoint(false)
      }
      val top5 = graft.plans.TopK.perKey(
        g.filter(col("id") < 10), Seq("id"), "sim", 5, tieCols = Seq("nbr"))
        .select(col("id").as("query_id"), col("nbr").as("neighbor_id"))
      println(f"CENTURY incr_recall ${recallOf(top5)}%.2f")
    }
    spark.stop()
  }
}
