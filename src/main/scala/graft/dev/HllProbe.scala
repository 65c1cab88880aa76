package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only probe: two-level HLL union estimates under different shardings. */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      def unionEst(e: String): Long = docs.withColumn("shard", expr(e))
        .groupBy("shard").agg(expr("hll_sketch_agg(text, 12)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head().getLong(0)
      val e16 = unionEst("CAST(doc_id % 16 AS INT)")
      val e4 = unionEst("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 1), 16, 10) AS INT) % 4")
      val e1 = unionEst("0")
      val sg = docs.agg(expr("hll_sketch_estimate(hll_sketch_agg(text, 12))")).head().getLong(0)
      val ex = docs.agg(countDistinct(col("text"))).head().getLong(0)
      println(s"PROBE $dir est16=$e16 est4=$e4 est1=$e1 single=$sg exact=$ex")
    }
    s.stop()
  }
}
