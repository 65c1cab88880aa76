package graft.dev

import org.apache.spark.sql.SparkSession

// Temporary tuning harness — probe registry queries by name with timings.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    for (name <- args) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val n = df.queryExecution.toRdd.count()
      println(f"PROBE $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
