package graft.dev

import org.apache.spark.sql.SparkSession

// Temporary tuning harness — runs named registered queries and prints results.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
      println(s"RESULT $name rows=${rows.length} wall=${(System.nanoTime() - t0) / 1e9}")
      graft.SparkEntry.queries(name)(spark, dir).write.mode("overwrite").parquet(s"/tmp/scratch_out/$name.parquet")
      rows.take(5).foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
