package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Whole-process CPU nanoseconds (all Spark executor threads included —
    * local mode is one JVM). Against wall time this distinguishes a plan
    * regression (CPU grows with wall) from shared-box contention (wall grows,
    * CPU doesn't).
    */
  private def processCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime.max(0L)).sum
  }

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
      val cpu0 = processCpuNanos(); val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = if (cpu0 < 0) -1.0 else (processCpuNanos() - cpu0) / 1e9
      val gc = (gcMillis() - gc0) / 1e3
      (name, wall, cpu, gc, ok)
    }
    def jmap(f: ((String, Double, Double, Double, Boolean)) => Double): String =
      results.map(r => s"\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = jmap(_._2)
    val cpus_ = jmap(_._3)
    val gcs = jmap(_._4)
    // a failed query must be visible, never a fast "success": its name is
    // listed and its wall time still counts toward the total
    val failed = results.filterNot(_._5).map(r => s"\"" + r._1 + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // -1 per-query sentinels (unsupported MXBean) must not sum to nonsense
    val totalCpu = if (results.exists(_._3 < 0)) -1.0 else results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cpu_sec":$cpus_,"gc_sec":$gcs,"total_cpu":$totalCpu,"cores":$cpus,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
