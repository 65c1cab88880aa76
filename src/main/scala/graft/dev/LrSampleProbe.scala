package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev probe: time the LR training row under a sample denominator (the
  * `spark.graft.lr.sampleDen` 100 TB recipe) and report the sampled
  * model's held-out confusion — evidence for BASELINE's decade row that
  * the sampled fit is both fast and still discriminative at sf1.
  *
  * Usage: runMain graft.dev.LrSampleProbe <sfDir> [sampleDen]
  */
object LrSampleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val den = if (args.length > 1) args(1) else "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.lr.sampleDen", den)
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("dx_lr_train")(spark, dir).count()
    val trainWall = (System.nanoTime() - t0) / 1e9
    println(f"dx_lr_train den=$den rows=$n wall=$trainWall%.1f s")
    // dx_lr_train refreshed the session model cache with the sampled fit,
    // so the classify row now reports the SAMPLED model's held-out
    // confusion — accuracy vs majority is the quality evidence.
    val t1 = System.nanoTime()
    val conf = graft.SparkEntry.queries("dx_lr_classify")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val classifyWall = (System.nanoTime() - t1) / 1e9
    val total = conf.values.sum
    // An sf dir with no held-out docs yields an empty confusion — fail
    // loudly instead of printing NaN accuracy / a 0-of-0 majority
    // (ADVICE r17).
    require(total > 0,
      s"dx_lr_classify returned an empty confusion matrix for $dir — " +
        "no held-out documents to score")
    val correct = conf.getOrElse((0L, 0L), 0L) + conf.getOrElse((1L, 1L), 0L)
    val majority = Seq(0L, 1L)
      .map(y => conf.collect { case ((a, _), c) if a == y => c }.sum).max
    println(f"dx_lr_classify wall=$classifyWall%.1f s " +
      f"accuracy=${correct * 100.0 / total}%.1f%% " +
      f"majority=${majority * 100.0 / total}%.1f%% confusion=$conf")
    spark.stop()
  }
}
