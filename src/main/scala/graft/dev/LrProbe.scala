package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: inspect the LR fit on the synthetic clean-signal corpus the
  * SelectionSpec uses — per-iteration loss, learned weights on the signal
  * bucket, held-out margins.
  */
object LrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val noise = Seq.tabulate(40)(i => s"w$i")
    val corpus = Seq.tabulate(80) { i =>
      val words = Seq.fill(8)(noise(rng.nextInt(noise.size))) ++
        (if (i % 2 == 0) Seq("spark") else Nil)
      (i.toLong, "en", rng.shuffle(words).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val tk = graft.queries.Selection.nbTokens(corpus).localCheckpoint(false)
    val sparkBucket = tk.filter(col("tok") === "spark")
      .select("bucket").head().getLong(0)
    println(s"spark bucket = $sparkBucket")
    val train2 = tk.filter(col("doc_id") % 4 < 2)
    val m = graft.queries.Selection.lrTrain(
      train2.select(col("doc_id"), col("bucket")).distinct(),
      train2.groupBy("doc_id")
        .agg(max(when(col("tok") === "spark", 1L).otherwise(0L)).as("y")))
    println(s"losses = ${m.lossMicroByIter}")
    println(s"bias = ${m.biasMicro}")
    println(s"w[spark] = ${m.wMicro(sparkBucket.toInt)}")
    println(s"nonzero weights: " + m.wMicro.zipWithIndex.filter(_._1 != 0L)
      .map { case (w, i) => s"$i:$w" }.mkString(" "))
    val wArr = array(m.wMicro.map(lit(_)): _*)
    val held = tk.filter(col("doc_id") % 4 >= 2)
    held.select(col("doc_id"), col("bucket")).distinct()
      .withColumn("wv", element_at(wArr, col("bucket").cast("int") + 1))
      .groupBy("doc_id").agg(sum("wv").as("mq"))
      .join(held.groupBy("doc_id")
        .agg(max(when(col("tok") === "spark", 1L).otherwise(0L)).as("y")), "doc_id")
      .orderBy("doc_id").show(40)
    spark.stop()
  }
}
