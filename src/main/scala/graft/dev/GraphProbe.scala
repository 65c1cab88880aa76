package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe of the proximity pair graph's degree shape at a given
  * sf dir — sizes the triangle hub threshold against real replicas.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.queries.Relational.graphEdges(spark, args(0))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val stats = deg.agg(count(lit(1)), max("deg"),
      expr("approx_percentile(deg, array(0.5, 0.9, 0.99, 0.999))"),
      sum(expr("deg * deg")), expr("sum(deg) DIV 2")).head()
    println(s"PROBE edges=${stats.get(4)} nodes=${stats.get(0)} maxdeg=${stats.get(1)} " +
      s"pct=${stats.get(2)} sumdeg2=${stats.get(3)}")
    spark.stop()
  }
}
