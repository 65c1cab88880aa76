package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary tuning harness — stage timings for the prefix-filter join.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val d = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val dupes = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("lang"),
        expr("concat(substring(text, 1, length(text) - 10), ' spark dup tail')").as("text"))
    val input = d.unionByName(dupes)

    val docs = input
      .select(col("doc_id"),
        array_distinct(graft.functions.Sketches.shingleHashes(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) >= 1)
      .localCheckpoint(false)
    time("docs")(docs.count())

    val post = docs.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = post.groupBy("g").agg(count(lit(1)).as("df"))
    val ordered = post.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(df, g))), x -> x.g)").as("osh"))
      .withColumn("sz", size(col("osh")).cast("long"))
      .withColumn("plen", expr("CAST(sz - ((6 * sz + 9) DIV 10) + 1 AS INT)"))
      .localCheckpoint(false)
    time("ordered")(ordered.count())

    val cand = ordered
      .select(col("doc_id"), col("sz"), explode(expr("slice(osh, 1, plen)")).as("g"))
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sz")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    named_struct('left_id', x.doc_id, 'szl', x.sz,
          |                 'right_id', y.doc_id, 'szr', y.sz))))""".stripMargin)).as("p"))
      .select("p.left_id", "p.szl", "p.right_id", "p.szr")
      .filter(expr("10 * least(szl, szr) >= 6 * greatest(szl, szr)"))
      .distinct()
      .localCheckpoint(false)
    time("cand")(println("  n_cand=" + cand.count()))

    val out = cand
      .join(ordered.select(col("doc_id").as("left_id"), col("osh").as("osh_l")), "left_id")
      .join(ordered.select(col("doc_id").as("right_id"), col("osh").as("osh_r")), "right_id")
      .withColumn("o", expr("CAST(size(array_intersect(osh_l, osh_r)) AS BIGINT)"))
      .filter(expr("10 * o >= 6 * (szl + szr - o)"))
    time("verify")(println("  n_out=" + out.count()))
    spark.stop()
  }
}
