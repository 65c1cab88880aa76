package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every registered query runs at sf0.001 and returns rows") {
    Registry.all.foreach { d =>
      val n = d.fn(spark, sfDir).count()
      assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("q1_agg groups by returnflag x linestatus with consistent counts") {
    val df = Registry.byName("q1_agg").fn(spark, sfDir)
    val rows = df.collect()
    assert(rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q_window keeps at most 5 ranked rows per segment") {
    val df = Registry.byName("q_window").fn(spark, sfDir)
    val perSeg = df.groupBy("c_mktsegment").count().collect()
    assert(perSeg.forall(_.getAs[Long]("count") <= 5))
    assert(df.agg(max("rnk")).head.getLong(0) <= 5L)
  }

  test("q_events_sessionize sessions partition the events") {
    val df = Registry.byName("q_events_sessionize").fn(spark, sfDir)
    val totalEvents = df.agg(sum("n_events")).head.getLong(0)
    assert(totalEvents == Tables(spark, sfDir, "events").count())
  }
}
