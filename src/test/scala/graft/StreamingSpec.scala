package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, event_type: String, value: Double)
case class Rec(id: Long, nationkey: Int)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming eventRates matches the batch twin on the same data") {
    implicit val ctx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq

    val input = MemoryStream[Ev]
    input.addData(events)
    val q = Streams.eventRates(input.toDF())
      .writeStream.format("memory").queryName("rates").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("rates")
    // same plan over a batch DataFrame; the watermark is a no-op in batch
    val batch = Streams.eventRates(
      Tables(spark, sfDir, "events").select(col("ts"), col("event_type"), col("value")))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("incremental stream-static match equals the batch linker") {
    implicit val ctx = spark.sqlContext
    val reference = Tables(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val newRecords = Tables(spark, sfDir, "customer")
      .filter(col("c_custkey") < 20)
      .select(col("c_custkey").as("id"), col("c_nationkey").cast("int").as("nationkey"))
      .as[Rec].collect().toSeq

    val input = MemoryStream[Rec]
    input.addData(newRecords)
    val q = Streams.incrementalMatch(
      input.toDF(), reference, "id", "s_suppkey",
      Seq("l.id = r.s_suppkey", "l.nationkey = r.s_nationkey AND l.id = r.s_suppkey"))
      .writeStream.format("memory").queryName("matches").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("matches").select("left_id", "right_id")
    val batchPairs = Tables(spark, sfDir, "customer").filter(col("c_custkey") < 20).alias("l")
      .join(reference.alias("r"), expr("l.c_custkey = r.s_suppkey"))
      .select(col("c_custkey").cast("long").as("left_id"), col("s_suppkey").cast("long").as("right_id"))
    assert(streamed.count() > 0)
    assert(streamed.except(batchPairs).isEmpty && batchPairs.except(streamed).isEmpty)
  }

  test("dag runs steps in dependency order and memoises results") {
    val dag = new graft.dags.Dag
    dag.source("customer")(Tables(spark, sfDir, "customer"))
    dag.model("dedupe", Seq("customer")) { deps =>
      graft.operators.Dedupe.naive(deps("customer"), "c_custkey", Seq("c_nationkey", "c_mktsegment"))
    }
    dag.resolver("resolve", Seq("dedupe")) { deps =>
      graft.operators.Components.connected(
        deps("dedupe").select(col("left_id").as("src"), col("right_id").as("dst")))
    }
    val results = dag.run()
    val direct = graft.operators.Components.connected(
      graft.operators.Dedupe.naive(
        Tables(spark, sfDir, "customer"), "c_custkey", Seq("c_nationkey", "c_mktsegment"))
        .select(col("left_id").as("src"), col("right_id").as("dst")))
    assert(results("resolve").except(direct).isEmpty && direct.except(results("resolve")).isEmpty)
  }
}
