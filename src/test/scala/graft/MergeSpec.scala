package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** CDC merge: upsert/delete semantics and the no-base-shuffle plan shape
  * that is the operator's whole point.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "bal")

  test("updates replace, inserts add, deletes remove, the rest pass through") {
    val delta = Seq(
      (2L, "b2", 21.0, "U"), // update
      (3L, "c", 30.0, "D"),  // delete
      (9L, "z", 90.0, "I"))  // insert
      .toDF("k", "name", "bal", "op")
    val got = Merge.upsert(base, delta, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0), (9L, "z", 90.0)))
  }

  test("merge keys stay unique when delta keys are unique") {
    val delta = Seq((1L, "a2", 11.0, "U"), (5L, "e", 50.0, "I"))
      .toDF("k", "name", "bal", "op")
    val merged = Merge.upsert(base, delta, Seq("k"))
    val dupes = merged.groupBy("k").count().filter(col("count") > 1)
    assert(dupes.isEmpty)
    assert(merged.count() == 5)
  }

  test("composite keys merge on the full tuple") {
    val b = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "part", "bal")
    val delta = Seq((1L, "x", 9.0, "U")).toDF("k", "part", "bal", "op")
    val got = Merge.upsert(b, delta, Seq("k", "part"))
      .orderBy("part").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "x", 9.0), (1L, "y", 2.0)))
  }

  test("base side never shuffles: broadcast anti join, no sort-merge") {
    val delta = Seq((2L, "b2", 21.0, "U")).toDF("k", "name", "bal", "op")
    val plan = Merge.upsert(base, delta, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"base shuffled through a sort-merge join:\n$plan")
  }

  test("rejects an empty key list") {
    val delta = Seq((2L, "b2", 21.0, "U")).toDF("k", "name", "bal", "op")
    intercept[IllegalArgumentException](Merge.upsert(base, delta, Nil))
  }
}
