package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, t, label); right: (key, t, price)
  private def left = Seq(
    ("a", 10L, "a10"), ("a", 20L, "a20"), ("a", 30L, "a30"),
    ("b", 15L, "b15"), ("c", 5L, "c5")).toDF("k", "t", "label")
  private def right = Seq(
    ("a", 5L, 1.0), ("a", 20L, 2.0), ("a", 25L, 3.0),
    ("b", 999L, 9.0), ("d", 1L, 4.0)).toDF("k", "rt", "price")

  private def collectMap(df: org.apache.spark.sql.DataFrame): Map[String, Option[Double]] =
    df.collect().map(r => r.getAs[String]("label") ->
      Option(r.getAs[Any]("right_price")).map(_.asInstanceOf[Double])).toMap

  test("backward inclusive picks the latest right at-or-before each left time") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "t", "rt")
    assert(out.columns.toSeq == Seq("k", "t", "label", "right_rt", "right_price"))
    assert(collectMap(out) == Map(
      "a10" -> Some(1.0), "a20" -> Some(2.0), "a30" -> Some(3.0),
      "b15" -> None, "c5" -> None))
  }

  test("backward strict excludes the same-instant right row") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "t", "rt", inclusive = false)
    assert(collectMap(out)("a20") == Some(1.0))
  }

  test("forward inclusive picks the earliest right at-or-after; strict skips the tie") {
    val fwd = AsOf.joinForward(left, right, Seq("k"), "t", "rt")
    assert(collectMap(fwd) == Map(
      "a10" -> Some(2.0), "a20" -> Some(2.0), "a30" -> None,
      "b15" -> Some(9.0), "c5" -> None))
    val strict = AsOf.joinForward(left, right, Seq("k"), "t", "rt", inclusive = false)
    assert(collectMap(strict)("a20") == Some(3.0))
  }

  test("tolerance nulls matches farther back than the horizon") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "t", "rt",
      tolerance = Some(lit(5L)))
    assert(collectMap(out) == Map(
      "a10" -> Some(1.0), "a20" -> Some(2.0), "a30" -> Some(3.0),
      "b15" -> None, "c5" -> None))
    val tight = AsOf.joinBackward(left, right, Seq("k"), "t", "rt",
      tolerance = Some(lit(3L)))
    assert(collectMap(tight)("a10") == None) // 10 - 5 = 5 > 3
  }

  test("equal-time right rows break ties deterministically (last id wins backward)") {
    val ties = Seq(("a", 10L, 100L, 1.0), ("a", 10L, 200L, 2.0))
      .toDF("k", "rt", "rid", "price")
    val l = Seq(("a", 10L, "x")).toDF("k", "t", "label")
    val out = AsOf.joinBackward(l, ties, Seq("k"), "t", "rt",
      rightTiebreak = Some("rid"))
    val r = out.collect().head
    assert(r.getAs[Long]("right_rid") == 200L && r.getAs[Double]("right_price") == 2.0)
    val fwd = AsOf.joinForward(l, ties, Seq("k"), "t", "rt",
      rightTiebreak = Some("rid"))
    assert(fwd.collect().head.getAs[Long]("right_rid") == 100L)
  }

  test("null right times never match; null left times fall out unmatched") {
    val r = Seq(("a", Option(5L), 1.0), ("a", Option.empty[Long], 9.0))
      .toDF("k", "rt", "price")
    val l = Seq(("a", Option(10L), "ok"), ("a", Option.empty[Long], "nul"))
      .toDF("k", "t", "label")
    val out = collectMap(AsOf.joinBackward(l, r, Seq("k"), "t", "rt"))
    assert(out == Map("ok" -> Some(1.0), "nul" -> None))
  }

  test("prefixed right columns must not collide with left columns") {
    val e = intercept[IllegalArgumentException] {
      AsOf.joinBackward(left, right.withColumnRenamed("price", "label"),
        Seq("k"), "t", "rt", rightPrefix = "")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("timestamp time columns work with INTERVAL tolerance") {
    val l = Seq(("a", "2024-01-01 10:00:00", "x"), ("a", "2024-01-01 12:00:00", "y"))
      .toDF("k", "t", "label").withColumn("t", col("t").cast("timestamp"))
    val r = Seq(("a", "2024-01-01 09:30:00", 1.0), ("a", "2024-01-01 09:00:00", 2.0))
      .toDF("k", "rt", "price").withColumn("rt", col("rt").cast("timestamp"))
    val out = collectMap(AsOf.joinBackward(l, r, Seq("k"), "t", "rt",
      tolerance = Some(expr("INTERVAL 1 HOUR"))))
    // x: 09:30 is 30min back (within 1h); y: 09:30 is 2.5h back (outside)
    assert(out == Map("x" -> Some(1.0), "y" -> None))
  }

  test("matches a naive per-row maximum scan on randomized data (both directions)") {
    // deterministic pseudo-random corpus: ~hash-scattered times over few
    // keys so ties, misses, and dense histories all occur
    val rng = new scala.util.Random(42)
    val ls = (1 to 300).map(i => (s"k${rng.nextInt(5)}", rng.nextInt(50).toLong, i.toLong))
    val rs = (1 to 200).map(j => (s"k${rng.nextInt(6)}", rng.nextInt(50).toLong, j.toLong))
    val l = ls.toDF("k", "t", "lid")
    val r = rs.toDF("k", "rt", "rid")
    val out = AsOf.joinBackward(l, r, Seq("k"), "t", "rt", rightTiebreak = Some("rid"))
      .collect().map(x => x.getAs[Long]("lid") -> Option(x.getAs[Any]("right_rid"))).toMap
    val naive = ls.map { case (k, t, lid) =>
      val cands = rs.filter(c => c._1 == k && c._2 <= t)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(c => (c._2, c._3))._3))
    }.toMap
    assert(out.size == naive.size)
    naive.foreach { case (lid, exp) =>
      assert(out(lid).map(_.asInstanceOf[Long]) == exp, s"lid=$lid")
    }
    val fwd = AsOf.joinForward(l, r, Seq("k"), "t", "rt", rightTiebreak = Some("rid"))
      .collect().map(x => x.getAs[Long]("lid") -> Option(x.getAs[Any]("right_rid"))).toMap
    val naiveFwd = ls.map { case (k, t, lid) =>
      val cands = rs.filter(c => c._1 == k && c._2 >= t)
      lid -> (if (cands.isEmpty) None
              else Some(cands.minBy(c => (c._2, c._3))._3))
    }.toMap
    naiveFwd.foreach { case (lid, exp) =>
      assert(fwd(lid).map(_.asInstanceOf[Long]) == exp, s"fwd lid=$lid")
    }
  }

  test("plan shuffles once on the key — no range cross product") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "t", "rt")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one key exchange, got $exchanges:\n$plan")
  }
}
