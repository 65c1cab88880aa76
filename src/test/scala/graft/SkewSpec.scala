package graft

import graft.operators.{Link, Skew}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, including outer rows") {
    val skewed = (1 to 5000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload") // key 1 is hot
    val build = (1L to 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(build, Seq("k"))
    val salted = Skew.saltedJoin(skewed, build, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("estimateLambda recovers the deterministic-rule match share") {
    val customer = Tables(spark, sfDir, "customer")
    val supplier = Tables(spark, sfDir, "supplier")
    val lambda = Link.estimateLambda(
      customer, supplier, "c_custkey", "s_suppkey",
      Seq("l.c_custkey = r.s_suppkey"), recall = 0.5)
    val nMatched = supplier.count().toDouble // 1-1 on key prefix
    val expected = (nMatched / 0.5) / (customer.count().toDouble * supplier.count())
    assert(math.abs(lambda - expected) < 1e-12)
  }
}
