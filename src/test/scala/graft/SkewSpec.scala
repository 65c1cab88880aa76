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

  test("bucketed-to-bucketed join plans without a shuffle exchange") {
    import graft.sources.Warehouse
    val cust = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val ords = Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderstatus")
    Warehouse.writeBucketed(cust, "cust_b", Seq("c_custkey"), numBuckets = 4)
    Warehouse.writeBucketed(ords, "ord_b", Seq("o_custkey"), numBuckets = 4)
    try {
      val joined = spark.table("cust_b")
        .join(spark.table("ord_b"),
          col("c_custkey") === col("o_custkey"))
      assert(joined.count() == cust.join(ords, col("c_custkey") === col("o_custkey")).count())
      // co-located bucket layout satisfies the join's distribution: the
      // whole point of bucketing at 100 TB is that this plans shuffle-free
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not re-shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cust_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // At 100 TB the runtime-injected bloom filter turns a selective dim
    // filter into a fact-scan prune. Thresholds are lowered so the tiny
    // test corpus qualifies; the assertion is that injection actually fires
    // on our join shape.
    val conf = spark.conf
    val old = (conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
      conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB"),
      conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // the rule only fires for shuffle joins (a broadcast build side already
    // reaches every task); disable auto-broadcast so the tiny test corpus
    // takes the shuffle-join shape it would have at 100 TB
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lineitem = Tables(spark, sfDir, "lineitem")
      val orders = Tables(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan:\n$plan")
      assert(joined.count() > 0)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", old._1)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", old._2)
      conf.set("spark.sql.autoBroadcastJoinThreshold", old._3)
    }
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
