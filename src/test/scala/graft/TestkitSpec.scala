package graft

import graft.operators.Components
import graft.testkit.{Scenario, Testkit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model/resolver/dag fixture factories (reference
  * common/factories/{models,resolvers,dags}.py parity).
  */
class TestkitSpec extends SparkSpec {

  private def equalityEdges(all: DataFrame): DataFrame =
    all.alias("l").join(all.alias("r"),
      expr("l.company = r.company AND l.postcode = r.postcode AND l.key < r.key"))
      .select(col("l.key").as("left_key"), col("r.key").as("right_key"))

  test("model kit: an equality model over identity slots matches the implied pairs exactly") {
    val ents = Scenario.entities(spark, 30, seed = 7L, Seq("company", "postcode"))
    val crm = Scenario.source(ents, "crm",
      Seq(Map.empty[String, Scenario.Variation], Map.empty[String, Scenario.Variation]))
    val web = Scenario.source(ents, "web", Seq(Map.empty[String, Scenario.Variation]))
    val all = crm.unionByName(web)
    val kit = Testkit.modelKit("eq", all, equalityEdges(all))
    assert(kit.matchesExpected)
    // 3 rows per entity -> C(3,2) = 3 implied pairs each
    assert(kit.expected.count() == 90)
  }

  test("model kit surfaces exactly the pairs a variation makes an equality model miss") {
    val ents = Scenario.entities(spark, 20, seed = 7L, Seq("company", "postcode"))
    val crm = Scenario.source(ents, "crm", Seq(Map.empty[String, Scenario.Variation]))
    val web = Scenario.source(ents, "web",
      Seq(Map("company" -> Scenario.Suffix(" ltd"))))
    val all = crm.unionByName(web)
    val kit = Testkit.modelKit("eq", all, equalityEdges(all))
    assert(!kit.matchesExpected)
    assert(kit.spurious.isEmpty, "equality never links distinct entities here")
    // every cross-source pair (one per entity) is missed, nothing else
    assert(kit.missing.count() == 20)
  }

  test("resolver kit + testkit dag: independent union-find agrees with the distributed resolution") {
    val ents = Scenario.entities(spark, 25, seed = 11L, Seq("company", "postcode"))
    val crm = Scenario.source(ents, "crm",
      Seq(Map.empty[String, Scenario.Variation], Map.empty[String, Scenario.Variation]))
    val web = Scenario.source(ents, "web", Seq(Map.empty[String, Scenario.Variation]))
    val all = crm.unionByName(web).localCheckpoint(false)

    val crmKit = Testkit.modelKit("dupes", crm, equalityEdges(crm))
    val crossKit = Testkit.modelKit("links", all, equalityEdges(all))
    val scored = Map(
      "dupes" -> crmKit.edges.withColumn("score", lit(1.0)),
      "links" -> crossKit.edges.withColumn("score", lit(0.6)))
    val thresholds = Map("dupes" -> 0.5, "links" -> 0.5)
    val rKit = Testkit.resolverKit(spark, "clusters", scored, thresholds)

    val tk = new Testkit.TestkitDag
    tk.addSource("crm", crm)
    tk.addSource("web", web)
    tk.addModel(crmKit, Seq("crm"))
    tk.addModel(crossKit, Seq("crm", "web"))
    tk.addResolver(rKit, Seq("dupes", "links")) { deps =>
      val edges = Seq("dupes", "links").map(deps(_)).reduce(_ unionByName _)
      val e = edges.select(
        xxhash64(col("left_key")).as("src"), xxhash64(col("right_key")).as("dst"))
      val keys = edges.select(col("left_key").as("key"))
        .union(edges.select(col("right_key"))).distinct()
        .withColumn("id", xxhash64(col("key")))
      Components.connected(e)
        .join(keys, "id").select(col("key"), col("component"))
    }
    assert(tk.verifyAll())
    assert(tk.models.keySet == Set("dupes", "links"))
    assert(tk.resolvers.keySet == Set("clusters"))
    // the recovered resolution is also exactly the planted truth partition
    assert(Scenario.matchesTruth(
      tk.run()("clusters"), all.select(col("key"), col("entity_id"))))
    // a raised threshold drops the cross-source edges: only crm endpoints
    // remain in the expected universe (25 entities x 2 crm keys)
    val strict = Testkit.resolverKit(spark, "strict", scored,
      Map("dupes" -> 0.5, "links" -> 0.9))
    assert(strict.expected.count() == 50)
    // samePartition rejects a genuinely different partition
    val coarse = tk.run()("clusters").withColumn("component", lit(0L))
    assert(!Testkit.samePartition(tk.run()("clusters"), coarse))
  }

  test("resolver kit refuses production-scale edge sets") {
    import spark.implicits._
    val big = spark.range(10).select(
      concat(lit("k"), col("id")).as("left_key"),
      concat(lit("k"), col("id") + 1).as("right_key"),
      lit(1.0).as("score"))
    intercept[IllegalArgumentException] {
      Testkit.resolverKit(spark, "r", Map("m" -> big), Map("m" -> 0.5), maxEdges = 5)
    }
  }
}
