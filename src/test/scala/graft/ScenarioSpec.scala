package graft

import graft.testkit.Scenario
import org.apache.spark.sql.functions._

/** Seeded scenario factory: deterministic generation, variation slots,
  * truth-partition scoring. */
class ScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("entities are deterministic in the seed and feature-diverse") {
    val a = Scenario.entities(spark, 50, 7L, Seq("company", "postcode"))
    val b = Scenario.entities(spark, 50, 7L, Seq("company", "postcode"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // different seed -> different features
    val c = Scenario.entities(spark, 50, 8L, Seq("company", "postcode"))
    assert(a.except(c).count() == 50)
    // features are unique across entities (diverse md5 derivation)
    assert(a.select("company").distinct().count() == 50)
    assert(a.select(length(col("company"))).distinct().head().getInt(0) == 10)
  }

  test("source slots apply per-feature variation rules and carry the truth column") {
    val ents = Scenario.entities(spark, 10, 1L, Seq("company", "postcode"))
    val src = Scenario.source(ents, "crm", Seq(
      Map.empty[String, Scenario.Variation],
      Map("company" -> Scenario.Suffix(" ltd")),
      Map("company" -> Scenario.Prefix("the "),
          "postcode" -> Scenario.Replace("^.", "z"))))
    assert(src.count() == 30) // one row per entity per slot
    assert(src.select("key").distinct().count() == 30)
    val bySlot = src
      .withColumn("slot", split(col("key"), ":").getItem(2).cast("int"))
    // slot 1: company gains the suffix, postcode untouched
    val s1 = bySlot.filter(col("slot") === 1)
      .join(ents.withColumnRenamed("company", "base")
        .withColumnRenamed("postcode", "pbase"), "entity_id")
    assert(s1.filter(col("company") =!= concat(col("base"), lit(" ltd"))).isEmpty)
    assert(s1.filter(col("postcode") =!= col("pbase")).isEmpty)
    // slot 2: prefix on company, first postcode char replaced
    val s2 = bySlot.filter(col("slot") === 2)
      .join(ents.withColumnRenamed("company", "base")
        .withColumnRenamed("postcode", "pbase"), "entity_id")
    assert(s2.filter(col("company") =!= concat(lit("the "), col("base"))).isEmpty)
    assert(s2.filter(substring(col("postcode"), 1, 1) =!= "z").isEmpty)
  }

  test("matchesTruth accepts only the exact planted partition") {
    val truth = Seq(
      ("a:0:0", 0L), ("a:0:1", 0L), ("a:1:0", 1L), ("a:1:1", 1L))
      .toDF("key", "entity_id")
    val exact = Seq(
      ("a:0:0", 100L), ("a:0:1", 100L), ("a:1:0", 200L), ("a:1:1", 200L))
      .toDF("key", "component")
    assert(Scenario.matchesTruth(exact, truth))
    // over-merged: two entities in one component
    val merged = Seq(
      ("a:0:0", 100L), ("a:0:1", 100L), ("a:1:0", 100L), ("a:1:1", 100L))
      .toDF("key", "component")
    assert(!Scenario.matchesTruth(merged, truth))
    // split: one entity across two components
    val split2 = Seq(
      ("a:0:0", 100L), ("a:0:1", 101L), ("a:1:0", 200L), ("a:1:1", 200L))
      .toDF("key", "component")
    assert(!Scenario.matchesTruth(split2, truth))
    // unassigned key
    val partial = Seq(
      ("a:0:0", 100L), ("a:0:1", 100L), ("a:1:0", 200L))
      .toDF("key", "component")
    assert(!Scenario.matchesTruth(partial, truth))
  }
}
