package graft.testkit

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic linking scenarios with known ground truth — the
  * Spark-first twin of the reference's scenario/entity factories
  * (matchbox common/factories/scenarios.py, entities.py: FeatureConfig +
  * Prefix/Suffix/Replace variation rules, linked_sources_factory, and
  * ClusterEntity ground truth). The reference builds these driver-side to
  * seed a Postgres backend for integration tests; here the generator IS a
  * distributed plan (`spark.range` → md5-derived features → per-slot
  * variation projection), so a 10^9-entity scenario generates with the
  * same code, and the ground truth rides along as a column instead of a
  * Python object graph.
  *
  * Shape: [[entities]] makes the true-entity frame (entity_id + string
  * features, deterministic from the seed); [[source]] materialises one
  * "source system"'s view — every entity appears once per variation slot,
  * each slot applying per-feature [[Variation]] rules (slot 0 is usually
  * identity), with a deterministic per-row key. The `entity_id` column is
  * the planted truth: drop it for the observed view, keep it to score a
  * linker's recovered clusters against the truth partition.
  */
object Scenario {

  /** A string-feature variation rule (entities.py PrefixRule/SuffixRule/
    * ReplaceRule), applied as a Catalyst column transform.
    */
  sealed trait Variation { def applyTo(c: Column): Column }
  final case class Prefix(s: String) extends Variation {
    def applyTo(c: Column): Column = concat(lit(s), c)
  }
  final case class Suffix(s: String) extends Variation {
    def applyTo(c: Column): Column = concat(c, lit(s))
  }
  final case class Replace(from: String, to: String) extends Variation {
    def applyTo(c: Column): Column = regexp_replace(c, from, to)
  }

  /** `n` true entities with md5-derived 10-char string features —
    * deterministic in (seed, entity_id, feature name), diverse enough that
    * distinct entities are never fuzzy-similar by accident.
    */
  def entities(
      spark: SparkSession, n: Long, seed: Long,
      features: Seq[String]): DataFrame = {
    require(n > 0 && features.nonEmpty)
    spark.range(n).select(
      (col("id").as("entity_id") +:
        features.map(f =>
          expr(s"substr(md5(concat('$seed-', id, '-', '$f')), 1, 10)")
            .as(f))): _*)
  }

  /** One source system's view: each entity appears once per variation
    * slot; slot `i` applies `slots(i)`'s per-feature rules (a feature
    * absent from the map passes through unchanged). Row keys are
    * `<name>:<entity_id>:<slot>` — unique, deterministic, and carrying no
    * feature information. The `entity_id` truth column rides along;
    * `.drop("entity_id")` is the observed view a linker gets.
    */
  def source(
      ents: DataFrame, name: String,
      slots: Seq[Map[String, Variation]]): DataFrame = {
    require(slots.nonEmpty, "need at least one variation slot")
    val features = ents.columns.filter(_ != "entity_id").toSeq
    slots.zipWithIndex.map { case (rules, i) =>
      ents.select(
        (concat_ws(":", lit(name), col("entity_id"), lit(i)).as("key") +:
          col("entity_id") +:
          features.map { f =>
            rules.get(f).fold(col(f))(_.applyTo(col(f))).as(f)
          }): _*)
    }.reduce(_ unionByName _)
  }

  /** Does a recovered `(key, component)` assignment induce EXACTLY the
    * planted truth partition? True iff components and entities are in
    * bijection: every key is assigned, each entity maps to one component
    * and each component to one entity. One aggregate over the joined
    * frames — no driver-side cluster materialisation.
    */
  def matchesTruth(assignment: DataFrame, truth: DataFrame): Boolean = {
    val joined = truth.select(col("key"), col("entity_id"))
      .join(assignment.select(col("key"), col("component")), Seq("key"), "left")
    val r = joined.agg(
      count(lit(1)).as("n"),
      sum(when(col("component").isNull, 1L).otherwise(0L)).as("unassigned"),
      countDistinct(col("entity_id")).as("n_ent"),
      countDistinct(col("component")).as("n_comp"),
      countDistinct(col("entity_id"), col("component")).as("n_pairs")).head()
    r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) &&
      r.getLong(3) == r.getLong(4) && r.getLong(0) > 0L
  }
}
