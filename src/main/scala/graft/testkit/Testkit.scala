package graft.testkit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Fixture-composition testkits — the Spark twin of the reference factory
  * package's model/resolver/dag testkits (matchbox
  * common/factories/models.py `model_factory`/`ModelTestkit`,
  * resolvers.py `resolver_factory`/`ResolverTestkit`, dags.py
  * `TestkitDAG`), completing [[Scenario]]'s entity/source coverage. The
  * reference builds fixtures as driver-side object graphs; here the
  * expected-result derivations are DataFrame plans, except the resolver
  * kit's expected clustering, which deliberately re-solves with a second
  * algorithm (a driver union-find — the reference's DisjointSet, valid at
  * fixture scale only and size-guarded) so a testkit assertion never
  * shares code with the operator under test.
  */
object Testkit {

  /** All same-entity key pairs implied by a truth-carrying source view —
    * the expectation a perfect model must emit (models.py
    * `ModelTestkit`'s known-truth probabilities). Canonical
    * `left_key < right_key` orientation; a per-entity self equi-join whose
    * fan-out is bounded by rows-per-entity (variation slots × sources).
    */
  def impliedPairs(
      view: DataFrame,
      keyCol: String = "key", entityCol: String = "entity_id"): DataFrame = {
    val l = view.select(col(entityCol).as("e"), col(keyCol).as("left_key"))
    val r = view.select(col(entityCol).as("e"), col(keyCol).as("right_key"))
    l.join(r, "e")
      .where(col("left_key") < col("right_key"))
      .select("left_key", "right_key")
      .distinct()
  }

  /** A model fixture: the model's emitted pair edges next to the
    * truth-implied expectation, both as canonical string-key pairs.
    */
  final case class ModelKit(name: String, edges: DataFrame, expected: DataFrame) {
    def missing: DataFrame = expected.except(edges)
    def spurious: DataFrame = edges.except(expected)
    def matchesExpected: Boolean = missing.isEmpty && spurious.isEmpty
  }

  /** Build a [[ModelKit]] from a truth-carrying view and the model's
    * emitted edges (canonicalised here, so either orientation is accepted).
    */
  def modelKit(
      name: String, truthView: DataFrame, edges: DataFrame,
      leftCol: String = "left_key", rightCol: String = "right_key",
      keyCol: String = "key", entityCol: String = "entity_id"): ModelKit = {
    val canon = edges.select(
      least(col(leftCol), col(rightCol)).as("left_key"),
      greatest(col(leftCol), col(rightCol)).as("right_key"))
      .where(col("left_key") =!= col("right_key"))
      .distinct()
    ModelKit(name, canon, impliedPairs(truthView, keyCol, entityCol))
  }

  /** A resolver fixture: the expected `(key, component)` assignment over
    * the edge endpoints, solved INDEPENDENTLY of
    * [[graft.operators.Components]] by a driver union-find (the reference
    * resolvers.py `MockResolver` DisjointSet path). Component labels are
    * each cluster's minimum key, so the frame is deterministic — but
    * compare partitions with [[samePartition]] anyway when the other side
    * uses a different representative convention.
    */
  final case class ResolverKit(name: String, expected: DataFrame)

  /** Solve per-model thresholded edges into a [[ResolverKit]].
    * Fixture-scale only: refuses more than `maxEdges` surviving edges
    * rather than silently collecting a production graph onto the driver.
    */
  def resolverKit(
      spark: SparkSession, name: String,
      modelEdges: Map[String, DataFrame],
      thresholds: Map[String, Double],
      maxEdges: Int = 100000): ResolverKit = {
    require(modelEdges.keySet.subsetOf(thresholds.keySet),
      s"missing thresholds for ${modelEdges.keySet -- thresholds.keySet}")
    val surviving = modelEdges.toSeq.sortBy(_._1).map { case (m, e) =>
      e.where(col("score") >= lit(thresholds(m)))
        .select(col("left_key").cast("string"), col("right_key").cast("string"))
    }.reduce(_ unionByName _)
    val pulled = surviving.take(maxEdges + 1)
    require(pulled.length <= maxEdges,
      s"resolver kit is fixture-scale only: > $maxEdges edges survive thresholds")
    val parent = mutable.Map[String, String]()
    def find(x0: String): String = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    pulled.foreach { row =>
      val (a, b) = (row.getString(0), row.getString(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    import spark.implicits._
    val assigned = parent.keys.toSeq.sorted.map(k => (k, find(k)))
    ResolverKit(name, assigned.toDF("key", "component"))
  }

  /** Are two `(key, component)` assignments the same partition up to
    * component relabelling? Bijection check via [[Scenario.matchesTruth]].
    */
  def samePartition(a: DataFrame, b: DataFrame): Boolean =
    Scenario.matchesTruth(a,
      b.select(col("key"), col("component").as("entity_id")))

  /** The reference `TestkitDAG`: a registry of fixture kits wrapped around
    * a real [[graft.dags.Dag]], so a composed pipeline runs through the
    * production DAG executor while each step's expectation stays
    * addressable by name.
    */
  final class TestkitDag {
    val dag = new graft.dags.Dag
    private val sourcesReg = mutable.LinkedHashMap[String, DataFrame]()
    private val modelsReg = mutable.LinkedHashMap[String, ModelKit]()
    private val resolversReg = mutable.LinkedHashMap[String, ResolverKit]()

    def addSource(name: String, df: DataFrame): Unit = {
      dag.source(name)(df)
      sourcesReg(name) = df
    }

    /** Register a model step that materialises the kit's emitted edges. */
    def addModel(kit: ModelKit, inputs: Seq[String]): Unit = {
      dag.model(kit.name, inputs)(_ => kit.edges)
      modelsReg(kit.name) = kit
    }

    /** Register a resolver step with its own build (the production
      * resolution plan); the kit carries the independent expectation.
      */
    def addResolver(kit: ResolverKit, inputs: Seq[String])(
        build: Map[String, DataFrame] => DataFrame): Unit = {
      dag.resolver(kit.name, inputs)(build)
      resolversReg(kit.name) = kit
    }

    def sources: Map[String, DataFrame] = sourcesReg.toMap
    def models: Map[String, ModelKit] = modelsReg.toMap
    def resolvers: Map[String, ResolverKit] = resolversReg.toMap

    def run(): Map[String, DataFrame] = dag.run()

    /** Every registered expectation against the executed DAG: models match
      * their implied pairs, resolvers' runs are the same partition as the
      * independent union-find. Runs the DAG if not yet run.
      */
    def verifyAll(): Boolean = {
      val results = run()
      modelsReg.valuesIterator.forall(_.matchesExpected) &&
        resolversReg.valuesIterator.forall(k =>
          samePartition(results(k.name), k.expected))
    }
  }
}
