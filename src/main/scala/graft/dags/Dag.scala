package graft.dags

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Minimal DAG orchestration over Spark DataFrame steps — the client-side
  * shape of matchbox's pipeline composition (reference:
  * src/matchbox/client/dags.py, steps.py): sources feed models (dedupers /
  * linkers), models feed resolvers, and `run()` executes in dependency
  * order, materialising each step's result once.
  *
  * Steps are lazy DataFrame builders, so the *composed* plan is still one
  * Catalyst plan per sink unless a step is explicitly cached — on a cluster
  * that means the optimizer sees across step boundaries.
  */
final class Dag {
  private val steps = mutable.LinkedHashMap[String, DagStep]()
  private val results = mutable.Map[String, DataFrame]()

  def addStep(name: String, dependsOn: Seq[String], kind: String = "step")(
      build: Map[String, DataFrame] => DataFrame): DagStep = {
    require(!steps.contains(name), s"duplicate step $name")
    dependsOn.foreach(d => require(steps.contains(d), s"unknown dependency $d of $name"))
    val step = DagStep(name, dependsOn, build, kind)
    steps(name) = step
    step
  }

  def source(name: String)(build: => DataFrame): DagStep =
    addStep(name, Nil, "source")(_ => build)

  def model(name: String, inputs: Seq[String])(build: Map[String, DataFrame] => DataFrame): DagStep =
    addStep(name, inputs, "model")(build)

  def resolver(name: String, inputs: Seq[String])(build: Map[String, DataFrame] => DataFrame): DagStep =
    addStep(name, inputs, "resolver")(build)

  /** Run every step in topological (insertion-respecting) order. */
  def run(): Map[String, DataFrame] = {
    val done = mutable.Set[String]()
    def runStep(name: String): DataFrame = results.getOrElseUpdate(name, {
      val step = steps(name)
      require(!done.contains(name), s"cycle at $name")
      done += name
      val deps = step.dependsOn.map(d => d -> runStep(d)).toMap
      step.build(deps)
    })
    steps.keys.foreach(runStep)
    results.toMap
  }

  /** Re-run from `name` down (reference dags.py "run from step", the daily
    * "rerun from this model" action): invalidates the cached results of
    * `name` and every transitive dependent, keeps everything upstream, then
    * runs. Returns the refreshed full result map.
    */
  def runFrom(name: String): Map[String, DataFrame] = {
    require(steps.contains(name), s"unknown step $name")
    dependents(name).foreach(results.remove)
    run()
  }

  /** `name` plus every step that transitively depends on it. */
  private[dags] def dependents(name: String): Set[String] = {
    val out = mutable.Set(name)
    var grew = true
    while (grew) {
      grew = false
      steps.values.foreach { s =>
        if (!out.contains(s.name) && s.dependsOn.exists(out.contains)) {
          out += s.name; grew = true
        }
      }
    }
    out.toSet
  }

  /** Step inspection (reference dags.py step listing): (name, kind,
    * dependencies, materialised?) in insertion order.
    */
  def describe: Seq[(String, String, Seq[String], Boolean)] =
    steps.values.toSeq.map(s => (s.name, s.kind, s.dependsOn, results.contains(s.name)))

  /** String rendering of the DAG (reference dags.py:384 `draw`): `"tree"`
    * shows apex steps (steps nothing depends on) with their dependency
    * trees; `"list"` shows steps as a numbered list in execution order.
    * Each step carries a kind marker and an execution-status marker —
    * `[x]` materialised, `[ ]` awaiting — driven by the same result cache
    * `run()`/`runFrom()` maintain.
    */
  def draw(mode: String = "tree"): String = {
    require(mode == "tree" || mode == "list", s"unknown draw mode $mode")
    if (steps.isEmpty) return "Empty DAG"
    val stepNo = steps.keys.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    def marker(s: DagStep) = {
      val status = if (results.contains(s.name)) "[x]" else "[ ]"
      s"$status ${s.kind} ${s.name}"
    }
    if (mode == "list")
      steps.values.map(s => s"${stepNo(s.name)}. ${marker(s)}").mkString("\n")
    else {
      val dependedOn = steps.values.flatMap(_.dependsOn).toSet
      val apex = steps.values.filterNot(s => dependedOn(s.name)).toSeq
      val sb = new StringBuilder
      def render(s: DagStep, prefix: String, isLast: Boolean, isApex: Boolean): Unit = {
        val connector = if (isApex) "" else if (isLast) "└── " else "├── "
        sb.append(prefix).append(connector).append(marker(s)).append('\n')
        val childPrefix =
          if (isApex) prefix else prefix + (if (isLast) "    " else "│   ")
        val deps = s.dependsOn
        deps.zipWithIndex.foreach { case (d, i) =>
          render(steps(d), childPrefix, i == deps.size - 1, isApex = false)
        }
      }
      apex.foreach(a => render(a, "", isLast = true, isApex = true))
      sb.result().stripLineEnd
    }
  }

  def result(name: String): DataFrame = results(name)

  /** Content fingerprint of a materialised step (reference resolvers.py:186
    * `_fingerprint` via common/transform.py `hash_cluster_leaves`): an
    * order-invariant digest of the step's full result — typed row hashes
    * combined under the same sorted-digest contract as the table/cluster
    * hash — so two runs fingerprint identically iff their results have the
    * same content, regardless of row order or partitioning. This is the
    * run-persistence primitive: a step whose inputs' fingerprints are
    * unchanged can be skipped on re-run.
    */
  def fingerprint(name: String): String = {
    import org.apache.spark.sql.functions.col
    val df = results.getOrElse(name, throw new IllegalStateException(
      s"step $name is not materialised — run() first"))
    df.select(graft.functions.Hashing.rowHashTyped(df, df.columns.toSeq).as("h"))
      .agg(graft.functions.Hashing.clusterHash(col("h")).as("fp"))
      .head().getString(0)
  }
}

final case class DagStep(
    name: String, dependsOn: Seq[String],
    build: Map[String, DataFrame] => DataFrame, kind: String = "step")
