package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.LongType

/** Per-key top-k as a first-class operator: logical plan node + planner
  * strategy + physical bounded-heap execution, the (c)-level extension
  * point of the custom-operator ladder (compose built-ins < native
  * expression < custom plan).
  *
  * Spark's built-in formulation — `row_number().over(partitionBy(key)
  * .orderBy(...)) <= k` — must SORT every key group in full: the window
  * operator buffers and orders all rows per key before ranking, so a query
  * with 1M candidates per key pays O(n log n) sort and the memory to hold
  * the group. This operator keeps a bounded k-element heap per key
  * (O(n log k), O(keys·k) memory) after the same hash exchange, which is
  * the asymptotically right plan for ANN reranking at corpus scale.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  // The hash exchange on the key is the ONLY shuffle; EnsureRequirements
  // inserts it from this declaration.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // worst-at-head heap: candidates better than the current worst evict it
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reverse = ordering.reversed()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](math.min(limit, 16), reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val resultProj = UnsafeProjection.create(
        childOutput :+ rankAttr, childOutput :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = heap.toArray(new Array[InternalRow](heap.size()))
        java.util.Arrays.sort(rows, ordering)
        rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, (i + 1).toLong)
          resultProj(joined(r, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] to [[TopKPerKeyExec]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Idempotently registers the planner strategy on the session. Also
    * injectable globally via `graft.functions.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top `k` rows per `keyCols` group ordered by `orderCol`
    * (descending by default, ties broken ascending by `tieCols`), with a
    * `rank` long column (1-based). Replaces the
    * `row_number().over(...)` + filter idiom without the per-group sort.
    */
  def perKey(
      df: DataFrame, keyCols: Seq[String], orderCol: String, k: Int,
      descending: Boolean = true, tieCols: Seq[String] = Nil,
      rankName: String = "rank"): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    def resolve(n: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order =
      SortOrder(resolve(orderCol), if (descending) Descending else Ascending) +:
        tieCols.map(t => SortOrder(resolve(t), Ascending))
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    DatasetBridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(resolve), order, k, rankAttr, analyzed))
  }
}
