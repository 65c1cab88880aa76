package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** Map-side combiner for NN-Descent's per-round merge (guide §2.3
  * "aggregate before you shuffle"): the round's proposal stream —
  * `(id, nbr, sim, fresh)`, the current graph unioned with both directions
  * of every scored wedge pair — is deduplicated per `(id, nbr)` (max sim /
  * min fresh, the merge aggregate's own semantics) and bounded to the best
  * `k` rows per `id` (sim DESC, nbr ASC — the downstream TopK's exact
  * order) WITHIN each input partition, before the rows ever reach the
  * merge exchange. The pair-merge exchange was the graph family's largest
  * remaining shuffle (~100 MB/build at sf0.1, r18 verdict #4).
  *
  * Result safety (why the final graph is bit-identical): the global merge
  * keeps, per id, the top `k` of the (id,nbr)-deduplicated rows under a
  * STRICT total order (nbr values are distinct per id after dedup, so
  * (sim DESC, nbr ASC) has no ties). Any row this combiner drops had `k`
  * strictly-better deduplicated rows for the same id in its own partition
  * (flush epoch) — all of which are emitted and therefore present
  * globally — so a dropped row (and any duplicate of it elsewhere, whose
  * surviving copy might carry a different `fresh` flag) can never rank in
  * the global top `k`: the final TopK truncates it regardless. Duplicate
  * `sim` values across copies are equal by construction (the cosine kernel
  * is deterministic on the same vectors), so max(sim) is pure dedup.
  *
  * Memory is bounded by rows, not keys (the TopKPerKeyExec lesson: a
  * partition upstream of the exchange can see the whole key domain) —
  * at `spark.graft.topk.flushRows` buffered entries every per-id map is
  * emitted and the state reset; dedup/top-k quality degrades gracefully
  * toward pass-through, output stays a correct superset per epoch.
  */
case class NnMergePlan(k: Int, cols: Seq[Attribute], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  // the combiner reads (id, nbr, sim, fresh) even when a parent prunes its
  // own needs down (e.g. a bare count()): carrying them as references stops
  // ColumnPruning from projecting them away below this node
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cols)
  override protected def withNewChildInternal(newChild: LogicalPlan): NnMergePlan =
    copy(child = newChild)
}

case class NnMergeExec(k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // partition-local row dropper: partitioning passes through
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  private def ord(name: String): Int = {
    val i = child.output.indexWhere(_.name == name)
    require(i >= 0, s"nn_merge_combine: missing column $name")
    i
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val idOrd = ord("id"); val nbrOrd = ord("nbr")
    val simOrd = ord("sim"); val freshOrd = ord("fresh")
    require(child.output(idOrd).dataType == LongType &&
      child.output(nbrOrd).dataType == LongType &&
      child.output(simOrd).dataType == DoubleType &&
      child.output(freshOrd).dataType == BooleanType,
      "nn_merge_combine expects (id bigint, nbr bigint, sim double, fresh boolean)")
    val limit = k
    val types = child.output.map(_.dataType).toArray
    val nCols = types.length
    val flushRows = conf.getConfString("spark.graft.topk.flushRows", "262144").toInt
    child.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(types)
      // per-id insertion-ordered maps: nbr -> (sim, fresh); Entry is a
      // 2-slot array to keep allocation flat
      final class Entry(var sim: Double, var fresh: Boolean)
      val state = new java.util.LinkedHashMap[
        java.lang.Long, java.util.HashMap[java.lang.Long, Entry]]()
      new Iterator[InternalRow] {
        private var nBuf = 0
        private var out: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        private val reuse = new GenericInternalRow(nCols)
        private def emitAll(): Unit = {
          val all = new java.util.ArrayList[InternalRow]()
          val idIt = state.entrySet().iterator()
          while (idIt.hasNext) {
            val e = idIt.next()
            val id = e.getKey.longValue()
            val m = e.getValue
            val entries = new Array[(Long, Entry)](m.size())
            var i = 0
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              val kv = it.next()
              entries(i) = (kv.getKey.longValue(), kv.getValue); i += 1
            }
            // strict total order: sim DESC, nbr ASC (nbrs distinct)
            java.util.Arrays.sort(entries, new java.util.Comparator[(Long, Entry)] {
              override def compare(a: (Long, Entry), b: (Long, Entry)): Int = {
                val c = java.lang.Double.compare(b._2.sim, a._2.sim)
                if (c != 0) c else java.lang.Long.compare(a._1, b._1)
              }
            })
            val keep = math.min(limit, entries.length)
            i = 0
            while (i < keep) {
              reuse.update(idOrd, id)
              reuse.update(nbrOrd, entries(i)._1)
              reuse.update(simOrd, entries(i)._2.sim)
              reuse.update(freshOrd, entries(i)._2.fresh)
              all.add(proj(reuse).copy())
              i += 1
            }
          }
          state.clear(); nBuf = 0
          out = all.iterator()
        }
        private def pump(): Unit = {
          while (iter.hasNext && nBuf < flushRows) {
            val row = iter.next()
            val id = java.lang.Long.valueOf(row.getLong(idOrd))
            val nbr = java.lang.Long.valueOf(row.getLong(nbrOrd))
            val sim = row.getDouble(simOrd)
            val fresh = row.getBoolean(freshOrd)
            var m = state.get(id)
            if (m == null) {
              m = new java.util.HashMap[java.lang.Long, Entry]()
              state.put(id, m)
            }
            val e = m.get(nbr)
            if (e == null) { m.put(nbr, new Entry(sim, fresh)); nBuf += 1 }
            else {
              if (sim > e.sim) e.sim = sim
              if (!fresh) e.fresh = false
            }
          }
          emitAll()
        }
        override def hasNext: Boolean = {
          if (!out.hasNext && iter.hasNext) pump()
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): NnMergeExec =
    copy(child = newChild)
}

object NnMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case NnMergePlan(k, _, child) => NnMergeExec(k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object NnMerge {
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(NnMergeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ NnMergeStrategy

  /** Map-side (id,nbr)-dedup + per-id top-`k` combine of a
    * `(id, nbr, sim, fresh)` frame — see [[NnMergePlan]] for the result-
    * safety argument. Purely a shuffle-byte reducer: the global merge
    * aggregate + TopK downstream produce identical results with or
    * without it.
    */
  def combine(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    val cols = Seq("id", "nbr", "sim", "fresh").map { n =>
      analyzed.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"nn_merge_combine: missing column $n in ${analyzed.output.map(_.name)}"))
    }
    DatasetBridge.ofRows(spark, NnMergePlan(k, cols, analyzed))
  }
}
