package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC merge (the `MERGE INTO` / upsert primitive): apply a change batch of
  * inserts/updates/deletes to a base table by key.
  *
  * The scale-defining choice is the join shape. A full-outer join of base
  * and delta shuffles the ENTIRE base on the merge key — at 100 TB that is
  * the whole corpus through the wire for a batch that touches 0.1% of it.
  * A CDC batch is small by construction, so this operator instead plans
  *
  *   kept    = base LEFT ANTI JOIN delta-keys   (broadcast: base never moves)
  *   merged  = kept UNION ALL (delta rows whose op is not a delete)
  *
  * — one broadcast of the delta's key column and a union; the base is read
  * once, shuffled never. (If a batch ever outgrows broadcast range, drop
  * the hint and AQE falls back to a shuffled anti join — semantics
  * unchanged.) This is the plan Delta Lake/Iceberg `MERGE` optimizers aim
  * for on small-touch batches, expressed directly.
  *
  * Delta contract: same columns as `base` plus `opCol` with 'I'/'U'/'D'
  * markers; one row per key. Inserts and updates are indistinguishable to
  * the merge (both replace-or-add), deletes drop the key entirely.
  */
object Merge {

  def upsert(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val deltaKeys = delta.select(keys.map(col): _*)
    val kept = base.join(broadcast(deltaKeys), keys, "left_anti")
    val upserts = delta.filter(col(opCol) =!= "D").drop(opCol)
    kept.unionByName(upserts)
  }
}
