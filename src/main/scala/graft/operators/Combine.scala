package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-result shaping: matchbox's combine types and cleaning dict
  * (reference: src/matchbox/client/queries.py — QueryCombineType and
  * `_clean`).
  */
object Combine {

  /** `concat`: diagonal union of sources — every source keeps its own
    * (qualified) columns, missing columns become null, a `source` tag is
    * added. No shuffle: a pure union of scans.
    */
  def concat(sources: Seq[(String, DataFrame)]): DataFrame = {
    val allCols: Seq[String] = sources.flatMap(_._2.columns).distinct
    sources
      .map { case (name, df) =>
        val present = df.columns.toSet
        val cols = allCols.map(c => if (present(c)) col(c) else lit(null).as(c))
        df.select(lit(name).as("source") +: cols: _*)
      }
      .reduce(_ unionByName _)
  }

  /** `explode`: outer-join sources on the entity id — one row per unique
    * combination of requested data across sources.
    */
  def explode(left: DataFrame, right: DataFrame, id: String): DataFrame =
    explode(Seq(left, right), id)

  /** N-ary `explode` (the reference shape, queries.py:150-210: one combine
    * call over *all* requested sources): a fold of full-outer equi-joins on
    * the id, deduped once at the end — the single trailing distinct beats a
    * distinct per join. Each fold step re-shuffles the accumulated side:
    * the coalesce(l.id, r.id) projection hides the join-key partitioning
    * from Catalyst (the rows *are* still hash(id)-placed, but the optimizer
    * can't prove it through a coalesce), so N sources cost N-1 exchanges of
    * the growing spine — the inherent price of the declarative full-outer
    * chain, linear in sources, never quadratic in rows.
    */
  def explode(sources: Seq[DataFrame], id: String): DataFrame = {
    require(sources.nonEmpty, "explode needs at least one source")
    sources.reduce(_.join(_, Seq(id), "full_outer")).distinct()
  }

  /** `set_agg`: one row per entity id, every other column aggregated to a
    * sorted array of distinct values. Partial aggregation keeps the shuffle
    * pre-combined; sorting makes array contents deterministic.
    */
  def setAgg(df: DataFrame, id: String): DataFrame = {
    val aggs = df.columns.filterNot(_ == id).map { c =>
      sort_array(collect_set(col(c))).as(c)
    }
    df.groupBy(col(id)).agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Cleaning dict: each alias maps to a SQL expression over the input
    * columns; the id — and, as in the reference, a `leaf_id` column when
    * present — passes through; unmentioned columns are dropped
    * (reference: queries.py `_clean`; leaf_id rule pinned by
    * test_queries.py::test_clean_leaf_id_passed_through). Expressions are
    * compiled by Catalyst — they stay inside whole-stage codegen. Aliases
    * are emitted in sorted order so the output schema never depends on Map
    * iteration order.
    */
  def clean(df: DataFrame, id: String, cleaning: Map[String, String]): DataFrame = {
    // A cleaning alias may redefine a passthrough column (e.g. leaf_id); the
    // alias wins and the automatic passthrough is skipped — emitting both
    // would duplicate the name and break downstream col() resolution.
    val passthrough =
      (id +: (if (df.columns.contains("leaf_id") && id != "leaf_id") Seq("leaf_id") else Nil))
        .filterNot(cleaning.contains)
    val cols: Seq[Column] = passthrough.map(col) ++
      cleaning.toSeq.sortBy(_._1).map { case (alias, sql) => expr(sql).as(alias) }
    df.select(cols: _*)
  }

  /** None = no cleaning: the original frame unchanged (reference
    * test_clean_none_returns_original).
    */
  def clean(df: DataFrame, id: String, cleaning: Option[Map[String, String]]): DataFrame =
    cleaning.fold(df)(clean(df, id, _))
}
