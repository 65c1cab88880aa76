package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ-style validation gate
  * a production pipeline runs before shipping a table (completeness,
  * uniqueness, ranges, set membership), re-expressed Spark-first: every
  * check is an aggregate expression, ALL checks evaluate in ONE pass over
  * the data (a single partial-aggregate shuffle of one row per partition),
  * and the per-check report is unpivoted from that single row. At 100 TB
  * the cost is one scan regardless of how many checks are declared —
  * checks never each rescan the table.
  *
  * Metrics are exact integers in per-mille (floor-divided), so reports are
  * bit-identical across engines and runs; the matching DuckDB formulation
  * is a single SELECT of the same ratios.
  */
object Expectations {

  /** One check: a named integer metric (aggregate expression, per-mille or
    * plain count) and an inclusive acceptance band.
    */
  final case class Check(name: String, metric: Column, lo: Long, hi: Long)

  /** Fraction of non-null values in `c`, per-mille. */
  def completeness(df: DataFrame, c: String): Column =
    expr(s"(1000 * count($c)) div count(*)")

  /** Distinct-to-total ratio of `c`, per-mille (1000 ⇔ unique). */
  def uniqueness(df: DataFrame, c: String): Column =
    expr(s"(1000 * count(DISTINCT $c)) div count(*)")

  /** Fraction of rows where `cond` holds, per-mille. */
  def compliance(cond: String): Column =
    expr(s"(1000 * count_if($cond)) div count(*)")

  /** Evaluate all checks in one aggregate pass.
    * @return one row per check: (check, metric, lo, hi, ok), check order
    *         preserved via an explicit ordinal.
    */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val row = df.agg(checks.head.metric.as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) => c.metric.as(s"m${i + 1}") }: _*)
    unpivot(row, Nil, checks)
  }

  /** Grouped variant: the same one-pass evaluation per group — the
    * per-partition quality report (per language, per source, per day).
    * Still a single scan + one partial-aggregate shuffle on the group
    * keys; the report explodes to |groups|·|checks| rows.
    */
  def evaluateGrouped(df: DataFrame, keys: Seq[String], checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val row = df.groupBy(keys.map(col): _*).agg(checks.head.metric.as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) => c.metric.as(s"m${i + 1}") }: _*)
    unpivot(row, keys, checks)
  }

  private def unpivot(row: DataFrame, keys: Seq[String], checks: Seq[Check]): DataFrame = {
    val report = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i.toLong).as("ord"), lit(c.name).as("check"),
        col(s"m$i").cast("long").as("metric"),
        lit(c.lo).as("lo"), lit(c.hi).as("hi"))
    }
    row.select(keys.map(col) :+ explode(array(report: _*)).as("r"): _*)
      .select(keys.map(col) ++ Seq(
        col("r.ord"), col("r.check"), col("r.metric"), col("r.lo"), col("r.hi")): _*)
      .withColumn("ok", col("metric") >= col("lo") && col("metric") <= col("hi"))
  }
}
