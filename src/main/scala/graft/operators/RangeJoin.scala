package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Banded (bucketized) range join: points to enclosing intervals.
  *
  * Spark's built-in planner turns a pure range predicate
  * (`p BETWEEN start AND end` with no equality conjunct) into a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) compares and a
  * broadcast of a whole side, which dies long before 100 TB. This operator
  * re-expresses the same semantics as an equi-join on a derived band key
  * (the standard interval-bucketing trick, e.g. Chawda et al.,
  * "Processing Interval Joins On Map-Reduce", EDBT 2014):
  *
  *   band(p) = floor(p / w); an interval [s, e] is replicated to every band
  *   it overlaps (floor(s/w) .. floor(e/w)); candidates equi-join on the
  *   band (plus any caller-supplied equality keys) and are then verified
  *   against the exact containment predicate.
  *
  * A point lies in exactly one band, so a matching (point, interval) pair
  * meets in exactly one band — no post-join dedup is needed. Shuffle volume
  * is |points| + Σ(interval_len/w + 1): pick `bandWidth` near the typical
  * interval length so replication stays O(1) per interval. Both sides
  * shuffle-partition on the band key; skew (a hot band) is handled by AQE
  * skew-join splitting since this is a plain equi-join after rewrite.
  *
  * Domain is `Long` (epoch days, epoch micros, integer keys — callers
  * convert dates/timestamps once, keeping the join key codegen-friendly).
  */
object RangeJoin {

  /** Inner-join `points` to every row of `intervals` whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`.
    * Output columns: all of `points` then all of `intervals` (caller
    * disambiguates name collisions beforehand). `extraEquiKeys` are column
    * names present on BOTH sides, added to the band equi-join (and removed
    * from the interval side in the output to keep names unique).
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bandWidth: Long,
      extraEquiKeys: Seq[String] = Nil): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    // Exact floor division in pure long arithmetic: (a - pmod(a, w)) is a
    // multiple of w, and integral `div` never leaves the long domain.
    // (`/` on longs is Divide-through-double — exact only below 2^53, which
    // would mis-band epoch-micros keys near the top of the long range.)
    def band(c: Column): Column =
      ColumnBridge.column(new IntegralDivide(
        ColumnBridge.expression(c - pmod(c, lit(bandWidth))),
        ColumnBridge.expression(lit(bandWidth))))
    val p = points.withColumn("__band", band(col(pointCol)))
    val i = intervals.withColumn(
      "__band",
      explode(sequence(band(col(startCol)), band(col(endCol)))))
    val joinCond = (Seq("__band") ++ extraEquiKeys)
      .map(k => p(k) === i(k))
      .reduce(_ && _)
    val joined = p.join(i, joinCond)
      .where(p(pointCol) >= i(startCol) && p(pointCol) <= i(endCol))
      .drop(p("__band")).drop(i("__band"))
    extraEquiKeys.foldLeft(joined)((df, k) => df.drop(i(k)))
  }
}
