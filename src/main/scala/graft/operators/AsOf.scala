package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest-event) join: for every left row, the single
  * right row with the greatest `rightTime <= leftTime` (backward) or the
  * smallest `rightTime >= leftTime` (forward), per join key — the primitive
  * behind point-in-time feature lookups ("the last price/click/state known
  * at event time") that a feature-store pipeline needs and plain equi-joins
  * can't express.
  *
  * Distributed shape — the union + running-`last` formulation: tag both
  * sides, union them, and take a running `last(right_payload, ignoreNulls)`
  * over a (key)-partitioned, (time, side, tiebreak)-ordered window. Cost is
  * ONE shuffle on the key plus the window sort — identical to any windowed
  * aggregate, linear in rows. The naive alternatives do not survive scale:
  * a range join explodes to every (left, right) pair within the horizon,
  * and a per-key `collect_list` caps the key's history at executor memory.
  * A grossly hot key serializes through one partition (inherent to any
  * per-key ordered operator); pre-bucketing by coarse time ranges is the
  * standard mitigation if one key dominates.
  *
  * Matching right rows at the *same* timestamp: `inclusive = true` admits
  * them (DuckDB/pandas `merge_asof` default), `false` requires strictly
  * earlier/later. Ties among right rows sharing (key, time) are broken by
  * `rightTiebreak` (last wins for backward, first for forward) so results
  * are deterministic.
  */
object AsOf {

  /** Backward as-of join (the common "state as of event time" lookup).
    *
    * @param keys        equality join keys present on both sides
    * @param leftTime    left ordering column (numeric or timestamp)
    * @param rightTime   right ordering column (same type as leftTime)
    * @param rightPrefix prepended to right payload columns in the output
    * @param tolerance   max allowed `leftTime - rightTime` (same arithmetic
    *                    as the time columns: numeric delta, or an INTERVAL
    *                    for timestamps); matches farther back are nulled
    * @return left.* plus the matched right payload (null when no match —
    *         left-join semantics)
    */
  def joinBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "right_",
      inclusive: Boolean = true,
      rightTiebreak: Option[String] = None,
      tolerance: Option[Column] = None): DataFrame =
    join(left, right, keys, leftTime, rightTime, rightPrefix, inclusive,
      rightTiebreak, tolerance, backward = true)

  /** Forward as-of join: earliest right row at-or-after the left time. */
  def joinForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "right_",
      inclusive: Boolean = true,
      rightTiebreak: Option[String] = None,
      tolerance: Option[Column] = None): DataFrame =
    join(left, right, keys, leftTime, rightTime, rightPrefix, inclusive,
      rightTiebreak, tolerance, backward = false)

  private def join(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String, inclusive: Boolean,
      rightTiebreak: Option[String], tolerance: Option[Column],
      backward: Boolean): DataFrame = {
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    require(lt == rt, s"as-of time columns must share a type: $leftTime is $lt, $rightTime is $rt")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val clashes = payload.map(rightPrefix + _).toSet.intersect(left.columns.toSet)
    require(clashes.isEmpty,
      s"prefixed right columns collide with left columns: ${clashes.mkString(", ")}")

    // Side ordering decides whether an equal-time right row is visible to a
    // left row. Backward looks through the PRECEDING frame: right rows sort
    // before left (side 0 < 1) to be included, after (2) to be excluded.
    // Forward looks through the FOLLOWING frame, so the placement flips.
    val rSide = if (backward == inclusive) 0 else 2
    val tiebreak = rightTiebreak.map(col).getOrElse(lit(null).cast("long"))

    val lPrep = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast("long").as("_tie"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_l")): _*)
    // right rows with a null time can never be "the most recent state"
    val rPrep = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(rSide).as("_side"),
        tiebreak.cast("long").as("_tie"),
        struct(payload.map(col): _*).as("_r")): _*)
    val lType = lPrep.schema("_l").dataType
    val rType = rPrep.schema("_r").dataType
    val unioned = lPrep.withColumn("_r", lit(null).cast(rType))
      .unionByName(rPrep.withColumn("_l", lit(null).cast(lType)))

    // Null left times sort first (asc, nulls first) where no non-null right
    // row precedes them — they fall out unmatched, as they must.
    val order = Seq(col("_t").asc_nulls_first, col("_side").asc, col("_tie").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val matched =
      if (backward)
        last(col("_r"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("_r"), ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val withM = unioned.withColumn("_m", matched).filter(col("_side") === 1)
    val gated = tolerance.fold(withM) { tol =>
      val gap = if (backward) col("_t") - col("_m")(rightTime)
                else col("_m")(rightTime) - col("_t")
      withM.withColumn("_m", when(col("_m").isNotNull && gap <= tol, col("_m")))
    }
    gated.select(
      left.columns.toSeq.map(c => col("_l")(c).as(c)) ++
        payload.map(c => col("_m")(c).as(rightPrefix + c)): _*)
  }
}
