package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handles most cases at runtime; salting is the explicit
  * tool when one side has pathological key concentration (a handful of
  * entity keys covering a large share of a 100 TB fact side). The skewed
  * side gets a random-ish but *deterministic* salt (hash of a row
  * fingerprint mod `salts`); the build side is exploded `salts` times so
  * every salted key still finds its match. Result is identical to the
  * unsalted join, but the hot key's rows spread over `salts` reducers.
  */
object Skew {

  /** Join types where exploding the build side cannot change the result:
    * the probe (skewed) side drives the output row count. A right/full
    * outer join would emit each unmatched build row once per salt, so those
    * are rejected.
    */
  private val safeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedJoin(
      skewed: DataFrame, build: DataFrame,
      key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(safeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports probe-side-driven join types $safeJoinTypes; " +
        s"'$joinType' would duplicate unmatched build rows across salts")
    // Deterministic salt: stable under retries (a rand() salt is not).
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*), lit(salts)).cast("int"))
    val exploded = build.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
