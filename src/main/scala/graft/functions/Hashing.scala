package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content hashing, mirroring matchbox's canonicalisation
  * (reference: src/matchbox/common/hash.py:110 `hash_rows` — per column emit
  * `name␟value␞`, nulls become `\x00`, concatenate, hash) re-expressed with
  * Spark's codegen'd `sha2`/`concat` built-ins. Hex-string digests rather
  * than raw bytes so results are join/sort friendly and oracle-comparable.
  */
object Hashing {
  val UnitSep = "␟"   // ␟ between column name and value
  val RecordSep = "␞" // ␞ after each column

  /** sha256 hex of the matchbox row canonicalisation over `cols`.
    *
    * Nulls become NUL (`U+0000`), matching the reference
    * (common/hash.py:108 `fill_null("\x00")`) and the oracle twin's
    * `chr(0)`.
    *
    * Only pass columns whose string form is engine-portable (strings,
    * integers, dates formatted upstream): float→string formatting differs
    * across engines.
    */
  def rowHash(cols: Seq[(String, Column)]): Column = {
    val parts = cols.flatMap { case (name, c) =>
      Seq(lit(name), lit(UnitSep), coalesce(c.cast("string"), lit("\u0000")), lit(RecordSep))
    }
    sha2(concat(parts: _*), 256)
  }

  def rowHash(df: DataFrame, cols: Seq[String]): Column =
    rowHash(cols.map(n => n -> df(n)))

  /** SQL twin of [[rowHash]] for the DuckDB oracle. */
  def rowHashSql(cols: Seq[String]): String = {
    val parts = cols.flatMap { n =>
      Seq(s"'$n'", s"'$UnitSep'", s"coalesce(CAST($n AS VARCHAR), chr(0))", s"'$RecordSep'")
    }
    s"sha256(concat(${parts.mkString(", ")}))"
  }

  /** Type-aware canonicalisation of one column before hashing (reference:
    * common/hash.py:83-108 `process_column_for_hashing`): binary → lowercase
    * hex, struct → JSON, array → comma-joined element strings, everything
    * else → string cast; nulls → NUL after conversion. JSON / float string
    * forms follow each engine's formatter, so typed hashes are stable within
    * an engine (the reference has the same caveat between Polars versions).
    */
  def canonical(df: DataFrame, name: String): Column = {
    import org.apache.spark.sql.types._
    val c = df(name)
    val s = df.schema(name).dataType match {
      case BinaryType => lower(hex(c))
      case _: StructType => to_json(c)
      case ArrayType(_, _) => array_join(c.cast(ArrayType(StringType)), ",")
      case _ => c.cast("string")
    }
    coalesce(s, lit("\u0000"))
  }

  /** Row hash over typed columns with a selectable method — `sha256`
    * (reference HashMethod.SHA256) or `xxh64` (Spark's codegen'd `xxhash64`,
    * the public analogue of the reference's XXH3_128 default: same family,
    * 64-bit variant, an order of magnitude cheaper than sha2 on wide scans).
    */
  def rowHashTyped(df: DataFrame, cols: Seq[String], method: String = "sha256"): Column = {
    val parts = cols.flatMap { n =>
      Seq(lit(n), lit(UnitSep), canonical(df, n), lit(RecordSep))
    }
    method match {
      case "sha256" => sha2(concat(parts: _*), 256)
      case "xxh64" => lpad(lower(hex(xxhash64(concat(parts: _*)))), 16, "0")
      case other => throw new IllegalArgumentException(s"unsupported hash method: $other")
    }
  }

  /** Order-invariant cluster hash (reference: common/transform.py:67
    * `hash_cluster_leaves` — digest of the sorted leaf hashes joined by '|').
    * Sorting inside the aggregate makes the result independent of
    * partitioning, so clusters hash identically on any executor layout.
    */
  def clusterHash(leafHash: Column): Column =
    sha2(concat_ws("|", sort_array(collect_list(leafHash))), 256)

  def clusterHashSql(leafHashExpr: String): String =
    s"sha256(string_agg($leafHashExpr, '|' ORDER BY $leafHashExpr))"
}
