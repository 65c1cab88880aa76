package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One operator from SURVEY.md §2: a named Spark query over a scale-factor
  * directory, plus (when SQL-expressible) an equivalent DuckDB oracle query
  * the driver uses as the correctness gate.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Parquet table loader for the driver-generated TPC-H-ish test data.
  *
  * `events.ts` has shipped under two physical encodings across driver data
  * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader only
  * accepts as long nanos via `nanosAsLong`) and parquet TIMESTAMP(MICROS)
  * (which Spark reads natively as TIMESTAMP_NTZ). Rather than assume either,
  * we sniff the loaded schema and normalise both to session-TZ TIMESTAMP:
  *   - LongType       → nanos; rebuild with `timestamp_micros(ts DIV 1000)`
  *                      (integer division — a double roundtrip would lose
  *                      precision above 2^53 ns)
  *   - TIMESTAMP_NTZ  → cast to TIMESTAMP (session TZ is pinned to UTC in
  *                      every entrypoint, so wall-clock values are unchanged)
  *   - TIMESTAMP      → pass through
  * This keeps downstream window/sessionize/as-of semantics identical no
  * matter which generation of test data is on disk.
  */
object Tables {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case _                => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

/** Deterministic numeric helpers.
  *
  * Double sums are order-dependent, so a Spark partial-aggregate sum and a
  * DuckDB single-threaded sum can differ in the last ulps. All monetary
  * inputs in the test data carry at most 2 decimal places, so we sum scaled
  * 64-bit integers (exact, associative) and divide once at the end — the
  * same trick works verbatim in the DuckDB oracle SQL, giving bit-identical
  * doubles. At 100 TB this also beats decimal aggregation: long sums stay in
  * whole-stage codegen with no decimal overflow checks.
  */
/** Lineage truncation for iterative operators (components, PageRank,
  * label propagation, k-core peeling): each round's frame must cut its
  * logical plan or the lineage grows unboundedly over rounds.
  *
  * Two modes, chosen by session conf:
  *   - default: `localCheckpoint` (lazy) — executor-local blocks, zero
  *     extra I/O; right for local mode and for clusters where a lost
  *     executor may simply rerun the job;
  *   - `spark.graft.checkpoint.dir=<path>`: durable `checkpoint()` to
  *     that directory (set on the SparkContext on first use) — on a real
  *     100 TB cluster an hours-long iterative job survives executor loss,
  *     which executor-local blocks do not.
  * Both modes truncate lineage identically, so results are bit-identical
  * (spec-pinned in ComponentsSpec).
  */
object Ckpt {
  // setCheckpointDir mints a fresh UUID subdirectory per call — remember
  // the last dir we applied so re-entrant operators don't litter one per
  // round. (Volatile is enough: worst case under a race is one extra
  // subdirectory, never a wrong checkpoint.)
  @volatile private var appliedDir: String = null

  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpoint.dir") match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        if (appliedDir != dir || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir)
          appliedDir = dir
        }
        df.checkpoint(eager = false)
      case _ => df.localCheckpoint(eager = false)
    }
  }
}

object Num {
  /** A <=2-decimal-place double as integer hundredths. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Sum of an exact-integer (cents or cents-product) column in a
    * decimal(38,0) accumulator — the Catalyst analogue of DuckDB's HUGEINT
    * sum. Per-row products fit a long, but a single group aggregating
    * billions of rows (one q1 group is a quarter of lineitem — ~1.5e14 rows
    * at the 100 TB design point) overflows a long accumulator, and ANSI
    * mode turns that into a query abort. 128-bit accumulation never
    * overflows in practice and converts to double identically to the
    * oracle's HUGEINT at the final division.
    */
  def bigSum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0)))

  /** Exact sum of a <=2dp double column, returned as double. */
  def moneySum(c: Column): Column = bigSum(cents(c)) / 100.0

  /** SQL twin of [[cents]] for the DuckDB oracle. */
  def centsSql(expr: String): String = s"CAST(round(($expr) * 100) AS BIGINT)"

  /** SQL twin of [[moneySum]]. */
  def moneySumSql(expr: String): String = s"sum(${centsSql(expr)}) / 100.0"
}
