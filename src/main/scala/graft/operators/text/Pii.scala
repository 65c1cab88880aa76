package graft.operators.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** PII-detection battery helpers: pattern inventory + a Luhn mod-10
  * validator built as PURE INTEGER SQL (no UDF, no libm) that renders in
  * both the Spark dialect and the DuckDB oracle dialect — the repo's
  * exactness discipline applied to payment-card detection, where a naive
  * digit-run regex over-fires and the checksum is what separates a card
  * number from a serial number.
  *
  * Card layout used by the seeds: 16 digits = a 15-digit base (leading
  * '4') + the Luhn check digit. Validation doubles every second digit
  * from the right (positions 1,3,5,… 0-based from the right — the odd
  * 1-based string positions of a 16-char candidate), subtracting 9 from
  * two-digit doubles, and accepts iff the total ≡ 0 (mod 10).
  */
object Pii {

  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Card candidates are MAXIMAL digit runs of exactly 16 digits: extract
    * `[0-9]+` runs, keep length-16 ones. A bare `[0-9]{16}` pattern has no
    * digit-boundary guards, so a 17+-digit serial number would yield a
    * misaligned 16-digit window as a false candidate (r13 ADVICE). Run
    * extraction + length filter expresses the boundary guard in BOTH
    * engines — DuckDB's RE2 has no lookbehind, so the
    * `(?<![0-9])…(?![0-9])` spelling would not cross.
    */
  val digitRunRe = "[0-9]+"
  val cardLen = 16

  /** Luhn digit-sum of a 16-char digit-string SQL expression `c`; valid
    * iff `% 10 = 0`. Dialect-neutral (substring/CAST/CASE are common to
    * Spark and DuckDB).
    */
  def luhnSum16(c: String): String =
    (1 to 16).map { i =>
      val d = s"CAST(substring($c, $i, 1) AS INT)"
      if (i % 2 == 1) s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString("(", " + ", ")")

  /** 16-digit card-number STRING with a correct (or, with `offset`,
    * deliberately broken) check digit, from a 15-digit bigint base
    * expression `b`. `divOp` is the integer-division spelling: `div` on
    * Spark, `//` on DuckDB.
    */
  def cardFromBase(b: String, divOp: String, offset: Int = 0): String = {
    val sumB = (0 to 14).map { j =>
      val d = s"((($b) $divOp ${"1" + "0" * j}) % 10)"
      if (j % 2 == 0) s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString("(", " + ", ")")
    val chk = s"((10 - $sumB % 10) % 10 + $offset) % 10"
    s"concat(CAST($b AS STRING), CAST($chk AS STRING))"
  }

  /** Spark Column: 1 when the 16-char digit string in `c` passes Luhn. */
  def luhnValid(c: String): Column =
    expr(s"CASE WHEN ${luhnSum16(c)} % 10 = 0 THEN 1 ELSE 0 END")
}
