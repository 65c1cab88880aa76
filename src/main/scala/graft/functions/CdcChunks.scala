package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the Gear/FastCDC family — Xia et al., USENIX
  * ATC 2016): roll `h ← (2h + gear(c)) mod 2^28` over the document's code
  * points and cut a chunk boundary at every position whose hash lands on a
  * divisor multiple, subject to min/max chunk lengths. Boundaries depend
  * only on a 28-character sliding window of CONTENT (mod 2^28, a shifted-in
  * character falls out of the hash after 28 steps), so an insertion or edit
  * re-aligns after at most one chunk — the property that makes chunk-hash
  * dedup robust to shifts where fixed-width shingles are not. This is the
  * scale path for cross-document substring dedup: chunk every document
  * once (map-only), hash chunks, and a single groupBy finds shared runs —
  * no quadratic candidate pairs.
  *
  * The gear table is arithmetic, not random: `gear(c) = (c·2654435761)
  * mod 2^28` (Knuth's multiplicative constant). That choice makes the
  * whole kernel replayable in portable integer SQL: because 2^28 ≡ 0,
  * the rolling hash has the closed form
  * `h_t = Σ_{j=t-27..t} gear(c_j)·2^(t-j) mod 2^28` — a per-position
  * windowed sum with no sequential state — and every term stays below
  * 2^55, overflow-free in signed 64-bit. The DuckDB oracle twin computes
  * exactly that (`Pipeline.cdcChunk` keeps the two in lockstep).
  *
  * Cut rule, scanning positions t = 1..n with `len = t − lastCut`:
  * cut iff `(len ≥ minLen AND h_t mod div = 0) OR len ≥ maxLen`; the
  * final partial chunk is always emitted. Returns the cut POSITIONS
  * (1-indexed, ascending, last element = n); empty input → empty array.
  */
object CdcChunksImpl {

  final val GearMul = 2654435761L
  final val Mod = 1L << 28 // window = 28 code points

  def cutPositions(text: UTF8String, minLen: Int, div: Int, maxLen: Int): ArrayData = {
    val cp = WinnowFingerprintsImpl.codePoints(text.getBytes)
    val n = cp.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val cuts = new Array[Long](n / minLen + 1)
    var m = 0
    var h = 0L
    var last = 0
    var t = 1
    while (t <= n) {
      h = ((h << 1) + (cp(t - 1).toLong * GearMul) % Mod) % Mod
      val len = t - last
      if ((len >= minLen && h % div == 0) || len >= maxLen) {
        cuts(m) = t; m += 1; last = t
      }
      t += 1
    }
    if (last < n) { cuts(m) = n; m += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(cuts, m))
  }
}

/** `cdc_chunks(text, minLen, div, maxLen) -> array<bigint>` of cut
  * positions (see [[CdcChunksImpl]]). min/div/max must be integer
  * literals; `1 ≤ minLen ≤ maxLen` and `div ≥ 1`.
  */
case class CdcChunks(child: Expression, minLen: Int, div: Int, maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(minLen >= 1 && maxLen >= minLen && div >= 1,
    "cdc_chunks needs 1 <= minLen <= maxLen and div >= 1")

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(t: Any): Any =
    CdcChunksImpl.cutPositions(t.asInstanceOf[UTF8String], minLen, div, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CdcChunksImpl.cutPositions($t, $minLen, $div, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  /** Column-API entry point. */
  def apply(text: Column, minLen: Int, div: Int, maxLen: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), minLen, div, maxLen))
}
