package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for MOSS winnowing fingerprint extraction (Schleimer,
  * Wilkerson & Aiken, SIGMOD 2003): hash every k-gram with a Karp–Rabin
  * polynomial, slide a w-window over the hash stream, keep each window's
  * minimum, return the distinct minima.
  *
  * The hash is `fold(h, c) = (h·131 + c) mod 1e9+7` over Unicode CODE
  * POINTS at CHARACTER positions, with the FIRST code point as the fold
  * seed — exactly DuckDB's
  * `list_reduce(list_transform(range(i, i+k), t -> ord(substr(text, t, 1))),
  *              (h, c) -> (h * 131 + c) % 1000000007)`
  * (`substr` is character-indexed and `ord` yields the full code point),
  * so the oracle recomputes identical fingerprints in portable integer
  * SQL on ANY input, not just ASCII. (The r12 formulation folded UTF-8
  * bytes — identical on ASCII, divergent in both gram boundaries and
  * hash values on any multi-byte character; r12 ADVICE.) Code points are
  * decoded once per document straight from the UTF-8 bytes — no
  * String/UTF-16 round trip. The earlier md5-per-gram formulation is
  * gone for cost reasons (see git history).
  *
  * Degenerate inputs follow the substring conventions of the md5
  * formulation: a text shorter than k yields one gram over its full
  * run; an empty text yields the single fingerprint 0 (the oracle twin
  * guards this case explicitly — DuckDB's `list_reduce` of an empty
  * list raises).
  */
object WinnowFingerprintsImpl {

  private final val B = 131L
  private final val M = 1000000007L

  /** Decode UTF-8 bytes to an array of Unicode code points. Malformed
    * sequences follow the permissive convention of treating each
    * unexpected byte as its own code point (the corpus is valid UTF-8 —
    * Spark's UTF8String guarantees it — so this branch never fires on
    * real data; it just keeps the kernel total).
    */
  private[functions] def codePoints(b: Array[Byte]): Array[Int] = {
    val n = b.length
    val out = new Array[Int](n) // upper bound: one cp per byte
    var i = 0
    var m = 0
    while (i < n) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) { out(m) = b0; i += 1 }
      else if (b0 < 0xE0 && i + 1 < n) {
        out(m) = ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F); i += 2
      } else if (b0 < 0xF0 && i + 2 < n) {
        out(m) = ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F); i += 3
      } else if (i + 3 < n) {
        out(m) = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F); i += 4
      } else { out(m) = b0; i += 1 }
      m += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cp = codePoints(text.getBytes)
    val n = cp.length
    val nGrams = math.max(n - k + 1, 1)
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val end = math.min(i + k, n)
      var h = 0L
      var t = i
      while (t < end) {
        val c = cp(t).toLong
        h = if (t == i) c else (h * B + c) % M
        t += 1
      }
      hs(i) = h
      i += 1
    }
    val nWin = math.max(nGrams - w + 1, 1)
    val seen = new java.util.LinkedHashSet[Long]()
    var j = 0
    while (j < nWin) {
      var mn = hs(j)
      var t = j + 1
      val end = math.min(j + w, nGrams)
      while (t < end) { if (hs(t) < mn) mn = hs(t); t += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_fingerprints(text, k, w) -> array<bigint>`: one-pass native
  * winnowing — k-gram Karp–Rabin hashes, w-window minima, distinct. Runs
  * the whole extraction in a single codegen'd kernel call instead of the
  * nested higher-order transform/slice/array_min lambdas it replaces
  * (interpreted, per-position md5 + slice allocations).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow_fingerprints needs k >= 1 and w >= 1")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(t: Any): Any =
    WinnowFingerprintsImpl.fingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowFingerprintsImpl.fingerprints($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Column-API entry point. */
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
}
