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
  * The hash is `fold(h, b) = (h·131 + b) mod 1e9+7` over UTF-8 bytes with
  * the FIRST byte as the fold seed — exactly DuckDB's
  * `list_reduce(bytes, (h, b) -> (h * 131 + b) % 1000000007)`, so the
  * oracle can recompute identical fingerprints in portable integer SQL
  * (the prior formulation hashed each gram with md5: ~100× the per-gram
  * cost in block rounds plus a 32-char hex allocation, and the winnow
  * mins then compared strings instead of longs).
  *
  * Degenerate inputs follow the substring conventions of the md5
  * formulation: a text shorter than k yields one gram over its full
  * byte run; an empty text yields the single fingerprint 0.
  */
object WinnowFingerprintsImpl {

  private final val B = 131L
  private final val M = 1000000007L

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val b = text.getBytes
    val n = b.length
    val nGrams = math.max(n - k + 1, 1)
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val end = math.min(i + k, n)
      var h = 0L
      var t = i
      while (t < end) {
        val byte = (b(t) & 0xFF).toLong
        h = if (t == i) byte else (h * B + byte) % M
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
