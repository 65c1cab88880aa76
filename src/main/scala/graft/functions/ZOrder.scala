package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit Morton (Z-order) code of two dimension keys, as a native
  * codegen'd expression.
  *
  * Sorting a table by the interleaved bits of two filter dimensions gives
  * every output file a tight bounding box in BOTH dimensions, so parquet
  * min/max stats prune files for predicates on either dimension — the
  * multi-dimensional clustering trick behind Delta/Iceberg `ZORDER BY`,
  * here as a plain expression usable with `repartitionByRange` +
  * `sortWithinPartitions` (see [[graft.operators.Layout]]).
  *
  * Inputs are the LOW 32 bits of each key, interpreted unsigned — callers
  * bucket/rank wider domains first (rank-then-interleave is also how the
  * lakehouse engines do it; interleaving raw 64-bit skewed keys wastes the
  * high bits). Null-intolerant: a null key yields a null code.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    InterleaveBits.morton(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static call: no per-row allocation, stays inside whole-stage codegen
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.InterleaveBits.morton($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 32 bits of `v` to the even bit positions of a long. */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: bits of `a` on even positions, `b` on odd. Public and
    * stable — the generated code calls it statically.
    */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Upper-bound binary search of a value into a sorted cut-point array:
  * returns the number of cuts <= value, i.e. the rank bucket in
  * [0, cuts.length]. The cuts ride into generated code as a shared
  * `double[]` reference object; the search is a static call, so the whole
  * bucketing stays inside whole-stage codegen at O(log buckets) per row.
  */
case class SearchedBucket(child: Expression, cuts: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "searched_bucket"
  override def nullIntolerant: Boolean = true

  private lazy val cutsArr: Array[Double] = cuts.toArray

  override def nullSafeEval(v: Any): Any =
    SearchedBucket.bucketOf(v.asInstanceOf[Double], cutsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cutsArr, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SearchedBucket.bucketOf($v, $cutsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SearchedBucket {
  /** First index whose cut exceeds `v` (upper bound) — deterministic under
    * repeated cut points, unlike a raw `Arrays.binarySearch`. Public and
    * stable: generated code calls it statically.
    */
  def bucketOf(v: Double, cuts: Array[Double]): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

object ZOrder {
  def interleave(a: Column, b: Column): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))

  def searchedBucket(c: Column, cuts: Array[Double]): Column =
    ColumnBridge.column(SearchedBucket(
      ColumnBridge.expression(c.cast("double")), cuts.toSeq))
}
