package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: `|A ∩ B|` of two ASCENDING-sorted
  * `array<bigint>` sets, by linear merge — the inner kernel of
  * compact-forward triangle counting (Latapy, TCS 2008), where it runs
  * once per oriented edge over the two endpoints' out-adjacency arrays.
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a hash
  * set and materialises the intersection ARRAY per call, interpretively —
  * at ~10⁹ adjacency elements per sf1 graph pass that constant dominates
  * the whole query. This is a fused two-pointer scan emitting nothing but
  * a counter: no allocation, whole-stage codegen, ~1 ns/element.
  *
  * Contract: both inputs sorted ascending with distinct elements (what
  * `sort_array(collect_list(...))` over distinct edges produces). On
  * unsorted input the result is undefined (it stays a valid lower bound
  * of the true intersection but nothing more) — sortedness is NOT checked
  * here, per-row validation would cost as much as the merge.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  // SQL-registered, so analysis must coerce or reject: without this,
  // `sorted_intersect_count(array(1, 2), array(2, 3))` (default INT
  // literals) passes analysis and `getLong` reads misaligned 4-byte slots
  // as garbage longs in both eval paths (r12 ADVICE). With it, analysis
  // inserts an array<int> → array<bigint> cast.
  // (declared as Seq[DataType] — covariant refinement of the trait's
  // Seq[AbstractDataType], whose type name is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everything: fixed locals collide when the expression is
      // fused twice into one codegen function (see CosineSimilarity).
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
