package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: `A ∩ B` (the ELEMENTS, ascending) of two
  * ASCENDING-sorted `array<bigint>` sets by linear merge — the sibling of
  * [[SortedIntersectCount]] for the operators that need the intersection
  * members, not just the size (per-node triangle crediting in
  * `GraphMetrics.localClustering`: each common out-neighbor w of an
  * oriented edge u→v is the third corner of one triangle and takes one
  * credit).
  *
  * Why not `array_intersect(a, b)`: ArrayIntersect hashes one side and
  * probes interpretively, allocating set + builder per call; on sorted
  * inputs a fused two-pointer merge into one exactly-sized buffer does
  * the same work allocation-lean inside whole-stage codegen. Output order
  * is ascending (inherited from the inputs), so downstream `transform`/
  * `explode` see a deterministic sequence.
  *
  * Contract: both inputs sorted ascending with distinct elements — same
  * as [[SortedIntersectCount]], and like there, sortedness is NOT checked
  * (validation would cost as much as the merge).
  */
case class SortedIntersectValues(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect_values"

  // SQL-registered: coerce default-INT array literals to bigint (the same
  // misaligned-getLong hazard the count kernel documents).
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val buf = new Array[Long](math.min(nx, ny))
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { buf(c) = xv; c += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val buf = ctx.freshName("buf")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |long[] $buf = new long[$nx < $ny ? $nx : $ny];
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $buf[$c++] = $xv; $i++; $j++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectValues {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectValues(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
