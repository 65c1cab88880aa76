package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dense matrix–vector product `y = M·x` over an `array<float>` column, as
  * a native codegen'd expression — the OPQ/PCA rotation kernel.
  *
  * The interpreted-HOF spelling (`transform(M, row -> aggregate(zip_with(
  * row, x, ...)))`) pays a lambda invocation per multiply — rows·dim²
  * closures on the hot path. Here the matrix rides along as one flat
  * `double[]` reference object (broadcast with the serialized plan, like
  * [[NearestCentroids]]), and the product is a fused two-loop per row
  * inside whole-stage codegen: no row explosion, no shuffle, no
  * allocation beyond the output array.
  *
  * Accumulation is double, in ascending-index order (the same fold order
  * as the HOF spelling), cast to float per component on the way out.
  * Inputs shorter than the matrix width contribute their prefix (callers
  * filter on `size() = dim`, as [[graft.operators.ann.Opq.rotate]] does).
  */
case class MatVecFloat(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty && matrix.forall(_.length == matrix.head.length))
  private val rows = matrix.length
  private val dim = matrix.head.length
  private val flat: Array[Double] = matrix.flatten.toArray

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val len = math.min(dim, x.numElements())
    val y = new Array[Float](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      var j = 0
      while (j < len) { acc += flat(r * dim + j) * x.getFloat(j); j += 1 }
      y(r) = acc.toFloat
      r += 1
    }
    new GenericArrayData(y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("matVecFlat", flat, "double[]")
      val len = ctx.freshName("len")
      val y = ctx.freshName("y")
      val r = ctx.freshName("r")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |int $len = Math.min($dim, $a.numElements());
         |float[] $y = new float[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $len; $j++) {
         |    $acc += $flatRef[$r * $dim + $j] * (double) $a.getFloat($j);
         |  }
         |  $y[$r] = (float) $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($y);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVec {
  def apply(vec: Column, matrix: Seq[Seq[Double]]): Column =
    ColumnBridge.column(MatVecFloat(ColumnBridge.expression(vec), matrix))
}
