package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native kernel for the PCA projection pass: for an `array<float>` vector
  * x, emit `array<bigint>` y with
  *
  *   y_r = CAST(round(10^6 · Σ_j rot_rj · (round(x_j·10^6)/10^6 − mean_j))
  *         AS BIGINT)
  *
  * — the exact arithmetic of the interpreted-HOF spelling in
  * [[graft.operators.embed.Pca.project]] (quantize to micros, center,
  * rotate, micro-round), with the same fold order (ascending j, double
  * accumulation from 0.0) and the same rounding (Spark's `round(double)`
  * compiles to `java.math.BigDecimal.valueOf(v).setScale(0, HALF_UP)`,
  * replicated verbatim here). The HOF spelling pays k·dim interpreted
  * lambda invocations plus two zip_with array allocations per row; this is
  * one fused loop nest per row with the rotation riding as a flat
  * `double[]` reference object.
  */
case class PcaProjectMicros(
    child: Expression, mean: Array[Double], rot: Array[Array[Double]])
    extends UnaryExpression {

  require(rot.forall(_.length == mean.length))
  private val k = rot.length
  private val dim = mean.length
  private val flat: Array[Double] = rot.flatten

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pca_project_micros"

  // The kernel reads elements via getFloat — on any other element type
  // UnsafeArrayData would silently misread the bytes (array<double> yields
  // wrong projections, not an error), so reject at analysis time.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val xc = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      val q = java.math.BigDecimal.valueOf(x.getFloat(j).toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      xc(j) = q / 1e6 - mean(j)
      j += 1
    }
    val y = new Array[Long](k)
    var r = 0
    while (r < k) {
      var acc = 0.0
      var c = 0
      while (c < dim) { acc += flat(r * dim + c) * xc(c); c += 1 }
      y(r) = java.math.BigDecimal.valueOf(1e6 * acc)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      r += 1
    }
    new GenericArrayData(y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
      val flatRef = ctx.addReferenceObj("pcaRot", flat, "double[]")
      val xc = ctx.freshName("xc")
      val y = ctx.freshName("y")
      val j = ctx.freshName("j")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val q = ctx.freshName("q")
      s"""
         |double[] $xc = new double[$dim];
         |for (int $j = 0; $j < $dim; $j++) {
         |  double $q = java.math.BigDecimal
         |    .valueOf(((double) $a.getFloat($j)) * 1e6)
         |    .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |  $xc[$j] = $q / 1e6 - $meanRef[$j];
         |}
         |long[] $y = new long[$k];
         |for (int $r = 0; $r < $k; $r++) {
         |  double $acc = 0.0;
         |  for (int $c = 0; $c < $dim; $c++) {
         |    $acc += $flatRef[$r * $dim + $c] * $xc[$c];
         |  }
         |  $y[$r] = (long) java.math.BigDecimal.valueOf(1e6 * $acc)
         |    .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($y);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcaProjectMicros {
  def apply(vec: Column, mean: Array[Double], rot: Array[Array[Double]]): Column =
    ColumnBridge.column(
      PcaProjectMicros(ColumnBridge.expression(vec), mean, rot))
}
