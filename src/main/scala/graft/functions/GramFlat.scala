package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native kernel for the PCA sufficient-statistics pass: from a
  * micro-quantized `array<bigint>` vector x of length `dim`, emit the flat
  * array of per-row Gram/linear products in the fixed canonical order
  *
  *   for i in 0..dim−1: [ x_i, x_i·x_i, x_i·x_{i+1}, …, x_i·x_{dim−1} ]
  *
  * (length dim·(dim+3)/2) — exactly the products the interpreted
  * `flatten(transform(sequence(...), i -> … struct(i, j, p) …))` spelling
  * produced, minus the struct boxing and the per-element lambda
  * interpretation (measured: the HOF spelling costs ~20 CPU-s per
  * sufficient-statistics pass at 2 k×64; this loop is ~milliseconds).
  * [[graft.operators.embed.Pca.sums]] posexplodes the array and maps
  * positions back to (i, j) on the driver. All arithmetic is exact long
  * multiplies of already-quantized integers — bit-identical to the HOF.
  */
case class GramFlat(child: Expression, dim: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_flat"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val out = new Array[Long](dim * (dim + 3) / 2)
    var pos = 0
    var i = 0
    while (i < dim) {
      val xi = x.getLong(i)
      out(pos) = xi; pos += 1
      var j = i
      while (j < dim) { out(pos) = xi * x.getLong(j); pos += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      s"""
         |long[] $out = new long[${dim * (dim + 3) / 2}];
         |int $pos = 0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  long $xi = $a.getLong($i);
         |  $out[$pos++] = $xi;
         |  for (int $j = $i; $j < $dim; $j++) {
         |    $out[$pos++] = $xi * $a.getLong($j);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramFlat {
  def apply(vec: Column, dim: Int): Column =
    ColumnBridge.column(GramFlat(ColumnBridge.expression(vec), dim))
}
