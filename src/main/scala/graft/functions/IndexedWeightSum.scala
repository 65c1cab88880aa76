package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Σ weights(index) over an `array<bigint>` of
  * indices — the per-doc exact-long margin of the hashed-feature linear
  * models (LR/mixture fits), where every doc carries its feature-bucket
  * array and the model rides along as a driver-side long[].
  *
  * The composable alternative — `aggregate(bks, 0L, (acc, b) ->
  * acc + element_at(wArr, b + 1))` — is a higher-order function: Spark
  * evaluates the lambda per element interpretively (measured ~0.2 s per GD
  * iteration on the proxy-fit corpus, the iteration's dominant term once
  * its shuffles were removed). This emits a tight fused loop instead; the
  * weights array travels as a codegen reference object, so 30 iterations
  * with 30 different models share ONE compiled class (the source text
  * never changes — no per-iteration Janino recompile).
  *
  * Long addition is exact and order-free, so the result is bit-identical
  * to the HOF and to the original groupBy-sum formulation.
  */
case class IndexedWeightSum(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "indexed_weight_sum"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = xs.getLong(i)
      if (b < 0L || b >= weights.length)
        throw IndexedWeightSum.badIndex(b, weights.length)
      acc += weights(b.toInt); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("iwsWeights", weights, "long[]")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $b = $a.getLong($i);
         |  if ($b < 0L || $b >= $w.length) {
         |    throw graft.functions.IndexedWeightSum.badIndex($b, $w.length);
         |  }
         |  $acc += $w[(int) $b];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IndexedWeightSum {
  /** Column-API entry point: Σ weights(i) for i in `indices` (bigint
    * array; every element must be a valid index into `weights`).
    */
  def apply(indices: Column, weights: Array[Long]): Column =
    ColumnBridge.column(
      IndexedWeightSum(ColumnBridge.expression(indices), weights))

  /** Diagnosable misuse failure (called from generated code too): an
    * out-of-range bucket dies with the index and bound in the message,
    * not a bare ArrayIndexOutOfBoundsException deep inside codegen.
    */
  def badIndex(b: Long, len: Int): ArrayIndexOutOfBoundsException =
    new ArrayIndexOutOfBoundsException(
      s"indexed_weight_sum: bucket $b outside [0, $len)")
}
