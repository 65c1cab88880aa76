package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** A loop-varying scalar carried as a codegen REFERENCE OBJECT instead of
  * an inline literal, so iterative operators that re-plan the same stage
  * with a new scalar each round (NN-Descent's per-round reverse-sample
  * salt, the LR fit's per-iteration bias) produce IDENTICAL generated
  * source every round and the codegen cache hits instead of paying a fresh
  * Janino compile + JIT warm-up per round.
  *
  * A plain `lit(v)` — or any foldable spelling of it, e.g.
  * `element_at(lit(Array(v)), 1)`, which Catalyst constant-folds back to
  * `lit(v)` before codegen — inlines the value into the source text.
  * `foldable = false` here keeps ConstantFolding away, and the value rides
  * in the `references` array exactly like [[IndexedWeightSum]]'s weights,
  * so only the reference slot's CONTENT differs between rounds, never the
  * class text. Evaluation semantics are identical to the literal (same
  * value, same data type — IntegerType inputs to hash functions must stay
  * IntegerType, or the hash changes).
  */
case class ScalarRef(value: Long, dataType: DataType) extends LeafExpression {
  require(dataType == LongType || dataType == IntegerType,
    s"ScalarRef carries int/long scalars, got ${dataType.catalogString}")

  override def foldable: Boolean = false
  override def nullable: Boolean = false
  override def prettyName: String = "scalar_ref"

  override def eval(input: InternalRow): Any = dataType match {
    case IntegerType => value.toInt
    case _ => value
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scalarRef", Array(value), "long[]")
    val jt = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"final $jt ${ev.value} = ($jt) $ref[0];",
      isNull = FalseLiteral)
  }
}

object ScalarRef {
  /** An IntegerType scalar reference (hash-function inputs keep their
    * 4-byte hashing semantics).
    */
  def int(v: Int): Column = ColumnBridge.column(ScalarRef(v.toLong, IntegerType))

  /** A LongType scalar reference. */
  def long(v: Long): Column = ColumnBridge.column(ScalarRef(v, LongType))
}
