package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for cosine similarity over `array<float>`
  * columns, with whole-stage codegen.
  *
  * The composable alternative (`aggregate(zip_with(...))`) is a higher-order
  * function: Spark evaluates the lambda per element interpretively and the
  * surrounding operator falls out of whole-stage codegen. This expression
  * emits a tight fused Java loop instead — the difference is large on
  * billion-vector ANN sweeps. Accumulation order (sequential, ascending
  * index, double precision) matches the HOF formulation and the DuckDB
  * `list_reduce` oracle bit-for-bit.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  // Inputs must be array<float>; enforced by usage (ExpectsInputTypes /
  // AbstractDataType are private[sql] in Spark 4).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    // zero-norm guard: 0/0 = NaN sorts GREATEST under Spark's total order,
    // which would rank a degenerate vector above every real neighbor in
    // descending top-k — define cosine against the zero vector as 0.0.
    // (No zero-norm vectors exist in the oracle-matched corpora —
    // dx_embedding_qc pins n_zero — so the DuckDB twins are unaffected.)
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // All locals via ctx.freshName: fixed names collide when the
      // expression is fused more than once into a single codegen function,
      // janino rejects the class, and Spark falls back to interpreted eval.
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private val info = new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim")

  private val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects 2 arguments, got ${other.size}")
  }

  /** Session-local registration so `expr("cosine_sim(a, b)")` / SQL works. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", builder, "built-in")
}

/** SparkSessionExtensions hook: enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` to get graft's
  * native functions in every session (including pure-SQL users):
  * `cosine_sim(a, b)`, `minhash_signature(hashes, k)`,
  * `simhash64(hashes)`, `interleave_bits(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  private def intLiteral(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      { exprs: Seq[Expression] => CosineSimilarity(exprs(0), exprs(1)) }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      { exprs: Seq[Expression] =>
        MinHashSignature(exprs(0), intLiteral(exprs(1), "minhash_signature k")) }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      { exprs: Seq[Expression] => SimHash64(exprs(0)) }),
    (FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      { exprs: Seq[Expression] => InterleaveBits(exprs(0), exprs(1)) }),
    // named exactly like DuckDB's builtin so comparison-level conditions are
    // one string valid in both engines
    (FunctionIdentifier("jaro_winkler_similarity"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler_similarity"),
      { exprs: Seq[Expression] => JaroWinklerSimilarity(exprs(0), exprs(1)) }),
    (FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
      { exprs: Seq[Expression] => DamerauLevenshtein(exprs(0), exprs(1)) }),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      { exprs: Seq[Expression] => SortedIntersectCount(exprs(0), exprs(1)) }),
    (FunctionIdentifier("sorted_intersect_values"),
      new ExpressionInfo(classOf[SortedIntersectValues].getName, "sorted_intersect_values"),
      { exprs: Seq[Expression] => SortedIntersectValues(exprs(0), exprs(1)) }),
    (FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      { exprs: Seq[Expression] => CdcChunks(exprs(0),
        intLiteral(exprs(1), "cdc_chunks minLen"),
        intLiteral(exprs(2), "cdc_chunks div"),
        intLiteral(exprs(3), "cdc_chunks maxLen")) }),
    // DuckDB-compatible NFC normalization, plus the general form-selectable
    // variant (unicode_normalize(s, 'NFKC') etc.)
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "nfc_normalize"),
      { exprs: Seq[Expression] => UnicodeNormalize(exprs(0), "NFC") }),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      { exprs: Seq[Expression] =>
        val form =
          if (exprs.length < 2) "NFC"
          else exprs(1).eval() match {
            case s: UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"unicode_normalize form must be a string literal, got $other")
          }
        UnicodeNormalize(exprs(0), form) }))

  /** Session-local registration of every graft native function. Idempotent:
    * re-registering an existing name would WARN ("replaced a previously
    * registered function") on every call site, polluting bench logs.
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
