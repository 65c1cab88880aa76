package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar kernel for FULL (unrestricted) Damerau–Levenshtein
  * distance, called from both interpreted eval and generated code.
  *
  * Semantics are pinned to DuckDB's `damerau_levenshtein` (the oracle
  * engine):
  *  - operates on **UTF-8 bytes**, not code points (DuckDB:
  *    `damerau_levenshtein('éa','ea') = 2` — the accented byte pair costs
  *    two edits);
  *  - FULL variant, not OSA: a transposition may bridge edits between its
  *    two characters (`'CA' → 'ABC'` costs 2, where the
  *    optimal-string-alignment restriction would say 3), via the
  *    last-occurrence table of the Lowrance–Wagner algorithm;
  *  - cost 1 for each of insert / delete / substitute / adjacent-swap.
  */
object DamerauLevenshteinImpl {

  def distance(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    // Lowrance–Wagner DP with a 256-entry last-occurrence table (byte
    // alphabet). Matrix is (la+2)×(lb+2), row-flattened; strings here are
    // comparison-level fields (names, codes), so the quadratic scratch is
    // a few KB and thread-local per row.
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    val inf = la + lb
    val da = new Array[Int](256)
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(y(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (x(i - 1) == y(j - 1)) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trn = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trn < m) m = trn
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da(x(i - 1) & 0xFF) = i
      i += 1
    }
    d((la + 1) * w + lb + 1).toLong
  }
}

/** `damerau_levenshtein(string, string) -> bigint` as a native Catalyst
  * expression: the edit-distance comparator that also charges adjacent
  * transpositions one edit — the standard choice for typo-shaped name
  * fields where `teh → the` should score as one slip, next to
  * `levenshtein` (insert/delete-shaped) and `jaro_winkler_similarity`
  * (prefix-weighted) in splink-style comparison ladders (reference:
  * src/matchbox/client/models/linkers/splinklinker.py:112). Static-call
  * kernel keeps the expression inside whole-stage codegen.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"

  // SQL-registered: make analysis coerce non-string inputs (or fail
  // loudly) instead of letting a mistyped call reach the UTF8String cast.
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinImpl.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshteinImpl.distance($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DamerauLevenshtein(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
