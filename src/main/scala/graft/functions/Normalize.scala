package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar kernel for Unicode normalization, called from both
  * interpreted eval and generated code.
  *
  * A text pipeline must normalize before hashing/shingling/deduping —
  * `é` (U+00E9) and `e`+U+0301 are byte-distinct, so un-normalized corpora
  * leak duplicates straight past exact AND MinHash dedup. Two fast paths
  * keep the common case nearly free at 100 TB:
  *  - pure-ASCII values (the overwhelming majority in web corpora) are
  *    returned as-is after one branch-predictable byte scan — no String
  *    materialisation, no allocation;
  *  - already-normalized non-ASCII values return the original UTF8String
  *    after `Normalizer.isNormalized` (a quick-check pass that usually
  *    answers without decomposing).
  */
object UnicodeNormalizeImpl {

  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) {
        val str = s.toString
        return if (Normalizer.isNormalized(str, form)) s
        else UTF8String.fromString(Normalizer.normalize(str, form))
      }
      i += 1
    }
    s
  }
}

/** `unicode_normalize(string[, form]) -> string`: UAX #15 normalization as a
  * native Catalyst expression (NFC default; NFD/NFKC/NFKD selectable).
  * Registered as `nfc_normalize` too — DuckDB's builtin name — so a
  * normalization step is one string valid in both engines.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private lazy val f: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes() = {
    require(
      Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unicode_normalize form must be one of NFC/NFD/NFKC/NFKD, got $form")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeImpl.normalize(input.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef =
      ctx.addReferenceObj("form", f, classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNormalizeImpl.normalize($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Column-API entry point; `form` ∈ NFC (default) / NFD / NFKC / NFKD. */
  def apply(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
