package graft

import graft.operators.text.C4Rules
import org.apache.spark.sql.Row

/** Specs for the C4 cleaning rules over handcrafted line arrays, checked
  * against an independent driver-side reference of the same contract.
  */
class C4RulesSpec extends SparkSpec {

  private case class Ref(nKept: Long, dropJs: Long, dropNopunct: Long,
    dropShort: Long, keep: Boolean, reason: String, cleaned: Option[String])

  private def ref(lines: Seq[String]): Ref = {
    val js = lines.filter(_.contains("javascript"))
    val nonJs = lines.filterNot(_.contains("javascript"))
    val punct = nonJs.filter(l => l.nonEmpty && ".!?\"".contains(l.last))
    val nopunct = nonJs.size - punct.size
    val kept = punct.filter(_.split(" ", -1).length >= C4Rules.minWords)
    val short = punct.size - kept.size
    val lorem = lines.exists(_.contains("lorem ipsum"))
    val brace = lines.exists(_.contains("{"))
    val keep = !lorem && !brace && kept.size >= C4Rules.minSentences
    val reason =
      if (lorem) "lorem_ipsum"
      else if (brace) "brace"
      else if (kept.size < C4Rules.minSentences) "too_few_sentences"
      else ""
    Ref(kept.size.toLong, js.size.toLong, nopunct.toLong, short.toLong,
      keep, reason, if (keep) Some(kept.mkString("\n")) else None)
  }

  private val good = (1 to 6).map(i => s"a good sentence number $i.")
  private val docs: Seq[Seq[String]] = Seq(
    good,                                             // clean keep
    good :+ "enable javascript to continue.",         // js line dropped, page kept
    good :+ "no terminal punctuation here",           // nopunct counted
    good :+ "too short.",                             // short counted (2 words)
    good :+ "contains lorem ipsum dolor.",            // page dropped: lorem
    good :+ "code block { inside }.",                 // page dropped: brace
    good.take(4),                                     // page dropped: too few
    Seq("ends with quote \"", "x.", "y!", "z?"),      // punct variants + shorts
    Seq.empty,                                        // empty page
    // precedence: a javascript line that is ALSO unpunctuated and short
    // counts only under drop_js
    good :+ "javascript",
    // lorem beats brace beats too-few in the reason
    Seq("lorem ipsum { x."))

  test("rules match the independent reference on handcrafted pages") {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (ls, i) => (i.toLong, ls) }
      .toDF("doc_id", "lines")
    val got = C4Rules(df)
      .selectExpr("doc_id", "n_kept", "drop_js", "drop_nopunct", "drop_short",
        "doc_keep", "drop_reason", "cleaned_md5", "array_join(kept, '\\n')")
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.zipWithIndex.foreach { case (ls, i) =>
      val e = ref(ls)
      val r: Row = got(i.toLong)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((e.nKept, e.dropJs, e.dropNopunct, e.dropShort)), s"counters doc $i: $ls")
      assert(r.getBoolean(5) === e.keep, s"keep doc $i")
      assert(r.getString(6) === e.reason, s"reason doc $i")
      assert(Option(r.getString(7)).isDefined === e.cleaned.isDefined, s"md5 doc $i")
      e.cleaned.foreach(c => assert(r.getString(8) === c, s"cleaned doc $i"))
    }
  }

  test("drop counters partition the dropped lines") {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (ls, i) => (i.toLong, ls) }
      .toDF("doc_id", "lines")
    C4Rules(df)
      .selectExpr("size(lines)", "n_kept", "drop_js", "drop_nopunct", "drop_short")
      .collect().foreach { r =>
        assert(r.getInt(0).toLong ===
          r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4))
      }
  }
}
