package graft

import graft.operators.text.HtmlExtract

/** Specs for the HTML main-content extractor: adversarial documents
  * against an independent driver-side regex reference.
  */
class HtmlExtractSpec extends SparkSpec {

  /** Independent reference: same contract, classic Scala regex code. */
  private def refExtract(html: String): (Long, Long, String) = {
    val noCode = html
      .replaceAll("<script[^>]*>.*?</script>", "")
      .replaceAll("<style[^>]*>.*?</style>", "")
    val bs = "<p[^>]*>(.*?)</p>".r.findAllMatchIn(noCode).map(_.group(1)).toList
    val stripped = bs.map(b =>
      b.replaceAll("<[^>]*>", " ").replaceAll(" +", " ").trim)
    val anchors = bs.map(b =>
      "<a[^>]*>(.*?)</a>".r.findAllMatchIn(b).map(_.group(1)).mkString)
    val kept = stripped.zip(anchors).filter { case (t, a) =>
      1000L * a.length <= HtmlExtract.maxLinkPermille * math.max(1, t.length) &&
        t.split(" ", -1).length >= HtmlExtract.minWords
    }
    (bs.size.toLong, kept.size.toLong, kept.map(_._1).mkString("\n"))
  }

  private val docs = Seq(
    // plain prose: kept
    "<html><body><p>alpha beta gamma delta</p></body></html>",
    // too short: dropped
    "<p>one two</p>",
    // pure nav: anchor density ~0.82 — dropped
    """<p><a href="/x">aaa</a> <a href="/y">bbb</a> <a href="/z">ccc</a></p>""",
    // mixed block under the threshold: kept, links preserved in text
    """<p>plain words here and <a href="/t">linked</a> tail words</p>""",
    // script body contains a fake paragraph AND a bare `<` — must not leak
    """<html><head><script>if (a<b) { x('<p>fake fake fake</p>'); }</script>
      |<style>p { color: red; }</style></head>
      |<body><p>real content survives here</p></body></html>""".stripMargin
      .replace("\n", ""),
    // empty result: everything dropped
    """<p>hi</p><p><a href="/q">qqqq qqqq qqqq</a></p>""",
    // threshold boundary: anchor 34 chars, visible text exactly 100 chars
    // (34 + 1 + 65) → 1000·34 ≤ 340·100 holds with equality — kept
    s"""<p><a href="/b">${"x" * 34}</a> ${"y" * 21} ${"y" * 21} ${"y" * 21}</p>""",
    // one past the boundary: anchor 35 of 101 — dropped
    s"""<p><a href="/b">${"x" * 35}</a> ${"y" * 21} ${"y" * 21} ${"y" * 21}</p>""")

  test("extractor matches the independent reference on adversarial HTML") {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    val got = HtmlExtract.extract(df, "html")
      .select("id", "n_blocks", "n_kept", "main_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    docs.zipWithIndex.foreach { case (h, i) =>
      assert(got(i.toLong) === refExtract(h), s"doc $i: $h")
    }
  }

  test("threshold and script-stripping behave as designed") {
    val (_, keptBoundary, _) = refExtract(docs(6))
    val (_, keptPast, _) = refExtract(docs(7))
    assert(keptBoundary === 1L && keptPast === 0L)
    val (blocks, kept, main) = refExtract(docs(4))
    assert(blocks === 1L && kept === 1L && main === "real content survives here")
    assert(refExtract(docs(5))._3 === "")
  }
}
