package graft

import org.apache.spark.sql.functions._

/** Specs for the WordPiece greedy encoder (operators/text/WordPiece,
  * queries dx_wordpiece / dx_wordpiece_usage): the fold-expression walk is
  * checked against an independent driver-side greedy reference over the
  * real corpus vocabulary, max-munch semantics are pinned on adversarial
  * hand vocabularies (including the classic case where greedy emits MORE
  * pieces than optimal), and the census queries' identities are asserted.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.text.{Unigram, WordPiece}

  private val P = Unigram.maxPiece

  /** Independent reference greedy walk: longest vocab match first, raw
    * single-char fallback, ## on continuations.
    */
  private def refGreedy(w: String, vocab: Set[String]): List[String] = {
    var pos = 0
    var out = List.newBuilder[String]
    while (pos < w.length) {
      val m = (math.min(P, w.length - pos) to 2 by -1)
        .find(m => vocab.contains(w.substring(pos, pos + m)))
        .getOrElse(1)
      out += (if (pos == 0) "" else "##") + w.substring(pos, pos + m)
      pos += m
    }
    out.result()
  }

  private def corpusWf = Tables(spark, sfDir, "documents")
    .select(explode(expr("split(trim(text), '\\\\s+')")).as("w"))
    .filter(length(col("w")) <= Unigram.maxWord)
    .groupBy("w").agg(count(lit(1)).as("cnt"))

  test("segment matches the driver-side greedy reference on the corpus") {
    val wf = corpusWf
    val vocab = WordPiece.vocab(wf)
    val got = WordPiece.segment(wf, vocab)
      .select("w", "pieces").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got.nonEmpty)
    val vs = vocab.toSet
    got.foreach { case (w, pieces) =>
      assert(pieces == refGreedy(w, vs), s"word '$w'")
    }
  }

  test("max-munch semantics on adversarial hand vocabularies") {
    def seg(w: String, vocab: Seq[String]): List[String] =
      WordPiece.segment(Seq((w, 1L)).toDF("w", "cnt"), vocab)
        .head().getSeq[String](2).toList
    // longest match wins over any shorter decomposition
    assert(seg("abab", Seq("a", "b", "ab", "abab")) == List("abab"))
    assert(seg("abab", Seq("a", "b", "ab")) == List("ab", "##ab"))
    // the classic greedy-vs-optimal case: greedy takes 'ab' and strands
    // 'c' even though a | bc is also two pieces — and for 'abcd' greedy's
    // ab|c|d (3) loses to optimal a|bcd... greedy is max-munch BY CONTRACT
    assert(seg("abc", Seq("a", "b", "c", "ab", "bc")) == List("ab", "##c"))
    assert(seg("abcd", Seq("a", "b", "c", "d", "ab", "bcd")) ==
      List("ab", "##c", "##d"))
    // single-char fallback keeps the walk total even mid-word
    assert(seg("axb", Seq("a", "x", "b", "ax")) == List("ax", "##b"))
  }

  test("pieces reassemble the word and live in the vocabulary") {
    val wf = corpusWf
    val vocab = WordPiece.vocab(wf).toSet
    val seg = WordPiece.segment(wf, vocab.toSeq)
    // the ## prefix marks position 1-onward BY CONSTRUCTION, so strip it
    // positionally (a corpus word could itself start with '#')
    val bad = seg.select(col("w"), col("pieces"))
      .withColumn("rebuilt", expr(
        """concat(element_at(pieces, 1), concat_ws('',
          |  transform(slice(pieces, 2, size(pieces) - 1),
          |    p -> substring(p, 3))))""".stripMargin))
      .filter(col("rebuilt") =!= col("w"))
    assert(bad.isEmpty)
    val pieceRows = seg
      .select(posexplode(col("pieces")).as(Seq("k", "p")))
      .select(when(col("k") === 0, col("p"))
        .otherwise(expr("substring(p, 3)")).as("raw"))
      .distinct().collect().map(_.getString(0))
    assert(pieceRows.nonEmpty && pieceRows.forall(vocab.contains))
  }

  test("census identities: fertility floor and usage mass conservation") {
    val census = Registry.byName("dx_wordpiece").fn(spark, sfDir)
    // at least one piece per word, so fertility ≥ 1000; pieces never exceed
    // chars, so compression ≤ 1000
    assert(census.filter(col("fertility_permille") < 1000).isEmpty)
    assert(census.filter(col("n_pieces") > col("n_base_chars")).isEmpty)
    val totalPieces = census.agg(sum("n_pieces")).head().getLong(0)
    val usage = Registry.byName("dx_wordpiece_usage").fn(spark, sfDir)
    val usageMass = usage.agg(sum("n_uses")).head().getLong(0)
    assert(totalPieces == usageMass,
      "piece mass must agree between the census and the usage table")
  }
}
