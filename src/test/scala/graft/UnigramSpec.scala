package graft

import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Specs for the unigram-LM tokenizer (operators/text/Unigram,
  * queries dx_unigram_train / dx_unigram_encode): the distributed trainer
  * is checked against an independent driver-side hard-EM reference
  * (classic array Viterbi — no shared code with the operator's
  * fold-expression DP), and the DP's canonical-path tie-break is pinned
  * against a brute-force enumeration of ALL segmentations.
  */
class UnigramSpec extends SparkSpec {
  import graft.operators.text.Unigram

  private val P = Unigram.maxPiece
  private val miss = Unigram.missingCost

  private def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** Independent reference Viterbi: ascending-j loop with strict `<` keeps
    * the SMALLEST boundary on ties — the operator's `array_min` over
    * `best·16 + j` encodes the same preference.
    */
  private def refSegment(w: String, costs: Map[String, Long]): List[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Long.MaxValue)
    val bp = Array.fill(n + 1)(0)
    best(0) = 0L
    for (i <- 1 to n; j <- math.max(0, i - P) until i) {
      val c = best(j) + costs.getOrElse(w.substring(j, i), miss)
      if (c < best(i)) { best(i) = c; bp(i) = j }
    }
    var i = n
    var out = List.empty[String]
    while (i > 0) { out = w.substring(bp(i), i) :: out; i = bp(i) }
    out
  }

  /** All legal segmentations (spans ≤ maxPiece) by boundary bitmask. */
  private def allSegmentations(w: String): Seq[List[String]] = {
    def go(from: Int): Seq[List[String]] =
      if (from == w.length) Seq(Nil)
      else for {
        to <- (from + 1) to math.min(w.length, from + P)
        rest <- go(to)
      } yield w.substring(from, to) :: rest
    go(0)
  }

  private def segCost(seg: List[String], costs: Map[String, Long]): Long =
    seg.map(p => costs.getOrElse(p, miss)).sum

  /** Word-frequency table exactly as the queries build it. */
  private def wordFreqs(): Map[String, Long] = {
    val wf = mutable.Map[String, Long]().withDefaultValue(0L)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().foreach { r =>
        r.getString(0).trim.split("\\s+")
          .filter(w => w.nonEmpty && w.length <= Unigram.maxWord)
          .foreach(w => wf(w) += 1L)
      }
    wf.toMap
  }

  /** Independent reference of the full two-round hard-EM recipe. */
  private def refTrain(wf: Map[String, Long])
      : (Seq[(String, Long, Long)], Map[String, Long]) = {
    val sub = mutable.Map[String, Long]().withDefaultValue(0L)
    wf.foreach { case (w, c) =>
      for (i <- 0 until w.length; l <- 1 to math.min(P, w.length - i))
        sub(w.substring(i, i + l)) += c
    }
    val chars = sub.filter(_._1.length == 1).toMap
    val multi = sub.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(Unigram.multiVocab)
    def costTable(fr: Map[String, Long]): Map[String, Long] = {
      val tot = fr.values.sum
      fr.map { case (p, f) => p -> (20L - bits(math.max(1L, 1000000L * f / tot))) }
    }
    def usageOf(c: Map[String, Long]): Map[String, Long] = {
      val u = mutable.Map[String, Long]().withDefaultValue(0L)
      wf.foreach { case (w, cnt) => refSegment(w, c).foreach(p => u(p) += cnt) }
      u.toMap
    }
    val c0 = costTable(chars ++ multi)
    val u1 = usageOf(c0)
    val v1 = chars.keys.toSeq ++
      multi.map(_._1).filter(p => u1.getOrElse(p, 0L) > 0L)
    val t1 = u1.values.sum
    val c1 = v1.map(p =>
      p -> (20L - bits(math.max(1L, 1000000L * u1.getOrElse(p, 0L) / t1)))).toMap
    val u2 = usageOf(c1)
    val t2 = u2.values.sum
    val rows = v1.sorted.map { p =>
      val u = u2.getOrElse(p, 0L)
      (p, u, 20L - bits(math.max(1L, 1000000L * u / t2)))
    }
    (rows, c1)
  }

  test("dx_unigram_train matches an independent driver-side hard-EM reference") {
    val (expected, _) = refTrain(wordFreqs())
    val got = Registry.byName("dx_unigram_train").fn(spark, sfDir)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === expected)
  }

  test("dx_unigram_encode matches per-doc reference segmentation counts") {
    val (_, c1) = refTrain(wordFreqs())
    val nPieces: Map[String, Long] =
      wordFreqs().keys.map(w => w -> refSegment(w, c1).size.toLong).toMap
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().toSeq.map { r =>
        val ws = r.getString(1).trim.split("\\s+")
          .filter(w => w.nonEmpty && nPieces.contains(w)).toSeq
        val np = ws.map(nPieces).sum
        val base = ws.map(_.length.toLong).sum
        (r.getLong(0), ws.size.toLong, np, base, 1000L * np / base)
      }.sortBy(_._1)
    val got = Registry.byName("dx_unigram_encode").fn(spark, sfDir)
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === expected)
  }

  test("canonical path equals the brute-force boundary-lexicographic minimum") {
    // adversarial table: overlapping pieces with deliberate cost ties so
    // several segmentations share the minimum
    val costs = Map(
      "a" -> 3L, "b" -> 3L, "ab" -> 6L, "ba" -> 6L, "aba" -> 9L,
      "bb" -> 5L, "abb" -> 8L, "c" -> 2L, "cc" -> 4L, "abc" -> 7L)
    for (w <- Seq("ababa", "abbbba", "ccc", "abcabc", "aaaa", "bacab")) {
      val segs = allSegmentations(w)
      val minCost = segs.map(segCost(_, costs)).min
      // canonical = among min-cost, the smallest piece-start sequence read
      // from the RIGHT (the DP picks the smallest backpointer at every
      // suffix, and optimal-substructure makes that recursion global)
      def keyOf(seg: List[String]): List[Int] = {
        val starts = seg.scanLeft(0)(_ + _.length).init
        starts.reverse
      }
      implicit val ord: Ordering[List[Int]] =
        scala.math.Ordering.Implicits.seqOrdering[List, Int]
      val canonical = segs.filter(segCost(_, costs) == minCost).minBy(keyOf)
      assert(refSegment(w, costs) === canonical, s"word $w")
    }
  }

  test("operator segmentation agrees with the reference and covers the word") {
    import spark.implicits._
    val costs = Map(
      "a" -> 3L, "b" -> 3L, "ab" -> 6L, "ba" -> 6L, "aba" -> 9L,
      "bb" -> 5L, "c" -> 2L, "xy" -> 1L, "x" -> 9L, "y" -> 9L, "xyxy" -> 1L)
    val words = Seq("ababa", "abbbba", "ccc", "xyxyxyxy", "bacab", "a",
      "yxyxy", "cabbax")
    val df = words.map(w => (w, 1L)).toDF("w", "cnt")
    val got = Unigram.segment(df, costs)
      .select("w", "pieces").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for (w <- words) {
      assert(got(w) === refSegment(w, costs), s"word $w")
      assert(got(w).mkString === w, s"coverage $w")
    }
  }
}
