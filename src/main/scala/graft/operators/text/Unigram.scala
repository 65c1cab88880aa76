package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece `--model_type=unigram` family), distributed the way the
  * BPE trainer already is (queries/Selection.scala): the corpus collapses
  * ONCE to a word-frequency table, and every training pass is a map over
  * the distinct-word VOCABULARY plus one piece-domain aggregate.
  *
  * Exactness discipline: instead of float log-likelihoods, piece scores
  * are integer bit-costs — `cost(p) = 20 − floor_log2_bits(ppm(p))` with
  * `ppm = max(1, (10^6·freq) div total)` and `bits(x) = length(bin(x))`
  * (the same libm-free footing as the DSIR selector), and the E-step is
  * hard-EM: each word takes its single VITERBI segmentation (min total
  * cost; ties prefer the longest final piece, i.e. the smallest
  * boundary). Everything is integer min-plus, so the DuckDB oracle
  * replays training bit-for-bit as unrolled DP CTEs.
  *
  * Scale shape (the 100 TB story): the corpus is touched exactly once
  * (word-frequency collapse); substring seeding, both Viterbi passes and
  * the usage counts all run over the distinct-word frame; the only
  * driver state is the piece vocabulary (≤ `chars + multiVocab` entries
  * — the same bounded object a SentencePiece trainer holds). Encoding
  * joins the corpus token stream against the vocabulary-sized
  * word→n_pieces frame (AQE broadcasts it) — no per-document DP replay.
  */
object Unigram {

  /** Longest candidate piece. */
  val maxPiece = 4

  /** DP horizon: words longer than this are excluded from the query's
    * contract on BOTH engines (the oracle unrolls the DP to this length;
    * at real scale you raise the constant, not the algorithm).
    */
  val maxWord = 10

  /** Multi-char seed pieces kept besides the (always-kept) single chars. */
  val multiVocab = 24

  /** Cost of a substring absent from the vocabulary — any path through it
    * loses to the always-available single-char path (≤ 19/piece), but the
    * arithmetic stays finite and total.
    */
  val missingCost = 999L

  /** bits(x) = length(bin(x)) for x ≥ 1 — floor(log2 x) + 1. */
  def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** Integer bit-cost table from a frequency table: 20 − bits(ppm), ppm
    * clamped to ≥ 1 (add-one-ish smoothing; 20 = bits(10^6)).
    */
  def costs(freqs: Map[String, Long]): Map[String, Long] = {
    val total = freqs.valuesIterator.sum
    require(total > 0L, "unigram cost table needs a non-empty corpus")
    freqs.map { case (p, f) =>
      p -> (20L - bits(math.max(1L, (1000000L * f) / total)))
    }
  }

  /** All substrings of length 1..maxPiece of every distinct word, weighted
    * by word frequency — the seed-candidate mass. One aggregate over the
    * piece domain (≤ Σ|w|·maxPiece candidates per word).
    */
  def substringFreqs(wf: DataFrame): DataFrame =
    wf.select(explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(i, least(length(w), i + ${maxPiece - 1})),
           |    j -> substring(w, i, j - i + 1))))""".stripMargin)).as("piece"),
        col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("freq"))

  /** Viterbi-segment each word of a (w, cnt) frame under an integer cost
    * table; adds `pieces: array<string>`.
    *
    * The DP array holds combined values `best·16 + backpointer` (maxWord
    * < 16 keeps the backpointer in the low nibble; best ≤ maxWord·999 so
    * the product stays far from overflow): `array_min` then yields
    * min-cost with ties broken toward the SMALLEST boundary j — the
    * longest final piece, SentencePiece's own preference. The path
    * fold walks backpointers from the end; both folds are native
    * higher-order expressions — per-row pure functions of (w, cost
    * table), so the segmentation is deterministic on any partitioning.
    */
  def segment(words: DataFrame, costTable: Map[String, Long]): DataFrame = {
    require(costTable.nonEmpty)
    val mapExpr = "map(" + costTable.toSeq.sorted
      .map { case (p, c) =>
        val q = p.replace("\\", "\\\\").replace("'", "\\'")
        s"'$q', ${c}L"
      }.mkString(", ") + ")"
    words
      .withColumn("dp", expr(
        s"""aggregate(
           |  sequence(1, length(w)),
           |  CAST(array(0) AS ARRAY<BIGINT>),
           |  (acc, i) -> concat(acc, array(array_min(transform(
           |    sequence(greatest(0, i - $maxPiece), i - 1,  1),
           |    j -> (element_at(acc, j + 1) div 16
           |          + coalesce(try_element_at($mapExpr,
           |              substring(w, j + 1, i - j)), ${missingCost}L))
           |         * 16 + j)))))""".stripMargin))
      .withColumn("path", expr(
        """aggregate(
          |  sequence(1, length(w)),
          |  array(length(w)),
          |  (acc, x) -> CASE WHEN element_at(acc, 1) > 0
          |    THEN concat(
          |      array(CAST(element_at(dp, element_at(acc, 1) + 1) % 16 AS INT)),
          |      acc)
          |    ELSE acc END)""".stripMargin))
      .withColumn("pieces", expr(
        """transform(sequence(1, size(path) - 1),
          |  k -> substring(w, element_at(path, k) + 1,
          |    element_at(path, CAST(k + 1 AS INT)) - element_at(path, k)))"""
          .stripMargin))
      .drop("dp", "path")
  }

  /** Piece-usage counts of the canonical segmentations: Σ_w cnt(w) ·
    * occurrences-on-path — the hard-EM sufficient statistic. One
    * piece-domain aggregate.
    */
  def usage(segmented: DataFrame): Map[String, Long] =
    segmented.select(explode(col("pieces")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Trained model: surviving vocabulary with final usage + costs, plus
    * the final cost table for the encode side.
    *
    * Round 0 seeds costs from raw substring mass over the selected
    * vocabulary (all single chars + top-`multiVocab` multi-char
    * substrings by (freq DESC, piece ASC)); round 1 Viterbi-counts usage
    * and PRUNES multi-char pieces the corpus never used (the unigram
    * prune step — single chars always survive, guaranteeing coverage);
    * round 2 re-estimates on the pruned vocabulary. Two E-steps total,
    * matching the oracle's unroll.
    */
  case class Model(
      vocab: Seq[(String, Long, Long)], // (piece, n_uses, cost_bits)
      finalCosts: Map[String, Long],
      words: DataFrame)

  def train(wf: DataFrame): Model = {
    val sub = substringFreqs(wf)
    val chars = sub.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = sub.filter(length(col("piece")) > 1)
      .orderBy(desc("freq"), asc("piece")).limit(multiVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val c0 = costs((chars ++ multi).toMap)
    val u1 = usage(segment(wf, c0))
    val v1: Seq[String] = (chars.map(_._1) ++
      multi.map(_._1).filter(p => u1.getOrElse(p, 0L) > 0L)).toSeq
    val total1 = u1.valuesIterator.sum
    require(total1 > 0L)
    val c1 = v1.map { p =>
      p -> (20L - bits(math.max(1L, (1000000L * u1.getOrElse(p, 0L)) / total1)))
    }.toMap
    val segmented2 = segment(wf, c1)
    val u2 = usage(segmented2)
    val total2 = u2.valuesIterator.sum
    val rows = v1.sorted.map { p =>
      val u = u2.getOrElse(p, 0L)
      (p, u, 20L - bits(math.max(1L, (1000000L * u) / total2)))
    }
    Model(rows, c1, segmented2)
  }
}
