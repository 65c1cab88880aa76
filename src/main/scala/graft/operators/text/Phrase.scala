package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional-postings phrase search — the inverted-index-with-positions
  * operator every corpus search/decontamination stack needs (exact phrase
  * hits, not bag-of-words): tokenize once, keep ONLY the phrase's words'
  * postings, and align consecutive positions with equi-joins
  * (`pos_k − k = pos_0`).
  *
  * Scale shape: the posting frame is pruned to the phrase vocabulary
  * BEFORE any join (a 100 TB corpus contributes only its phrase-word
  * occurrences), every join is an equi-join on (doc_id, aligned-position)
  * — shuffle-partitionable, AQE-broadcastable when a phrase word is rare
  * — and the result is one per-doc count. No LIKE scan, no substring
  * pass, no per-doc loop; overlapping occurrences count (every matching
  * start position).
  */
object Phrase {

  /** docs (doc_id, text) → (doc_id, n_occ), docs with ≥1 occurrence. */
  def search(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one word")
    val postings = docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase.distinct: _*))
    val first = postings.filter(col("w") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, k)) =>
      acc.join(
        postings.filter(col("w") === w)
          .select(col("doc_id"), (col("pos") - k).as("p0")),
        Seq("doc_id", "p0"))
    }
      .groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
  }
}
