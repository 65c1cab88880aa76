package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination via a broadcast Bloom filter — the shape that
  * wins at corpus scale (reference capability: the n-gram-overlap hygiene
  * rule; the exact inverted-index twin is the dx_decontaminate query).
  *
  * The eval-set shingle vocabulary is small (benchmarks are MBs, the corpus
  * is TBs), so instead of shuffling corpus postings into an equi-join, fit a
  * Bloom filter over the vocabulary ONCE (driver-side, `stat.bloomFilter` —
  * a single distributed aggregate over the small side), broadcast its ~MB of
  * bits to every executor, and flag corpus postings with a membership probe
  * inside the scan. The corpus is never shuffled; the only exchange is the
  * final per-doc count aggregate over the flagged (tiny) subset.
  *
  * Bloom guarantees no false negatives: every truly-shared shingle is
  * flagged, so contaminated docs are NEVER missed; false positives inflate
  * `n_flagged` at rate ≤ fpp per probe (choose fpp against the eval-set
  * size; a flagged doc can be confirmed by the exact join over the flagged
  * subset only — candidates-then-verify, like every other dedup here).
  */
object Decontaminate {

  /** Flag postings whose key might be in the vocabulary; count hits per id.
    *
    * @param postings (id, key) rows — e.g. exploded distinct doc shingles
    * @param vocab    single-column frame of vocabulary keys (small side)
    * @return (id, n_flagged) for ids with at least one probable hit
    */
  def bloomFlagged(
      postings: DataFrame, idCol: String, keyCol: String,
      vocab: DataFrame, vocabCol: String,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(vocab.count(), 1L)
    val bf = vocab.stat.bloomFilter(vocabCol, n, fpp)
    val bc = postings.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    postings
      .filter(mightContain(col(keyCol)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_flagged"))
  }
}
