package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination via a Bloom filter — the shape that wins at
  * corpus scale (reference capability: the n-gram-overlap hygiene rule; the
  * exact inverted-index twin is the dx_decontaminate query).
  *
  * The eval-set shingle vocabulary is small (benchmarks are MBs, the corpus
  * is TBs), so instead of shuffling corpus postings into an equi-join, fit a
  * Bloom filter over the vocabulary with Spark's native
  * `BloomFilterAggregate` (one distributed aggregate over xxhash64 keys —
  * the same kernel Catalyst injects for runtime join filters), embed its
  * bits as a plan literal, and flag corpus postings with the codegen'd
  * `BloomFilterMightContain` probe inside the scan. The corpus is never
  * shuffled and never leaves whole-stage codegen; the only exchange is the
  * final per-doc count aggregate over the flagged (tiny) subset. No UDF
  * boundary, no broadcast variable to leak across the bench loop — the
  * filter rides the task binary like any other foldable literal.
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
    * Both sides hash through `xxhash64` (the put and the probe use the same
    * long-hash domain, exactly like Spark's injected runtime bloom filters).
    *
    * @param postings (id, key) rows — e.g. exploded distinct doc shingles
    * @param vocab    single-column frame of vocabulary keys (small side)
    * @param expectedItems vocabulary-size hint used to size the filter; pass
    *   a known/estimated count to skip the sizing `count()` pass (an
    *   overestimate only wastes bits, an underestimate only raises the
    *   realised fpp — never correctness)
    * @return (id, n_flagged) for ids with at least one probable hit
    */
  def bloomFlagged(
      postings: DataFrame, idCol: String, keyCol: String,
      vocab: DataFrame, vocabCol: String,
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = if (expectedItems > 0) expectedItems else math.max(vocab.count(), 1L)
    val numBits = math.max(BloomFilter.optimalNumOfBits(n, fpp), 64L)
    // BloomFilterAggregate silently clamps its sizing to the runtime-filter
    // session caps; a clamped filter would realise a far worse fpp than
    // requested, so fail loudly and tell the caller which confs to raise.
    val conf = vocab.sparkSession.conf
    val maxItems =
      conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits =
      conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(n <= maxItems && numBits <= maxBits,
      s"bloom sizing ($n items / $numBits bits) exceeds the session caps " +
        s"($maxItems / $maxBits) and would be silently clamped, breaking the " +
        "fpp=" + fpp + " contract; raise spark.sql.optimizer.runtime." +
        "bloomFilter.maxNumItems/maxNumBits for this session")
    val fit = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(vocabCol))),
      Literal(n), Literal(numBits)).toAggregateExpression())
    val bytes = vocab.agg(fit.as("bf")).head().getAs[Array[Byte]](0)
    if (bytes == null) { // empty vocabulary → nothing can be flagged
      return postings.sparkSession.emptyDataFrame
        .withColumn(idCol, lit(null).cast(postings.schema(idCol).dataType))
        .withColumn("n_flagged", lit(0L))
    }
    val probe = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(xxhash64(col(keyCol)))))
    postings
      .filter(col(keyCol).isNotNull && probe)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_flagged"))
  }
}
