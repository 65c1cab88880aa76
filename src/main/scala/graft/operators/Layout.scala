package graft.operators

import graft.functions.ZOrder
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order clustering for scan pruning.
  *
  * At 100 TB the cheapest scan is the one that never happens: parquet keeps
  * min/max stats per file and row group, and Spark prunes both when a
  * predicate falls outside the stats. A single-column sort gives tight
  * stats on that column only; Z-ordering by the Morton interleave of two
  * dimension keys (functions/ZOrder) gives every file a tight bounding box
  * in both, so point/range predicates on EITHER dimension skip most files.
  *
  * The write path is deliberately plain Spark: bucket each dimension to its
  * approximate percentile rank (value-balanced even under skew), interleave,
  * `repartitionByRange` on the code (range partitioning keeps file count
  * deterministic and files disjoint in z-space), then sort within
  * partitions so row groups inside a file are clustered too.
  */
object Layout {

  /** Percentile cut points for `c` via distributed Greenwald–Khanna
    * summaries (`approxQuantile`): one map-side pass, driver memory
    * O(buckets), NO global sort — this is what survives 100 TB, where the
    * previous ntile-over-a-global-Window formulation funneled every row
    * through a single partition. Rank error <= 0.5/buckets keeps adjacent
    * buckets honest; exact boundary placement is irrelevant to z-layout
    * (any consistent monotone bucketing clusters equally well).
    *
    * Note this runs a Spark action at plan-build time (layout is a write
    * path, not a lazy transform).
    */
  private def rankCuts(df: DataFrame, c: String, buckets: Int): Array[Double] =
    df.stat.approxQuantile(
      c, (1 until buckets).map(_.toDouble / buckets).toArray, 0.5 / buckets)

  /** Z-cluster `df` by two numeric dimensions into `numFiles` output
    * partitions; returns the frame ready to write (one file per partition,
    * `__z` dropped).
    */
  def zorder(
      df: DataFrame,
      dim1: String,
      dim2: String,
      numFiles: Int,
      rankBuckets: Int = 1 << 12): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val b1 = ZOrder.searchedBucket(col(dim1), rankCuts(df, dim1, rankBuckets))
    val b2 = ZOrder.searchedBucket(col(dim2), rankCuts(df, dim2, rankBuckets))
    df.withColumn("__z", ZOrder.interleave(b1, b2))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
