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
  * percentile rank (value-balanced even under skew), interleave,
  * `repartitionByRange` on the code (range partitioning keeps file count
  * deterministic and files disjoint in z-space), then sort within
  * partitions so row groups inside a file are clustered too.
  */
object Layout {

  /** Percentile-rank bucket of `c` into `buckets` values (0 .. buckets-1),
    * exact and deterministic via ntile over a global order. For truly huge
    * inputs swap in `approxQuantile`-derived cut points; ntile keeps the
    * spec's determinism.
    */
  private def rankBucket(df: DataFrame, c: String, buckets: Int): Column =
    (ntile(buckets).over(
      org.apache.spark.sql.expressions.Window.orderBy(col(c), monotonically_increasing_id())) - 1)
      .cast("long")

  /** Z-cluster `df` by two numeric dimensions into `numFiles` output
    * partitions; returns the frame ready to write (one file per partition,
    * `__z` dropped).
    */
  def zorder(
      df: DataFrame,
      dim1: String,
      dim2: String,
      numFiles: Int,
      rankBuckets: Int = 1 << 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val coded = df
      .withColumn("__b1", rankBucket(df, dim1, rankBuckets))
      .withColumn("__b2", rankBucket(df, dim2, rankBuckets))
      .withColumn("__z", ZOrder.interleave(col("__b1"), col("__b2")))
    coded
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__b1", "__b2", "__z")
  }
}
