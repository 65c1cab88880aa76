package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Warehouse I/O — the source/sink surface matchbox fronts with its
  * `Location` abstraction (reference: client/locations.py
  * RelationalDBLocation; sources are externally-stored tables the engine
  * indexes but never copies).
  *
  * Formats: parquet (primary), csv, json. Writers lay data out for scale:
  * `writePartitioned` for partition-pruned scans, `writeBucketed` for
  * shuffle-free joins on the bucket key (both sides bucketed on the join
  * key means Catalyst plans a SortMergeJoin with no Exchange).
  */
object Warehouse {

  def read(
      spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format(format).options(options)
    schema.fold(
      if (format == "csv" || format == "json")
        reader.option("inferSchema", "true").option("header", "true")
      else reader
    )(sch => reader.schema(sch)).load(path)
  }

  /** Directory-partitioned write: downstream filters on `partitionBy`
    * columns prune whole directories at planning time.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionBy: Seq[String],
      format: String = "parquet", mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format(format).mode(mode).partitionBy(partitionBy: _*).save(path)

  /** Bucketed managed table: co-locates rows by hash of the bucket key so
    * bucket-aware joins and aggregations skip the shuffle entirely.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketBy: Seq[String], numBuckets: Int,
      sortBy: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite): Unit = {
    var w = df.write.mode(mode).bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
    if (sortBy.nonEmpty) w = w.sortBy(sortBy.head, sortBy.tail: _*)
    w.saveAsTable(table)
  }
}
