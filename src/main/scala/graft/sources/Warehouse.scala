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
    // header applies with AND without an explicit schema — otherwise a
    // schema'd CSV read would ingest the header line as a data row
    val base = spark.read.format(format).options(options)
    val reader =
      if (format == "csv" || format == "json") base.option("header", "true")
      else base
    schema.fold(reader.option("inferSchema", "true"))(reader.schema).load(path)
  }

  /** Relational-warehouse source over JDBC — the reference's primary ingest
    * path (client/locations.py `RelationalDBLocation`; sources.py
    * `run(batch_size)` pages rows out of a SQL warehouse).
    *
    * Scale shape: when `partitionColumn` is given, Spark issues
    * `numPartitions` range-bounded queries in parallel (one per executor
    * slot), so a 10^9-row warehouse table lands as a partitioned DataFrame
    * instead of one single-connection scan. Filters and column pruning on
    * the result push down into the remote SQL (visible as PushedFilters in
    * the JDBCRelation scan). `predicates` alternatively gives explicit
    * per-partition WHERE clauses (e.g. date shards).
    */
  def readJdbc(
      spark: SparkSession, url: String, table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L, upperBound: Long = 0L, numPartitions: Int = 0,
      predicates: Seq[String] = Nil,
      connectionProperties: Map[String, String] = Map.empty): DataFrame = {
    val props = new java.util.Properties()
    connectionProperties.foreach { case (k, v) => props.setProperty(k, v) }
    (partitionColumn, predicates) match {
      case (Some(colName), ps) =>
        require(ps.isEmpty,
          "partitionColumn and explicit predicates are mutually exclusive — " +
            "range partitioning would silently drop the predicate shards")
        require(numPartitions > 0 && upperBound > lowerBound,
          "partitioned JDBC read needs numPartitions and bounds")
        spark.read.jdbc(url, table, colName, lowerBound, upperBound, numPartitions, props)
      case (None, ps) if ps.nonEmpty =>
        spark.read.jdbc(url, table, ps.toArray, props)
      case _ =>
        spark.read.jdbc(url, table, props)
    }
  }

  /** Deterministic source peek (reference sources.py:277 `sample`: "top n
    * entries"). A naive `limit(n)` depends on partition order; ordering by a
    * hash of the key gives a stable pseudo-random sample and plans as
    * TakeOrderedAndProject — a distributed top-k, never a full sort.
    */
  def sampleRows(df: DataFrame, n: Int, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val ordering = xxhash64(keyCols.map(col): _*) +: keyCols.map(col)
    df.orderBy(ordering: _*).limit(n)
  }

  /** Dry-run type inference for an extract-transform SQL statement — the
    * source-registration probe (reference: client/locations.py:297
    * `infer_types`, which runs `select * from (et) limit 1` plus one
    * probe query per column). Spark already resolves every column's type
    * at ANALYSIS time, so the whole probe is a LIMIT-0 plan: zero rows
    * are fetched from any backing source (for a JDBC-backed view the
    * schema comes from driver metadata; for files from the footer), and
    * one round-trip replaces the reference's per-column scans.
    *
    * Matching the reference's safety check, DDL/DML is rejected loudly:
    * the statement must parse as a pure query.
    *
    * @return columns in SELECT order with their resolved Catalyst types
    */
  def inferTypes(
      spark: SparkSession, extractTransform: String): Seq[(String, org.apache.spark.sql.types.DataType)] = {
    val cleaned = extractTransform.replaceAll("[;\\s]+$", "")
    val parsed = spark.sessionState.sqlParser.parsePlan(cleaned)
    // DDL parses to Command subtypes; DML to InsertIntoStatement /
    // v2 write plans — reject anything that is not a pure query anywhere
    // in the parsed tree (a write can wrap a query, never vice versa).
    val impure = parsed.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.Command => c
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement => i
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand => w
    }
    require(impure.isEmpty,
      s"extract-transform must not contain DDL or DML commands: " +
        impure.map(_.nodeName).getOrElse(""))
    spark.sql(s"SELECT * FROM ($cleaned) sub LIMIT 0")
      .schema.map(f => f.name -> f.dataType).toSeq
  }

  /** JDBC sink (append/overwrite a warehouse table). */
  def writeJdbc(
      df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      connectionProperties: Map[String, String] = Map.empty): Unit = {
    val props = new java.util.Properties()
    connectionProperties.foreach { case (k, v) => props.setProperty(k, v) }
    df.write.mode(mode).jdbc(url, table, props)
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
