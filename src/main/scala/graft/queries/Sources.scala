package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink round-trip gates (SURVEY.md §2, "Sources" — the matchbox
  * `Location` surface: relational warehouses over JDBC plus csv/json file
  * drops). Each gate writes driver data out through the source layer,
  * reads it back the way an ingest job would (partitioned JDBC ranges,
  * explicit file schemas), and aggregates — the oracle computes the same
  * aggregate straight from the parquet, so any row lost, duplicated or
  * type-mangled in the round trip breaks the hash match.
  */
object Sources {

  // ---- temp-dir discipline (r13 ADVICE: every gate minted a fresh
  // Files.createTempDirectory per invocation and never deleted it, so
  // repeated bench/verify runs leaked disk under /tmp) -----------------
  private val cleanupPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val cleanupHook: Unit = {
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      cleanupPaths.asScala.foreach { p =>
        try java.nio.file.Files.walk(java.nio.file.Paths.get(p))
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        catch { case _: Throwable => () } // exit-time cleanup is best-effort
      }
    }
    ()
  }

  /** A fresh temp dir, deleted recursively at JVM exit — for gates whose
    * body cannot re-run over an existing dir (Derby CREATE TABLE).
    */
  private def scratchDir(prefix: String): String = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(s"graft_$prefix").toString
    cleanupPaths.add(p)
    p
  }

  private val sessionDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** One temp dir per (gate, sf) per JVM, reused across repeated
    * invocations (all consumers write with overwrite semantics), deleted
    * recursively at JVM exit.
    */
  private def sessionDir(gate: String, sfDir: String): String =
    sessionDirs.getOrElseUpdate(
      s"${gate}_${Integer.toHexString(sfDir.hashCode)}", scratchDir(gate))

  /** Embedded-Derby JDBC round trip: load nation into a warehouse table,
    * read it back as 4 range-bounded parallel queries with a pushed-down
    * filter (the reference's RelationalDBLocation ingest shape), and
    * aggregate per region. Derby runs in-process — no network — so the
    * gate exercises exactly the Spark JDBC source code paths (partitioned
    * scan, filter pushdown, type mapping).
    *
    * Multi-JVM discipline (caught by the r13 local-cluster smoke):
    * embedded Derby lets only ONE JVM boot a read-write database, so a
    * Spark `write.jdbc` — whose insert tasks run on executors while the
    * driver holds the table-create connection — collides with any
    * separate-executor master on the db.lck boot lock. The warehouse
    * reality at scale is the inverse anyway: Spark READS the warehouse in
    * parallel; loading it is the database's job. So the load is a plain
    * driver-side JDBC batch over the bounded dimension (25 rows), the
    * database is shut down (releasing the boot lock) and archived into a
    * jar — Derby's `jar:` subprotocol is read-only media, the one mode
    * it boots CONCURRENTLY from many JVMs (a chmod-based read-only flip
    * is NOT reliable here: as root, File.canWrite ignores permission
    * bits) — and then every executor scan task opens its own read-only
    * boot. Spark's jdbc WRITE path stays covered by FunctionsSpec's
    * single-JVM round trip.
    */
  private def jdbcGate(s: SparkSession, dir: String): DataFrame = {
    val dbDir = scratchDir("jdbc")
    val db = s"$dbDir/graftdb"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val nation = Tables(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))
      .collect() // bounded dimension: 25 rows by TPC-H contract
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      conn.createStatement().executeUpdate(
        """CREATE TABLE nation_jdbc
          |(n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT)""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO nation_jdbc VALUES (?, ?, ?)")
      nation.foreach { r =>
        ps.setLong(1, r.getLong(0)); ps.setString(2, r.getString(1))
        ps.setLong(3, r.getLong(2)); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    // shutdown=true releases the db.lck boot lock (Derby signals success
    // with SQLState 08006 — an exception by design)
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    // archive the database directory into a jar: `jar:` subprotocol
    // databases are read-only media, bootable concurrently from any
    // number of JVMs (no db.lck)
    import scala.jdk.CollectionConverters._
    val jarPath = s"$dbDir/graftdb.jar"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(jarPath))
    try {
      val root = java.nio.file.Paths.get(db)
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .toSeq.sortBy(_.toString)
        .foreach { p =>
          zos.putNextEntry(new java.util.zip.ZipEntry(
            "graftdb/" + root.relativize(p).toString))
          zos.write(java.nio.file.Files.readAllBytes(p))
          zos.closeEntry()
        }
    } finally zos.close()
    Warehouse.readJdbc(s, s"jdbc:derby:jar:($jarPath)graftdb", "nation_jdbc",
        partitionColumn = Some("n_nationkey"),
        lowerBound = 0L, upperBound = 25L, numPartitions = 4,
        connectionProperties = props)
      .filter(col("n_regionkey") < 3)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"), min("n_name").as("first_name"))
      .orderBy("n_regionkey")
  }

  private val jdbcGateSql =
    """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
      |  count(*) AS n_nations, min(n_name) AS first_name
      |FROM nation WHERE n_regionkey < 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** CSV round trip: customers out as headered CSV, back in with the
    * explicit schema (never inference — a production ingest pins types),
    * then the money aggregate per segment. Doubles survive the text round
    * trip exactly (Spark writes shortest-roundtrip representations), and
    * the scaled-integer sum makes the aggregate bit-identical anyway.
    */
  private def csvGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("csv", dir)
    val customer = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    customer.write.mode("overwrite").option("header", "true").csv(s"$out/customer_csv")
    Warehouse.read(s, "csv", s"$out/customer_csv",
        schema = Some(customer.schema))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        Num.moneySum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  private val csvGateSql =
    s"""SELECT c_mktsegment, count(*) AS n_customers,
       |  ${Num.moneySumSql("c_acctbal")} AS sum_bal
       |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** JSON round trip: suppliers out as JSON lines, back in with the
    * explicit schema, per-nation census. */
  private def jsonGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("json", dir)
    val supplier = Tables(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"),
        col("s_nationkey").cast("int").as("s_nationkey"), col("s_acctbal"))
    supplier.write.mode("overwrite").json(s"$out/supplier_json")
    Warehouse.read(s, "json", s"$out/supplier_json",
        schema = Some(supplier.schema))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"), min("s_name").as("first_name"))
      .orderBy("s_nationkey")
  }

  private val jsonGateSql =
    """SELECT CAST(s_nationkey AS INTEGER) AS s_nationkey,
      |  count(*) AS n_suppliers, min(s_name) AS first_name
      |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  /** ORC round trip: parts out as ORC (the other columnar warehouse
    * format Spark ships a vectorized reader for), back in with the
    * explicit schema, per-brand census. Unlike the text formats, ORC
    * preserves types natively — the gate catches writer/reader option
    * drift (compression, dictionary encoding) rather than type mangling.
    */
  private def orcGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("orc", dir)
    val part = Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_size"), col("p_retailprice"))
    part.write.mode("overwrite").orc(s"$out/part_orc")
    Warehouse.read(s, "orc", s"$out/part_orc", schema = Some(part.schema))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("p_size").cast("long")).as("sum_size"),
        Num.moneySum(col("p_retailprice")).as("sum_price"),
        min("p_name").as("first_name"))
      .orderBy("p_brand")
  }

  private val orcGateSql =
    s"""SELECT p_brand, count(*) AS n_parts,
       |  CAST(sum(p_size) AS BIGINT) AS sum_size,
       |  ${Num.moneySumSql("p_retailprice")} AS sum_price,
       |  min(p_name) AS first_name
       |FROM part GROUP BY 1 ORDER BY 1""".stripMargin

  /** Avro round trip — completes the warehouse format family (jdbc/csv/
    * json/orc/text/xml/binary + this): supplier written as Avro container
    * files through Hadoop's `AvroKeyOutputFormat` (the runtime ships
    * avro + avro-mapred but not the spark-avro connector, so the gate
    * drives the public Hadoop-format path a connector-less cluster uses),
    * read back SCHEMA-FIRST via `AvroKeyInputFormat`, and aggregated per
    * nation; the oracle computes the same aggregate straight from the
    * parquet, so any row lost, duplicated or type-mangled in the
    * container round trip breaks the hash match.
    *
    * Mechanics that matter at scale: the writer schema travels as JSON
    * text and is parsed per-partition (record construction is
    * task-local, no driver loop); the input format's datum REUSE is
    * defused by projecting to primitives in the same map, before any
    * shuffle could capture a recycled record. Monetary values ride as
    * exact cents (the Num discipline), keeping the aggregate arithmetic
    * bit-identical in both engines.
    */
  private val supplierAvroSchema =
    """{"type":"record","name":"SupplierRow","fields":[
      |  {"name":"s_suppkey","type":"long"},
      |  {"name":"s_nationkey","type":"long"},
      |  {"name":"s_acctbal_cents","type":"long"},
      |  {"name":"s_name","type":"string"}]}""".stripMargin

  private def avroGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    val out = s"${sessionDir("avro", dir)}/supplier_avro"
    val schemaJson = supplierAvroSchema
    // saveAsNewAPIHadoopFile refuses an existing dir (no overwrite mode
    // at the Hadoop-format layer): clear the session subdir first.
    val hp = new org.apache.hadoop.fs.Path(out)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(s.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    Tables(s, dir, "supplier")
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"),
        Num.cents(col("s_acctbal")).as("cents"), col("s_name"))
      .rdd.mapPartitions { rows =>
        val schema = new Schema.Parser().parse(schemaJson)
        rows.map { r =>
          val rec = new GenericData.Record(schema)
          rec.put("s_suppkey", r.getLong(0))
          rec.put("s_nationkey", r.getLong(1))
          rec.put("s_acctbal_cents", r.getLong(2))
          rec.put("s_name", r.getString(3))
          (new AvroKey[GenericRecord](rec), NullWritable.get)
        }
      }
      .saveAsNewAPIHadoopFile(out, classOf[AvroKey[GenericRecord]],
        classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
    val readConf = new org.apache.hadoop.conf.Configuration(
      s.sparkContext.hadoopConfiguration)
    readConf.set("avro.schema.input.key", schemaJson)
    val back = s.sparkContext.newAPIHadoopFile(
        out, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], readConf)
      .map { case (k, _) =>
        val rec = k.datum()
        (rec.get("s_suppkey").asInstanceOf[Long],
          rec.get("s_nationkey").asInstanceOf[Long],
          rec.get("s_acctbal_cents").asInstanceOf[Long],
          rec.get("s_name").toString)
      }
    import s.implicits._
    back.toDF("s_suppkey", "s_nationkey", "cents", "s_name")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        (Num.bigSum(col("cents")) / 100.0).as("sum_bal"),
        min("s_name").as("first_name"))
      .orderBy("s_nationkey")
  }

  private val avroGateSql =
    s"""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       |  count(*) AS n_suppliers,
       |  ${Num.moneySumSql("s_acctbal")} AS sum_bal,
       |  min(s_name) AS first_name
       |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  /** Partitioned-layout round trip: documents written `partitionBy(lang)`
    * (the physical layout every language-sliced corpus ships with), read
    * back with a language predicate. The gate REQUIRES partition pruning
    * loudly — the scan's partition filters must carry the lang predicate,
    * i.e. only the `lang=en` directory is read; a layout or reader
    * regression that silently scans every partition fails the gate rather
    * than just running slower. The aggregate is oracle-matched against
    * the flat parquet, proving the partition columns round-trip values
    * exactly (they travel as directory names, not data pages).
    */
  /** Schema-evolution round trip — the lakehouse append shape: yesterday's
    * files lack a column today's carry (here `source` appears in the v2
    * batch only). The merged read must surface the UNION schema with nulls
    * backfilled on old files, and the gate's census counts the evolved
    * column's non-null population so a silently-dropped column (or a
    * non-null backfill) fails the hash compare. Two loud requires pin the
    * mechanism itself: the v1-only read must NOT carry the column, the
    * merged read must.
    *
    * At 100 TB: `mergeSchema` costs a footer sweep over every file — fine
    * for a gate, wrong for production reads; a real deployment pins the
    * evolved schema in the catalog (or passes it explicitly) and gets the
    * same null-backfill semantics with zero inference. This gate pins
    * those semantics.
    */
  private def evolutionGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("evo", dir)
    val docs = Tables(s, dir, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/evo/v1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
      .write.mode("overwrite").parquet(s"$out/evo/v2")
    val v1Only = s.read.parquet(s"$out/evo/v1")
    require(!v1Only.columns.contains("source"),
      "v1 files must lack the evolved column")
    val back = s.read.option("mergeSchema", "true")
      .parquet(s"$out/evo/v1", s"$out/evo/v2")
    require(back.columns.sorted.sameElements(
        Array("doc_id", "lang", "n_chars", "source")),
      s"merged schema wrong: ${back.columns.mkString(",")}")
    back.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("source")).as("n_with_source"),
        sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }

  private val evolutionGateSql =
    """SELECT lang, count(*) AS n_docs,
      |  count(CASE WHEN doc_id % 2 = 1 THEN source END) AS n_with_source,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  private def partitionGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("part", dir)
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").partitionBy("lang").parquet(s"$out/docs_part")
    val back = s.read.parquet(s"$out/docs_part").filter(col("lang") === "en")
    // Inspect the physical scan's partitionFilters directly (string-matching
    // the plan is vacuous: "PartitionFilters: []" and the output attribute
    // list both mention the tokens even when nothing was pushed).
    val pushed = back.queryExecution.executedPlan.collectLeaves().exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.partitionFilters.exists(_.references.exists(_.name == "lang"))
      case _ => false
    }
    require(pushed,
      s"lang predicate did not reach the partition filters:\n" +
        back.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n"))
    back.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_doc"))
      .orderBy("source")
  }

  private val partitionGateSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS min_doc
      |FROM documents WHERE lang = 'en'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Plain-text round trip: delimited lines out through the text sink,
    * back through the text source with an explicit parse (split + casts —
    * the classic log/flat-file ingest shape), per-brand census. The money
    * column crosses the text boundary as Spark's shortest-roundtrip
    * double rendering, so the parse-back is value-exact and the
    * scaled-integer aggregate proves it against the parquet.
    */
  private def textGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("text", dir)
    Tables(s, dir, "part")
      .select(concat_ws("|", col("p_partkey"), col("p_brand"),
        col("p_retailprice")).as("value"))
      .write.mode("overwrite").text(s"$out/part_txt")
    Warehouse.read(s, "text", s"$out/part_txt", schema = None)
      .select(split(col("value"), "\\|").as("f"))
      .select(
        expr("CAST(element_at(f, 1) AS BIGINT)").as("p_partkey"),
        expr("element_at(f, 2)").as("p_brand"),
        expr("CAST(element_at(f, 3) AS DOUBLE)").as("p_retailprice"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        min("p_partkey").as("min_key"),
        Num.moneySum(col("p_retailprice")).as("sum_price"))
      .orderBy("p_brand")
  }

  private val textGateSql =
    s"""SELECT p_brand, count(*) AS n_parts, min(p_partkey) AS min_key,
       |  ${Num.moneySumSql("p_retailprice")} AS sum_price
       |FROM part GROUP BY 1 ORDER BY 1""".stripMargin

  /** XML round trip (Spark 4's built-in XML source, the spark-xml
    * donation): nations out as `<nation>` row elements, back in with the
    * explicit schema and rowTag, per-region census. XML is the interchange
    * format warehouses still emit for reference data; the gate catches
    * element/attribute mapping and type-coercion drift.
    */
  private def xmlGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("xml", dir)
    val nation = Tables(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    nation.write.mode("overwrite").format("xml")
      .option("rowTag", "nation").option("rootTag", "nations")
      .save(s"$out/nation_xml")
    Warehouse.read(s, "xml", s"$out/nation_xml",
        schema = Some(nation.schema), options = Map("rowTag" -> "nation"))
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"), min("n_name").as("first_name"),
        sum("n_nationkey").as("sum_key"))
      .orderBy("n_regionkey")
  }

  private val xmlGateSql =
    """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
      |  count(*) AS n_nations, min(n_name) AS first_name,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin

  /** Binary-file ingest (`binaryFile`, the path every blob corpus —
    * image/audio shards, WARC members — enters Spark through): a bounded
    * document slice is materialised as one UTF-8 file per doc, read back
    * as (path, content) with a glob filter, and re-keyed from the file
    * name. Byte length and sha256 per document are oracle-matched against
    * the parquet text, proving the bytes survived the filesystem hop
    * exactly. Listing is distributed and contents stream per task — at
    * 100 TB this is the same plan, pointed at an object store.
    */
  private def binaryGate(s: SparkSession, dir: String): DataFrame = {
    val out = sessionDir("bin", dir)
    val docsDir = s"$out/docs"
    // files are written ON EXECUTORS (foreachPartition), not via a driver
    // collect loop (r13 ADVICE: the collect form was a driver-memory and
    // wall-clock hazard if the slice grows) — and through the HADOOP
    // FILESYSTEM of the target path, not java.nio (r14 ADVICE: a local
    // java.nio write lands on each executor's OWN disk on a real cluster
    // and the driver-side listing silently reads empty; FileSystem.get
    // resolves the path against the executor's Hadoop config, so an
    // hdfs://... or s3a://... docsDir writes to shared storage — the blob
    // store the real ingest targets)
    // the bare path resolves against fs.defaultFS on BOTH sides (write
    // tasks and the driver's binaryFile listing), so they always agree on
    // which store the files live in; created driver-side too so an empty
    // slice still lists as zero files instead of failing the load
    new org.apache.hadoop.fs.Path(docsDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(docsDir))
    val slice = Tables(s, dir, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(false)
    val nSlice = slice.count()
    slice.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val base = new org.apache.hadoop.fs.Path(docsDir)
        val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
        fs.mkdirs(base)
        it.foreach { r =>
          val o = fs.create(
            new org.apache.hadoop.fs.Path(base, s"${r.getLong(0)}.txt"), true)
          try o.write(
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally o.close()
        }
      }
    }
    val back = s.read.format("binaryFile").option("pathGlobFilter", "*.txt")
      .load(docsDir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.txt$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("sha"))
      .orderBy("doc_id")
      // the count below and the returned frame share one materialization
      // (one file listing + hash pass, not two)
      .localCheckpoint(false)
    // loud divergence guard: a mis-rooted filesystem (files on executor
    // disks, listing on the driver) must fail the gate, never read empty
    val nBack = back.count()
    require(nBack == nSlice,
      s"binaryGate round-trip lost files: wrote $nSlice, read back $nBack")
    back
  }

  private val binaryGateSql =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS sha
      |FROM documents WHERE doc_id % 20 = 0
      |ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("src_jdbc_gate", jdbcGate, Some(jdbcGateSql)),
    QueryDef("src_csv_gate", csvGate, Some(csvGateSql)),
    QueryDef("src_json_gate", jsonGate, Some(jsonGateSql)),
    QueryDef("src_orc_gate", orcGate, Some(orcGateSql)),
    QueryDef("src_avro_gate", avroGate, Some(avroGateSql)),
    QueryDef("src_evolution_gate", evolutionGate, Some(evolutionGateSql)),
    QueryDef("src_partition_gate", partitionGate, Some(partitionGateSql)),
    QueryDef("src_text_gate", textGate, Some(textGateSql)),
    QueryDef("src_xml_gate", xmlGate, Some(xmlGateSql)),
    QueryDef("src_binary_gate", binaryGate, Some(binaryGateSql)))
}
