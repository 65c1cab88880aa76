package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: job/stage shape of ONE lrTrain-style GD iteration (the
  * restructured per-doc-array formulation), to pin down per-iteration
  * scheduler overhead. Prints the executed plan of the iteration query.
  */
object LrShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val st = new JobStatsProbe.Stats
    spark.sparkContext.addSparkListener(st)
    val docsT = graft.Tables(spark, sfDir, "documents")
    // mirror lrFit's docs table
    val toks = graft.queries.Selection.nbTokens(docsT)
    val train = toks.filter(col("doc_id") % 2 === 0)
    val feats = train.select(col("doc_id"), col("bucket")).distinct()
    val labels = train.groupBy("doc_id")
      .agg(max(when(col("tok") === "spark", 1L).otherwise(0L)).as("y"))
    val docs = feats.groupBy("doc_id")
      .agg(collect_list(col("bucket")).as("bks"))
      .join(labels, "doc_id")
      .select(col("bks"), col("y"))
      .localCheckpoint(false)
      .coalesce(1)
    docs.count()
    val w = Array.fill(256)(0L)
    for (r <- 1 to 3) {
      Thread.sleep(300); st.reset()
      val t0 = System.nanoTime()
      // the SHIPPED iteration spelling (Selection.lrTrain): native
      // IndexedWeightSum margin kernel + non-foldable ScalarRef bias —
      // regenerated so the committed after-plan matches HEAD (r18 ADVICE:
      // the first evidence dump showed an intermediate HOF spelling)
      val rows = docs
        .withColumn("mq", graft.functions.IndexedWeightSum(col("bks"), w))
        .withColumn("p", lit(1.0d) / (lit(1.0d) +
          exp(-((col("mq") + graft.functions.ScalarRef.long(0L)) / lit(1e6)))))
        .withColumn("g", col("p") - col("y"))
        .withColumn("l", expr(
          """-(y * log(greatest(p, 1e-12d))
            | + (1L - y) * log(greatest(1.0d - p, 1e-12d)))""".stripMargin))
        .select(explode(concat(col("bks"), array(lit(-1L)))).as("bucket"),
          col("g"), col("l"))
        .groupBy("bucket").agg(
          sum(expr("CAST(round(g, 12) AS DECIMAL(26, 12))")).as("gs"),
          sum(expr("""CASE WHEN bucket = -1
            |  THEN CAST(round(l, 12) AS DECIMAL(26, 12)) END""".stripMargin))
            .as("ls"))
      val collected = rows.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[lrshape] iter$r wall=$wall%.3f rows=${collected.length} " +
        f"jobs=${st.jobs.get} stages=${st.stages.get} tasks=${st.tasks.get}")
      if (r == 1) rows.explain("formatted")
    }
    // Scale-threshold check (r18 verdict #5): the size-derived coalesce
    // (n/8192, floor 1) must hand the per-iteration aggregate its exchange
    // BACK once docs outgrow one partition — synthesize 40k docs and show
    // the same iteration plans WITH an Exchange (no code change, the
    // formula widens on its own).
    println("===== synthetic 40k-doc iteration (coalesce widens) =====")
    import spark.implicits._
    val bigN = 40000L
    val bigDocs0 = spark.range(bigN)
      .select(expr("transform(sequence(0L, CAST(id % 7 AS BIGINT)), " +
        "i -> (id * 31 + i) % 256)").as("bks"),
        (col("id") % 2).as("y"))
      .localCheckpoint(false)
    val bigParts = math.max(1L, math.min(
      bigDocs0.rdd.getNumPartitions.toLong, bigN / 8192L)).toInt
    println(s"[lrshape] synthetic n=$bigN -> coalesce($bigParts)")
    val bigDocs = bigDocs0.coalesce(bigParts)
    val bigRows = bigDocs
      .withColumn("mq", graft.functions.IndexedWeightSum(col("bks"), w))
      .withColumn("p", lit(1.0d) / (lit(1.0d) +
        exp(-((col("mq") + graft.functions.ScalarRef.long(0L)) / lit(1e6)))))
      .withColumn("g", col("p") - col("y"))
      .withColumn("l", expr(
        """-(y * log(greatest(p, 1e-12d))
          | + (1L - y) * log(greatest(1.0d - p, 1e-12d)))""".stripMargin))
      .select(explode(concat(col("bks"), array(lit(-1L)))).as("bucket"),
        col("g"), col("l"))
      .groupBy("bucket").agg(
        sum(expr("CAST(round(g, 12) AS DECIMAL(26, 12))")).as("gs"),
        sum(expr("""CASE WHEN bucket = -1
          |  THEN CAST(round(l, 12) AS DECIMAL(26, 12)) END""".stripMargin))
          .as("ls"))
    bigRows.collect()
    println(bigRows.queryExecution.executedPlan.toString.take(2500))

    // The ORIGINAL r17 iteration shape, for the before/after plan diff:
    // (doc,bucket) rows re-keyed by doc_id + label join + feature join +
    // bucket aggregate — three doc-keyed exchanges of static data per
    // iteration where the array formulation above has at most one
    // (bucket-keyed, 257 groups).
    println("===== r17-formulation single iteration (before) =====")
    val featsB = feats.unionByName(
      labels.select(col("doc_id"), lit(-1L).as("bucket")))
    val wArr0 = array((0 until 256).map(_ => lit(0L)): _*)
    val scored0 = feats
      .withColumn("wv", element_at(wArr0, col("bucket").cast("int") + 1))
      .groupBy("doc_id").agg(sum(col("wv")).as("mq"))
      .join(labels, "doc_id")
      .withColumn("p", expr("1.0d / (1.0d + exp(-((mq + 0L) / 1e6)))"))
      .withColumn("g", col("p") - col("y"))
      .withColumn("l", expr(
        """-(y * log(greatest(p, 1e-12d))
          | + (1L - y) * log(greatest(1.0d - p, 1e-12d)))""".stripMargin))
    featsB.join(scored0.select("doc_id", "g", "l"), "doc_id")
      .groupBy("bucket").agg(
        sum(expr("CAST(round(g, 12) AS DECIMAL(26, 12))")).as("gs"),
        sum(expr("""CASE WHEN bucket = -1
          |  THEN CAST(round(l, 12) AS DECIMAL(26, 12)) END""".stripMargin))
          .as("ls"))
      .explain("formatted")
    spark.stop()
  }
}
