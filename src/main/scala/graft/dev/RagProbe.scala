package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: rag-flagship serve recall vs brute over the derived chunk
  * embeddings, across IVF-PQ serving params — picks the flagship's
  * nprobe/rerank so the 0.9 clustered floor is measured, not hoped.
  */
object RagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    import graft.operators.ann._
    import graft.operators.embed.HashEmbed
    val docs = graft.Tables(spark, dir, "documents")
    val chunks = docs
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .withColumn("n", expr("CAST(size(toks) AS BIGINT)"))
      .withColumn("n_chunks", expr("IF(n <= 32, 1L, 1L + (n - 32 + 15) DIV 16)"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_no"))
      .withColumn("ctext", expr(
        "concat_ws(' ', slice(toks, CAST(chunk_no * 16 + 1 AS INT), CAST(least(32L, n - chunk_no * 16) AS INT)))"))
      .select((col("doc_id") * 1024L + col("chunk_no")).as("cid"), col("ctext"))
    val emb = HashEmbed.embed(chunks, "cid", "ctext", 64).localCheckpoint(true)
    val q = emb.filter(col("id") < 5 * 1024L)
    val truth = Knn.bruteForce(q, emb, "id", "embedding", 5)
      .select("query_id", "neighbor_id", "sim").collect()
    val truthSet = truth.map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"n_chunks=${emb.count()} n_truth=${truthSet.size}")
    println("truth sims: " + truth.map(_.getDouble(2)).sorted.mkString(", "))
    for (nprobe <- Seq(10, 12, 16); rf <- Seq(32, 64, 96)) {
      val t0 = System.nanoTime()
      val got = Pq.searchIvf(q, emb, "id", "embedding", k = 5,
          nprobe = nprobe, rerankFactor = rf)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val hits = got.count(truthSet)
      println(f"RAG ivfpq nprobe=$nprobe rf=$rf recall=${hits.toDouble / truthSet.size}%.3f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    for (nprobe <- Seq(6, 10)) {
      val t0 = System.nanoTime()
      val got = Sq.searchIvf(q, emb, "id", "embedding", k = 5,
          nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val hits = got.count(truthSet)
      println(f"RAG ivfsq nprobe=$nprobe recall=${hits.toDouble / truthSet.size}%.3f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
