package graft

import org.apache.spark.sql.Row

/** Specs for the data-selection operators (queries/Selection.scala):
  * each distributed result is checked against an independent driver-side
  * reference recomputation from the same parquet — not against the
  * operator's own plan.
  */
class SelectionSpec extends SparkSpec {

  private def docs(): Seq[(Long, String, String)] = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "lang")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
  }

  private def toks(text: String): Seq[String] =
    text.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  test("dx_bpe_train matches a driver-side reference BPE over the same corpus") {
    // reference: word-freq table, then greedy leftmost merges with
    // (count DESC, pair ASC) argmax — implemented from scratch, no shared
    // code with the operator (which uses the padded-string replace trick).
    val wf = scala.collection.mutable.Map[String, Long]()
    docs().foreach { case (_, text, _) =>
      toks(text).foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L) }
    var words: Map[Vector[String], Long] =
      wf.toMap.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
    def mergeWord(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.result()
    }
    val expected = (1 to 8).map { it =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (s, c) =>
        s.sliding(2).foreach {
          case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _            => ()
        }
      }
      val ((a, b), c) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      words = words.toSeq
        .map { case (s, cc) => mergeWord(s, a, b) -> cc }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      Row(it.toLong, a, b, a + b, c)
    }
    val got = Registry.byName("dx_bpe_train").fn(spark, sfDir).collect().toSeq
    assert(got === expected)
  }

  test("BPE padded-string replace formulation matches reference BPE on adversarial vocabularies") {
    // The operator merges via literal replace over " s1  s2  ...  </w> "
    // strings. The dangerous case is multi-char symbols whose
    // concatenations collide as substrings (after merge (a,b)->"ab", the
    // symbol pair ("a","ab") contains the byte string "a ab" which
    // overlaps "a a"'s pattern unless the delimiters carry the token
    // boundaries). Random two-letter-alphabet vocabularies force exactly
    // these collisions within a few merges.
    import spark.implicits._
    def mergeWord(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.result()
    }
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(7))).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
      }.distinct
      val wf = vocab.map(w => (w, 1L + rnd.nextInt(50))).toDF("w", "cnt")
      val (merges, finalWords) = graft.queries.Selection.bpeLearnFrom(wf, 6)

      var ref: Map[Vector[String], Long] = wf.collect()
        .map(r => (r.getString(0).map(_.toString).toVector :+ "</w>") -> r.getLong(1))
        .toMap
      val refMerges = (1 to 6).map { it =>
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        ref.foreach { case (s, c) =>
          s.sliding(2).foreach {
            case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
            case _            => ()
          }
        }
        val ((a, b), c) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        ref = ref.toSeq.map { case (s, cc) => mergeWord(s, a, b) -> cc }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        (it.toLong, a, b, a + b, c)
      }
      assert(merges === refMerges, s"merge table diverged for seed $seed")

      // final symbol sequences must agree word-by-word, not just the table
      val got = finalWords.select("w", "sym").collect()
        .map(r => r.getString(0) -> r.getString(1).trim.split("  ").toVector).toMap
      val want = wf.collect().map { r =>
        val w = r.getString(0)
        var s = w.map(_.toString).toVector :+ "</w>"
        refMerges.foreach { case (_, a, b, _, _) => s = mergeWord(s, a, b) }
        w -> s
      }.toMap
      assert(got === want, s"final symbol sequences diverged for seed $seed")
    }
  }

  test("dx_bpe_encode token counts equal a reference encode with the learned merges") {
    // reference: learn merges exactly as the train spec does, then encode
    // each document word-by-word with greedy leftmost merge application.
    val wf = scala.collection.mutable.Map[String, Long]()
    docs().foreach { case (_, text, _) =>
      toks(text).foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L) }
    var words: Map[Vector[String], Long] =
      wf.toMap.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
    def mergeWord(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.result()
    }
    val learned = (1 to 8).map { _ =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (s, c) =>
        s.sliding(2).foreach {
          case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _            => ()
        }
      }
      val ((a, b), _) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      words = words.toSeq
        .map { case (s, cc) => mergeWord(s, a, b) -> cc }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      (a, b)
    }
    def encode(w: String): Int = {
      var s = w.map(_.toString).toVector :+ "</w>"
      learned.foreach { case (a, b) => s = mergeWord(s, a, b) }
      s.length
    }
    val expected = docs().map { case (id, text, _) =>
      val ts = toks(text)
      val bpe = ts.map(encode(_).toLong).sum
      val base = ts.map(_.length.toLong + 1L).sum
      Row(id, ts.size.toLong, bpe, base, 1000L * bpe / base)
    }.sortBy(_.getLong(0))
    val got = Registry.byName("dx_bpe_encode").fn(spark, sfDir).collect().toSeq
    assert(got === expected)
  }

  test("dx_dsir scores equal a driver-side recomputation; top-k order total") {
    val all = docs()
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      (md(0) & 0xff).toLong // == first two hex chars of md5 as an int
    }
    val (target, raw) = all.partition(_._1 % 37 == 0)
    def counts(ds: Seq[(Long, String, String)]): Map[Long, Long] =
      ds.flatMap(d => toks(d._2)).groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
    val ct = counts(target); val cr = counts(raw)
    val nT = ct.values.sum; val nR = cr.values.sum
    def bits(ppm: Long): Long = java.lang.Long.toBinaryString(ppm).length.toLong
    val w: Map[Long, Long] = (ct.keySet ++ cr.keySet).map { b =>
      b -> (bits(math.max(1L, 1000000L * ct.getOrElse(b, 0L) / nT)) -
        bits(math.max(1L, 1000000L * cr.getOrElse(b, 0L) / nR)))
    }.toMap
    val expected = raw.map { case (id, text, lang) =>
      val ts = toks(text)
      Row(id, lang, ts.size.toLong, ts.map(t => w(bucket(t))).sum)
    }.sortBy(r => (-r.getLong(3), r.getLong(0))).take(100)
    val got = Registry.byName("dx_dsir").fn(spark, sfDir).collect().toSeq
    assert(got === expected)
  }

  test("dx_contamination_report matches a driver-side shingle recomputation") {
    val all = docs()
    def shingles(text: String): Set[String] = {
      val ts = toks(text)
      if (ts.size < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val trainVocab = all.filter(_._1 % 50 != 0).flatMap(d => shingles(d._2)).toSet
    val expected = all.filter(_._1 % 50 == 0).flatMap { case (id, text, _) =>
      val sh = shingles(text)
      // docs under 3 tokens emit a single null shingle in the operator's
      // array formulation; none exist in the driver data (pinned here).
      assert(sh.nonEmpty)
      val hit = sh.count(trainVocab.contains).toLong
      Some(Row(id, sh.size.toLong, hit, 1000L * hit / sh.size))
    }.sortBy(_.getLong(0))
    val got = Registry.byName("dx_contamination_report").fn(spark, sfDir).collect().toSeq
    assert(got === expected)
  }

  test("lrTrain is deterministic, reduces loss, and separates a clean synthetic signal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // clean signal: half the docs carry 'spark' plus shared noise words
    val rng = new scala.util.Random(31)
    // noise vocabulary that does NOT hash-collide with the signal token's
    // bucket — a collision is correct hashing-trick behavior (the feature
    // IS shared) but would break the perfect-separation assertion below
    def bucketOf(tok: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      java.lang.Byte.toUnsignedInt(d(0))
    }
    val sparkBucket = bucketOf("spark")
    val noise = (0 until 200).map(i => s"w$i")
      .filter(w => bucketOf(w) != sparkBucket).take(40)
    val corpus = Seq.tabulate(240) { i =>
      val words = Seq.fill(8)(noise(rng.nextInt(noise.size))) ++
        (if (i % 2 == 0) Seq("spark") else Nil)
      (i.toLong, "en", rng.shuffle(words).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val tk = queries.Selection.nbTokens(corpus).localCheckpoint(false)
    def fit() = {
      val train = tk.filter(col("doc_id") % 2 === 0)
      queries.Selection.lrTrain(
        train.select(col("doc_id"), col("bucket")).distinct(),
        train.groupBy("doc_id")
          .agg(max(when(col("tok") === "spark", 1L).otherwise(0L)).as("y")))
    }
    val m1 = fit()
    val m2 = fit()
    assert(m1.wMicro.sameElements(m2.wMicro) && m1.biasMicro == m2.biasMicro &&
      m1.lossMicroByIter == m2.lossMicroByIter,
      "two full fits must be bit-identical")
    assert(m1.lossMicroByIter.last < m1.lossMicroByIter.head,
      "gradient descent must reduce the training loss")
    // even training docs all have y=1 here (i%2==0 carries 'spark'), so
    // train on a doc_id%4-based split instead for a mixed-label check
    val train2 = tk.filter(col("doc_id") % 4 < 2)
    val m3 = queries.Selection.lrTrain(
      train2.select(col("doc_id"), col("bucket")).distinct(),
      train2.groupBy("doc_id")
        .agg(max(when(col("tok") === "spark", 1L).otherwise(0L)).as("y")))
    // score the held-out half by the exact-long margin rule
    val wArr = array(m3.wMicro.map(lit(_)): _*)
    val held = tk.filter(col("doc_id") % 4 >= 2)
    val conf = held.select(col("doc_id"), col("bucket")).distinct()
      .withColumn("wv", element_at(wArr, col("bucket").cast("int") + 1))
      .groupBy("doc_id").agg(sum("wv").as("mq"))
      .join(held.groupBy("doc_id")
        .agg(max(when(col("tok") === "spark", 1L).otherwise(0L)).as("y")), "doc_id")
      .select(col("y"),
        when(col("mq") + lit(m3.biasMicro) >= 0L, 1L).otherwise(0L).as("pred"))
      .collect()
    // held-out: a linear model on hashed presence features generalizes
    // from 120 train docs, not memorizes — demand ≥ 95% (typically
    // 119-120/120; perfect separation is one chance noise-sum away)
    val nOk = conf.count(r => r.getLong(0) == r.getLong(1))
    assert(conf.nonEmpty && nOk * 100 >= conf.length * 95,
      s"held-out accuracy $nOk/${conf.length} below the 95% floor")
  }

  test("dx_mixture_learned matches a driver-side reference reweighting from the trained model") {
    // Reference recomputation from scratch: the model weights come from
    // the dx_lr_train OUTPUT (the public artifact, not shared code), the
    // md5 bucketing / hinge losses / floor arithmetic are re-implemented
    // driver-side in BigInt, and the final table must match the
    // distributed query field-for-field.
    val wRows = Registry.byName("dx_lr_train").fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bias = wRows(-1L)
    def bucket(t: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      (d(0) & 0xff) // first two hex chars of md5 = first byte
    }
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perSource = scala.collection.mutable.Map
      .empty[String, (Long, Long, BigInt)] // n_docs, tokens, hinge sum
    rows.foreach { case (_, source, text) =>
      val ts = text.trim.split("\\s+").toSeq
      val margin = ts.map(bucket).distinct
        .map(b => wRows.getOrElse(b.toLong, 0L)).sum + bias
      val y = if (ts.contains("spark")) 1L else 0L
      val hinge = math.max(0L, 1000000L - (2 * y - 1) * margin)
      val (n, t, h) = perSource.getOrElse(source, (0L, 0L, BigInt(0)))
      perSource(source) = (n + 1, t + ts.length, h + hinge)
    }
    val cDocs = perSource.values.map(_._1).sum
    val cHinge = perSource.values.map(_._3).sum
    val cAvg = cHinge / cDocs
    val stepped = perSource.toSeq.map { case (src, (n, t, h)) =>
      val avg = h / n
      val excess = if (avg > cAvg) (avg - cAvg) * 1000000 / cAvg.max(1)
        else BigInt(0)
      (src, n, t, avg.toLong, excess.toLong, BigInt(t) * (1000000 + excess))
    }
    val rawSum = stepped.map(_._6).sum
    val expected = stepped.map { case (src, n, t, avg, ex, raw) =>
      (src, n, t, avg, ex, (raw * 1000000 / rawSum).toLong)
    }.sortBy(_._1)
    val got = Registry.byName("dx_mixture_learned").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected,
      s"learned mixture diverged from the reference:\n got=$got\n exp=$expected")
  }

  test("dx_lr_train emits the full 257-weight model; dx_lr_classify covers the held-out half") {
    val w = Registry.byName("dx_lr_train").fn(spark, sfDir).collect()
    assert(w.length == 257 && w.map(_.getLong(0)).toSeq == (-1L until 256L),
      "model = 256 bucket weights + bias at bucket -1")
    val conf = Registry.byName("dx_lr_classify").fn(spark, sfDir).collect()
    val total = conf.map(_.getLong(2)).sum
    val nHeld = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter("doc_id % 2 = 1").count()
    assert(total == nHeld, "confusion matrix must cover every held-out doc")
  }
}
