package graft

import org.apache.spark.sql.functions._

/** Specs for the corpus search & compliance batch (queries/Search.scala):
  * phrase search pinned on planted overlap/adjacency cases, the Luhn
  * validator pinned on the classic public test numbers, battery seed
  * invariants, and collocations re-derived driver-side.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.text.{Phrase, Pii}

  test("phrase search counts every start position, including overlaps") {
    val docs = Seq(
      (1L, "a b c a b"),     // two disjoint occurrences of 'a b'
      (2L, "x x x"),         // two OVERLAPPING occurrences of 'x x'
      (3L, "b a"),           // reversed — no match
      (4L, "a")              // too short
    ).toDF("doc_id", "text")
    val ab = Phrase.search(docs, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab == Map(1L -> 2L))
    val xx = Phrase.search(docs, Seq("x", "x")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(xx == Map(2L -> 2L))
    assert(Phrase.search(docs, Seq("c", "b")).isEmpty)
    // 3-word adjacency must hold transitively, not pairwise
    val docs3 = Seq((1L, "p q r"), (2L, "p q p q r")).toDF("doc_id", "text")
    val pqr = Phrase.search(docs3, Seq("p", "q", "r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pqr == Map(1L -> 1L, 2L -> 1L))
  }

  test("Luhn validator accepts the classic test numbers and nothing off-by-one") {
    // public test vectors: 4111111111111111 and 4532015112830366 are valid
    val rows = Seq("4111111111111111", "4532015112830366",
      "4111111111111112", "4532015112830367")
      .toDF("c").select(col("c"), Pii.luhnValid("c").as("v"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows("4111111111111111") == 1 && rows("4532015112830366") == 1)
    assert(rows("4111111111111112") == 0 && rows("4532015112830367") == 0)
  }

  test("generated check digits always pass the validator; offset ones never") {
    val base = Seq(400000000000000L, 412345678901234L, 499999999999999L)
      .toDF("b")
    val good = base.select(expr(Pii.cardFromBase("b", "div")).as("c"))
      .select(Pii.luhnValid("c").as("v")).collect().map(_.getInt(0))
    assert(good.forall(_ == 1))
    val bad = base.select(expr(Pii.cardFromBase("b", "div", offset = 1)).as("c"))
      .select(Pii.luhnValid("c").as("v")).collect().map(_.getInt(0))
    assert(bad.forall(_ == 0))
  }

  test("battery counts seeded PII and rejects checksum-broken cards") {
    val rows = Registry.byName("dx_pii_battery").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (phones, ips, cand, valid) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (id % 7 == 0) assert(phones >= 1, s"doc $id phones")
      if (id % 11 == 0) assert(ips >= 1, s"doc $id ips")
      val expValid = if (id % 13 == 0) 1L else 0L
      val expCand = expValid + (if (id % 17 == 0) 1L else 0L)
      // corpus text is digit-free, so the seeds are the only candidates
      assert(cand == expCand, s"doc $id candidates")
      assert(valid == expValid, s"doc $id valid — Luhn must separate them")
    }
  }

  test("card candidates need digit boundaries: 17+-digit runs never fire") {
    // r13 ADVICE: a bare [0-9]{16} pattern yields a misaligned candidate
    // inside any longer digit run. The maximal-run form must extract
    // nothing from 15- and 17-digit runs and exactly one candidate from a
    // bounded 16-digit run.
    val battery = expr(
      s"""CAST(size(filter(regexp_extract_all(t, '${Pii.digitRunRe}', 0),
         |  c -> length(c) = ${Pii.cardLen})) AS BIGINT)""".stripMargin)
    val counts = Seq(
      "serial 41111111111111112 end",  // 17 digits — no candidate
      "short 411111111111111 end",     // 15 digits — no candidate
      "card 4111111111111111 end",     // exactly 16 — one candidate
      "a4111111111111111b")            // letter-bounded 16 — one candidate
      .toDF("t").select(battery.as("n")).collect().map(_.getLong(0)).toSeq
    assert(counts == Seq(0L, 0L, 1L, 1L), s"got $counts")
  }

  test("containment surfaces every excerpt→source pair and no reverses") {
    val rows = Registry.byName("dx_containment").fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val allExcerpts = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 9 === 0)
      .select(col("doc_id"), expr(
        "size(split(trim(substring(text, 1, length(text) div 2)), '\\\\s+'))")
        .as("ntok"))
      .collect().map(r => (r.getLong(0) + 2000000, r.getInt(1)))
    val excerptIds = allExcerpts.map(_._1).toSet
    // every seeded excerpt ABOVE the operator's n_src ≥ 5 noise floor must
    // hit its source (tiny docs' excerpts have < 5 shingles by contract)
    allExcerpts.filter(_._2 >= 10).map(_._1).foreach { ex =>
      val hit = rows.find { case (s0, d, _) => s0 == ex && d == ex - 2000000 }
      assert(hit.isDefined, s"excerpt $ex lost its source")
      // ≥ the query threshold: short docs lose a couple of shingles to
      // the mid-token cut, so ~857 permille happens at sf0.001
      assert(hit.get._3 >= 800, s"excerpt $ex containment ${hit.get._3}")
    }
    // the reverse direction (source→half-length excerpt) is ~500 permille
    // and must stay below the 800 threshold
    assert(!rows.exists { case (s0, d, _) =>
      excerptIds.contains(d) && s0 == d - 2000000 })
  }

  test("phrase search equals naive sliding-window counts on random docs") {
    val rng = new scala.util.Random(1913)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val docs = (1L to 40L).map(id =>
        (id, Seq.fill(2 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      val phrase = Seq.fill(1 + rng.nextInt(3))(vocab(rng.nextInt(vocab.size)))
      val expected = docs.flatMap { case (id, text) =>
        val ws = text.split(" ").toSeq
        val n = ws.sliding(phrase.size).count(_ == phrase)
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      val got = Phrase.search(docs.toDF("doc_id", "text"), phrase).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial phrase ${phrase.mkString(" ")}")
    }
  }

  test("Luhn generation/validation round-trips on random 15-digit bases") {
    val rng = new scala.util.Random(77)
    val bases = Seq.fill(40)(400000000000000L + math.abs(rng.nextLong()) % 100000000000000L)
    val df = bases.toDF("b")
    assert(df.select(expr(Pii.cardFromBase("b", "div")).as("c"))
      .select(Pii.luhnValid("c").as("v"))
      .collect().forall(_.getInt(0) == 1))
    for (off <- 1 to 9) {
      assert(df.select(expr(Pii.cardFromBase("b", "div", offset = off)).as("c"))
        .select(Pii.luhnValid("c").as("v"))
        .collect().forall(_.getInt(0) == 0), s"offset $off must break Luhn")
    }
  }

  test("collocations match a driver-side recomputation") {
    val toks = Tables(spark, sfDir, "documents")
      .select(split(trim(col("text")), "\\s+").as("ws"))
      .collect().map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = bi.toSeq.map { case ((w1, w2), np) =>
      (w1, w2, np, uni(w1), uni(w2), 2000L * np / (uni(w1) + uni(w2)))
    }.sortBy { case (w1, w2, np, _, _, d) => (-d, -np, w1, w2) }.take(50)
    val got = Registry.byName("dx_collocations").fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expect)
  }
}
