package graft

import org.apache.spark.sql.functions._

/** Trained language-ID contracts, checked against an independent pure-Scala
  * driver reference (no Spark in the reference path): planted-word
  * generation, char-trigram bucketing, the integer NB weight/prior formulas
  * and the (score DESC, class ASC) argmax are all recomputed on the driver
  * and must agree with the registered query doc-by-doc.
  */
class LangIdTrainedSpec extends SparkSpec {

  private val langs = Seq("de", "en", "es", "fr", "zh")
  private val vocab: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "nicht", "das", "ist", "mit", "sich", "auch", "werden"),
    "en" -> Seq("the", "and", "was", "that", "have", "this", "with", "they", "from", "which"),
    "es" -> Seq("que", "los", "una", "con", "para", "por", "las", "del", "este", "como"),
    "fr" -> Seq("les", "des", "est", "dans", "pour", "une", "qui", "sur", "avec", "pas"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "men", "zhe", "guo", "ren", "zhong"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def plantedWords(docId: Long): Seq[String] = {
    val lang = langs((docId % 5).toInt)
    (0 until 12).map { i =>
      val idx = Integer.parseInt(md5hex(s"$docId:$i").substring(0, 1), 16) % 10
      vocab(lang)(idx)
    }
  }

  private def buckets(words: Seq[String]): Seq[Int] =
    words.flatMap { w =>
      val pw = "^" + w + "$"
      (0 to pw.length - 3).map(p =>
        Integer.parseInt(md5hex(pw.substring(p, p + 3)).substring(0, 2), 16))
    }

  private def binLen(x: Long): Long =
    java.lang.Long.toBinaryString(math.max(1L, x)).length.toLong

  test("registered query matches the pure-Scala reference doc-by-doc") {
    val docIds = Tables(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // reference fit on the even half
    val trainIds = docIds.filter(_ % 2 == 0)
    val counts = scala.collection.mutable.Map
      .empty[(String, Int), Long].withDefaultValue(0L)
    val totals = scala.collection.mutable.Map
      .empty[String, Long].withDefaultValue(0L)
    trainIds.foreach { id =>
      val lang = langs((id % 5).toInt)
      buckets(plantedWords(id)).foreach { b =>
        counts((lang, b)) += 1; totals(lang) += 1
      }
    }
    def wBits(lang: String, b: Int): Long =
      binLen(((counts((lang, b)) + 1L) * 1000000L) / (totals(lang) + 256L))
    val ndt = trainIds.size.toLong
    val priors = langs.map { l =>
      l -> binLen(trainIds.count(id => langs((id % 5).toInt) == l) * 1000000L / ndt)
    }.toMap
    // reference held-out argmax
    val want = docIds.filter(_ % 2 == 1).map { id =>
      val trueLang = langs((id % 5).toInt)
      val hist = buckets(plantedWords(id)).groupBy(identity)
        .map { case (b, xs) => b -> xs.size.toLong }
      val pred = langs.map { cand =>
        cand -> (hist.map { case (b, c) => c * wBits(cand, b) }.sum + priors(cand))
      }.minBy { case (cand, score) => (-score, cand) }._1
      (id, trueLang, pred, pred == trueLang)
    }
    val got = SparkEntry.queries("dx_lang_id_trained")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .toSeq
    assert(got == want, {
      val d1 = got.toSet.diff(want.toSet).take(5)
      val d2 = want.toSet.diff(got.toSet).take(5)
      s"trained lang-ID diverged from the driver reference: got-only=$d1 want-only=$d2"
    })
  }

  test("gate: trained NB beats the anchor-word heuristic on the planted slices") {
    val row = SparkEntry.queries("dx_lang_id_trained_gate")(spark, sfDir).head()
    val (nHeld, trained, heuristic, beats) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getBoolean(3))
    assert(nHeld > 0 && beats, s"trained=$trained heuristic=$heuristic of $nHeld")
    // on disjoint-vocabulary planted text the trained classifier should be
    // near-perfect, not merely better than a collapsed heuristic
    assert(trained * 10 >= nHeld * 8, s"trained accuracy ${trained}/$nHeld below 0.8")
  }
}
