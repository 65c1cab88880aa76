package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §2.2 — the C4 construction filters), applied to a
  * `lines` array column:
  *
  *  - line-level: keep a line iff it does not mention "javascript", ends
  *    in terminal punctuation (`. ! ? "`), and has at least [[minWords]]
  *    words;
  *  - page-level: drop the page iff any line contains "lorem ipsum" or a
  *    curly brace, or fewer than [[minSentences]] lines survive.
  *
  * Dropped-line counters use a fixed precedence (javascript →
  * no-punctuation → too-short) so they partition the dropped lines; the
  * SQL twin in `queries/Pipeline.c4CleanSql` replays the same chain.
  * Everything is per-row higher-order functions over the array — no
  * shuffle, no UDFs — so the operator is map-only at any corpus size.
  */
object C4Rules {

  val minWords = 3
  val minSentences = 5

  private val isJs = "l LIKE '%javascript%'"
  private val endsPunct = """right(l, 1) IN ('.', '!', '?', '"')"""

  /** Adds `kept`, `n_kept`, `has_lorem`, `has_brace`, `doc_keep`,
    * `drop_js`, `drop_nopunct`, `drop_short`, `drop_reason`,
    * `cleaned_md5` derived from the `lines` column.
    */
  def apply(df: DataFrame): DataFrame = df
    .withColumn("kept", expr(
      s"""filter(lines, l -> NOT $isJs AND $endsPunct
         |  AND size(split(l, ' ')) >= $minWords)""".stripMargin))
    .withColumn("n_kept", expr("CAST(size(kept) AS BIGINT)"))
    .withColumn("has_lorem",
      expr("size(filter(lines, l -> l LIKE '%lorem ipsum%')) > 0"))
    .withColumn("has_brace",
      expr("size(filter(lines, l -> l LIKE '%{%')) > 0"))
    .withColumn("doc_keep",
      expr(s"NOT has_lorem AND NOT has_brace AND n_kept >= $minSentences"))
    .withColumn("drop_js",
      expr(s"CAST(size(filter(lines, l -> $isJs)) AS BIGINT)"))
    .withColumn("drop_nopunct", expr(
      s"CAST(size(filter(lines, l -> NOT $isJs AND NOT $endsPunct)) AS BIGINT)"))
    .withColumn("drop_short", expr(
      s"""CAST(size(filter(lines, l -> NOT $isJs AND $endsPunct
         |  AND size(split(l, ' ')) < $minWords)) AS BIGINT)""".stripMargin))
    .withColumn("drop_reason", expr(
      s"""CASE WHEN has_lorem THEN 'lorem_ipsum'
         |  WHEN has_brace THEN 'brace'
         |  WHEN n_kept < $minSentences THEN 'too_few_sentences'
         |  ELSE '' END""".stripMargin))
    .withColumn("cleaned_md5",
      expr("IF(doc_keep, md5(array_join(kept, '\\n')), CAST(NULL AS STRING))"))
}
