package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** The Gopher/MassiveText quality-rule battery (Rae et al. 2021,
  * Table A1), applied to a `lines` array column. Every ratio is an
  * integer permille (or centi) via truncating division, so a SQL oracle
  * replays the battery bit-exactly; the top-2-gram character fraction
  * uses the standard `count × gram length` approximation (overlaps
  * double-counted), with ties broken toward the lexicographically
  * smallest gram (min over `(-count, gram)` structs). Map-only per-row
  * higher-order functions throughout — no shuffle, no UDFs.
  */
object GopherRules {

  val stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Adds the metric and `gopher_pass` columns derived from `lines`. */
  def apply(df: DataFrame): DataFrame = df
    .withColumn("full", expr("array_join(lines, ' ')"))
    .withColumn("words", expr("split(full, ' ')"))
    .withColumn("n_words", expr("CAST(size(words) AS BIGINT)"))
    .withColumn("n_lines", expr("CAST(size(lines) AS BIGINT)"))
    .withColumn("n_chars", expr("CAST(length(full) AS BIGINT)"))
    .withColumn("mwl_centi", expr(
      "100 * aggregate(words, 0L, (a, w) -> a + length(w)) DIV n_words"))
    .withColumn("symbol_permille", expr(
      """1000 * (size(filter(words, w -> w = '#'))
        |  + (length(full) - length(replace(full, '...', ''))) DIV 3)
        |  DIV n_words""".stripMargin))
    .withColumn("bullet_permille",
      expr("1000 * size(filter(lines, l -> l LIKE '- %')) DIV n_lines"))
    .withColumn("ellipsis_permille",
      expr("1000 * size(filter(lines, l -> l LIKE '%...')) DIV n_lines"))
    .withColumn("alpha_permille", expr(
      "1000 * size(filter(words, w -> w RLIKE '[a-z]')) DIV n_words"))
    .withColumn("stop_hits", expr(
      s"""CAST(size(filter(
         |  array(${stopwords.map(w => s"'$w'").mkString(",")}),
         |  sw -> array_contains(words, sw))) AS BIGINT)""".stripMargin))
    .withColumn("dup_line_permille", expr(
      "1000 * (n_lines - size(array_distinct(lines))) DIV n_lines"))
    .withColumn("dup_line_char_permille", expr(
      """1000 * (aggregate(lines, 0L, (a, l) -> a + length(l))
        |  - aggregate(array_distinct(lines), 0L, (a, l) -> a + length(l)))
        |  DIV aggregate(lines, 0L, (a, l) -> a + length(l))""".stripMargin))
    .withColumn("grams", expr(
      // guard: Spark's sequence(1, 0) DESCENDS, so a 1-word page needs an
      // explicit empty gram list (top2gram columns then go NULL)
      """IF(size(words) < 2, CAST(array() AS ARRAY<STRING>),
        |  transform(sequence(1, size(words) - 1),
        |    i -> concat(element_at(words, i), ' ', element_at(words, i + 1))))"""
        .stripMargin))
    .withColumn("top", expr(
      """array_min(transform(array_distinct(grams),
        |  g -> named_struct('nc', -size(filter(grams, x -> x = g)), 'g', g)))"""
        .stripMargin))
    .withColumn("top2gram", col("top.g"))
    .withColumn("top2gram_char_permille", expr(
      "1000 * (CAST(-top.nc AS BIGINT) * length(top.g)) DIV n_chars"))
    .withColumn("gopher_pass", expr(
      """n_words BETWEEN 50 AND 100000 AND mwl_centi BETWEEN 300 AND 1000
        |AND symbol_permille <= 100 AND bullet_permille <= 900
        |AND ellipsis_permille <= 300 AND alpha_permille >= 800
        |AND stop_hits >= 2 AND dup_line_permille <= 300
        |AND dup_line_char_permille <= 200
        |AND top2gram_char_permille <= 200""".stripMargin))
}
