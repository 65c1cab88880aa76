package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Main-content extraction from HTML — the boilerplate-removal step every
  * web-corpus pipeline runs before quality filtering (the jusText /
  * trafilatura shape: strip non-content containers, then keep text blocks
  * whose LINK DENSITY is low enough to be prose rather than navigation).
  *
  * The whole operator is one codegen'd per-row expression chain — regex
  * extraction + higher-order functions, no UDFs, no shuffles — and every
  * decision value is integer (the density test is cross-multiplied:
  * `1000·anchor_chars ≤ threshold·text_chars`), so a SQL oracle replays
  * it exactly.
  *
  * Block model: `<p …>…</p>` segments are candidate blocks. Per block:
  * tags are replaced by spaces and whitespace collapsed (the visible
  * text), anchor text is the concatenation of `<a …>…</a>` inner bodies;
  * a block survives if its anchor-to-text ratio is at most
  * `maxLinkPermille` AND it has at least `minWords` words. `<script>` /
  * `<style>` containers are dropped wholesale first (their bodies are
  * code, not text — and may legally contain `<`).
  */
object HtmlExtract {

  val maxLinkPermille = 340L
  val minWords = 3

  /** Adds `blocks` (struct array: visible text + anchor chars), `n_blocks`,
    * `n_kept`, `main_text` columns derived from `htmlCol`.
    */
  def extract(df: DataFrame, htmlCol: String): DataFrame = {
    val noCode =
      s"""regexp_replace(regexp_replace($htmlCol,
         |  '<script[^>]*>.*?</script>', ''), '<style[^>]*>.*?</style>', '')"""
        .stripMargin
    df
      .withColumn("blocks", expr(
        s"""transform(regexp_extract_all($noCode, '<p[^>]*>(.*?)</p>', 1),
           |  b -> struct(
           |    trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' '), ' +', ' '))
           |      AS t,
           |    length(array_join(regexp_extract_all(b, '<a[^>]*>(.*?)</a>', 1), ''))
           |      AS al))""".stripMargin))
      .withColumn("kept", expr(
        s"""filter(blocks, x ->
           |  1000 * x.al <= $maxLinkPermille * greatest(1, length(x.t))
           |  AND size(split(x.t, ' ')) >= $minWords)""".stripMargin))
      .withColumn("n_blocks", expr("CAST(size(blocks) AS BIGINT)"))
      .withColumn("n_kept", expr("CAST(size(kept) AS BIGINT)"))
      .withColumn("main_text", expr("array_join(transform(kept, x -> x.t), '\\n')"))
      .drop("kept")
  }

  /** The matching extraction in DuckDB SQL over a column expression —
    * kept next to the operator so the two regex chains stay in lockstep.
    * Returns (n_blocks, n_kept, main_text) SQL snippets over `htmlExpr`.
    */
  def duckSnippets(htmlExpr: String): (String, String, String) = {
    val noCode =
      s"""regexp_replace(regexp_replace($htmlExpr,
         |  '<script[^>]*>.*?</script>', '', 'g'), '<style[^>]*>.*?</style>', '', 'g')"""
        .stripMargin
    val blocks =
      s"""list_transform(regexp_extract_all($noCode, '<p[^>]*>(.*?)</p>', 1),
         |  b -> struct_pack(
         |    t := trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'),
         |      ' +', ' ', 'g')),
         |    al := length(coalesce(list_aggregate(
         |      regexp_extract_all(b, '<a[^>]*>(.*?)</a>', 1), 'string_agg', ''),
         |      ''))))""".stripMargin
    val kept =
      s"""list_filter($blocks, x ->
         |  1000 * x.al <= $maxLinkPermille * greatest(1, length(x.t))
         |  AND len(string_split(x.t, ' ')) >= $minWords)""".stripMargin
    (s"len($blocks)", s"len($kept)",
      s"""coalesce(list_aggregate(list_transform($kept, x -> x.t),
         |  'string_agg', chr(10)), '')""".stripMargin)
  }
}
