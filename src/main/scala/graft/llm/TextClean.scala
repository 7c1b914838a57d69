package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * HTML-to-text boilerplate stripping — the pre-cleaning stage every
 * crawled corpus runs before quality scoring, dedup, or tokenization
 * (C4/CCNet operate on extracted text, not markup; leaving tags in
 * poisons n-gram stats and inflates token counts):
 *
 *  1. `<script>`/`<style>` blocks drop WITH their contents (code and
 *     CSS are not prose) — each via its own lazy block regex so a
 *     stray `</style>` can never close a `<script>`;
 *  2. comments (`<!-- -->`) drop;
 *  3. remaining tags become single spaces (a space, not "", so
 *     `a</p><p>b` stays two words);
 *  4. the six entities that survive in extracted prose decode by
 *     LITERAL replace (`&amp;` strictly last, so `&amp;lt;` decodes to
 *     the text "&lt;" and not a phantom "<");
 *  5. whitespace collapses and trims.
 *
 * Everything is a codegen'd Column chain — regexp_replace + replace +
 * trim, zero shuffle, zero UDF, null-preserving — and every pattern is
 * chosen inside the Java-regex ∩ RE2 common subset (lazy quantifiers,
 * `[^>]` classes, inline `(?is)`; never `\x0B`-bearing escapes whose
 * engine definitions differ), so the oracle runs the identical chain
 * verbatim in DuckDB (pq68). An unclosed `<script>` block degrades
 * gracefully: the block regex doesn't fire, the tag stripper still
 * removes the opening tag, and the script text survives as prose for
 * the downstream quality gate to reject.
 */
object TextClean {

  /** The cleaning chain as a reusable Column expression. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = replace(
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
          "&#39;" -> "'", "&nbsp;" -> " ")
        .foldLeft(noTags) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) },
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** (idCol, text): the extracted prose of `htmlCol`; null in, null
    * out. A filter on top of the scan — compose with
    * [[TextAnalysis.qualityGate]] / [[Dedup]] directly. */
  def stripHtml(df: DataFrame, idCol: String, htmlCol: String,
      ordered: Boolean = true): DataFrame =
    df.select(col(idCol), htmlToText(col(htmlCol)).as("text"))
      .transform(Presented(_, ordered, idCol))
}
