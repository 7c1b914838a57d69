package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over a document corpus: corpus statistics,
 * per-document quality scoring, stopword-profile language ID, and
 * bottom-k fingerprints. All are single-pass: per-row projections plus at
 * most one hash aggregation — the shapes that scale to 100 TB unchanged
 * (the aggregations are partial/map-side combinable; nothing collects to
 * the driver).
 */
object TextAnalysis {

  /** Token count of a text column (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(TextOps.tokens(text)).cast("long")

  /**
   * Per-language corpus statistics: doc count, total/avg chars, total/max
   * tokens. One hash aggregation on the language key.
   */
  def corpusStats(df: DataFrame, langCol: String, charsCol: String, textCol: String): DataFrame =
    df.select(col(langCol).as("lang"), col(charsCol).as("n_chars"),
        tokenCount(col(textCol)).as("n_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        round(avg("n_chars"), 2).as("avg_chars"),
        sum("n_tokens").as("total_tokens"),
        max("n_tokens").as("max_tokens"))
      .orderBy("lang")

  /**
   * Per-document quality metrics: token count, distinct-token count,
   * type-token ratio, stopword ratio, mean word length. Pure projection.
   * Low TTR flags boilerplate/repetition; abnormal stopword ratio or word
   * length flags non-prose — the standard cheap quality gates applied
   * before expensive pipeline stages.
   */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), toks.as("_t"))
      .select(
        col("doc_id"),
        size(col("_t")).cast("long").as("n_tokens"),
        size(array_distinct(col("_t"))).cast("long").as("n_types"),
        round(size(array_distinct(col("_t"))).cast("double") / size(col("_t")), 3).as("ttr"),
        round(size(filter(col("_t"), w => w.isin(stopwords.map(lit): _*)))
          .cast("double") / size(col("_t")), 3).as("stop_ratio"),
        round(aggregate(col("_t"), lit(0L), (acc, w) => acc + length(w))
          .cast("double") / size(col("_t")), 3).as("mean_wlen"))
      .orderBy("doc_id")
  }

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "in")

  /**
   * Stopword-profile language ID: score each candidate language by hits
   * from its function-word list; highest score wins, ties broken by list
   * order. A cheap n-gram-free heuristic that runs as a projection; for
   * production language ID swap in char-n-gram profiles via the same
   * shape (score columns + greatest()).
   */
  def langIdExpr(toks: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = profiles.map { case (lang, words) =>
      lang -> size(filter(toks, w => w.isin(words.map(lit): _*)))
    }
    // tie-break by profile order: lang i wins if score_i >= max(later scores)
    scores.init.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, score), i), elseExpr) =>
        val rest = scores.drop(i + 1).map(_._2)
        val maxRest = if (rest.sizeIs == 1) rest.head else greatest(rest: _*)
        when(score >= maxRest, lit(lang)).otherwise(elseExpr)
    }
  }

  val DefaultLangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "les", "une"))

  /** Language distribution of a corpus under [[langIdExpr]]. */
  def langDistribution(df: DataFrame, textCol: String,
      profiles: Seq[(String, Seq[String])] = DefaultLangProfiles): DataFrame =
    df.select(langIdExpr(TextOps.tokens(col(textCol)), profiles).as("predicted_lang"))
      .groupBy("predicted_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("predicted_lang")

  /**
   * Per-document bottom-k fingerprint over word bigram shingles (docs with
   * < 2 tokens are skipped). Projection-only; see [[TextOps.bottomKSketch]].
   */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, k: Int = 4): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), toks.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("doc_id"),
        TextOps.bottomKSketch(TextOps.shingles(col("_t"), 2), k).as("fingerprint"))
      .orderBy("doc_id")
  }
}
