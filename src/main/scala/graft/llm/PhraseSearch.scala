package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Corpus phrase search — "which documents contain this exact phrase" —
 * the audit primitive behind memorization checks ("does the corpus
 * contain this eval answer verbatim"), takedown/compliance sweeps, and
 * quote tracing. Match semantics are TOKEN-RUN containment (the phrase's
 * whitespace tokens appear contiguously in the document's token
 * stream), the same normalization the dedup/decontamination tiers use —
 * raw-substring matching would false-positive across token boundaries
 * and false-negative on whitespace differences.
 *
 * Scale shape: a phrase long enough to carry a word shingleN-gram is
 * PRUNED through the shingle index — docs that lack the phrase's first
 * n-gram hash cannot contain it (contiguity), so only docs sharing
 * that 8-byte key (typically a handful at any corpus size for a
 * specific phrase) are verified; the phrase keys ride a broadcast
 * `isin` filter on the typed index pass, then one distinct + one
 * semi-join recover candidate texts, and verification is a codegen'd
 * `contains` against the broadcast phrase list. Phrases shorter than
 * shingleN tokens cannot be pruned and force a full-scan verify (the
 * production reality — a one-word "search" is a scan); they are
 * accepted but documented as the expensive path.
 */
object PhraseSearch {

  /** (phrase, doc_id) for every phrase occurring as a token run in the
    * document; phrases are reported in their token-normalized form.
    * Null texts match nothing; duplicate/empty phrases are dropped. */
  def find(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String], shingleN: Int = 3,
      ordered: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    val normalized = phrases.map(p => TextOps.tokensJvm(p).filter(_.nonEmpty))
      .filter(_.nonEmpty).map(_.toSeq).distinct
    require(normalized.nonEmpty, "find: need at least one non-empty phrase")
    val (prunable, scanOnly) = normalized.partition(_.length >= shingleN)

    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).cast("string").as("_ps_text"))
      .filter(col("doc_id").isNotNull && col("_ps_text").isNotNull)
    val candidates =
      if (scanOnly.nonEmpty) base // a short phrase forces the scan anyway
      else {
        val keys = prunable
          .map(toks => TextOps.shingleHashesJvm(toks.take(shingleN).toArray, shingleN)(0))
        val hit = TextOps.shingleIndex(base, "doc_id", "_ps_text", shingleN)
          .filter(col("_sh").isin(keys: _*))
          .select(col("_id").as("doc_id")).distinct()
        base.join(hit, "doc_id")
      }

    import spark.implicits._
    val phraseDf = normalized.map(_.mkString(" ")).toDF("phrase")
    val ntext = concat(lit(" "),
      array_join(filter(TextOps.tokens(col("_ps_text")), w => w =!= ""), " "),
      lit(" "))
    candidates
      .select(col("doc_id"), ntext.as("_ps_n"))
      .crossJoin(broadcast(phraseDf))
      .filter(col("_ps_n").contains(concat(lit(" "), col("phrase"), lit(" "))))
      .select("phrase", "doc_id")
      .transform(Presented(_, ordered, "phrase", "doc_id"))
  }
}
