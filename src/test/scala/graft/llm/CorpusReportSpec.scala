package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Corpus-report laws (arithmetic is oracle-pinned in pq88):
 *
 *  - CLOSED FORM: exact values on a hand corpus covering nulls, empty
 *    text, exact duplicates, and a skewed source spread.
 *  - FIXED ROW SET: the metric set never varies with the data or the
 *    optional source column (absent source → 0.0 fills).
 *  - DETERMINISM: identical across partitionings (all metrics are
 *    exact counts or single exact divisions under rounding).
 */
class CorpusReportSpec extends AnyFunSuite {
  import TestSpark.spark

  private def corpus = TestSpark.df("doc_id bigint, text string, source string", Seq(
    Row(1L, "a b c", "web"), // 3 tokens
    Row(2L, "a b c", "web"), // exact dup of 1
    Row(3L, "d e", "web"),
    Row(4L, "", "books"), // empty: 0 tokens, still a content ("" hash)
    Row(5L, "   ", "books"), // whitespace-only: 0 tokens
    Row(6L, null, null))) // null text, null source

  private def run(src: Option[String]): Map[String, Double] =
    CorpusReport.report(corpus, "doc_id", "text", src, ordered = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("closed form on a hand corpus; fixed metric set; source fills") {
    val m = run(Some("source"))
    assert(m.keySet == CorpusReport.Metrics.toSet)
    assert(m("n_docs") == 6.0)
    assert(m("n_null_text") == 1.0)
    assert(m("n_empty_text") == 2.0) // "" and "   " both tokenize empty
    assert(m("n_tokens") == 8.0) // 3 + 3 + 2
    assert(m("avg_tokens_per_doc") == 1.6) // 8 / 5 text docs
    // contents: "a b c" (x2 → 1), "d e", "", "   " → 4 distinct
    assert(m("n_distinct_contents") == 4.0)
    assert(m("exact_dup_rate") == 0.2) // (5 - 4) / 5
    assert(m("n_sources") == 2.0)
    assert(m("max_source_share") == 0.5) // web 3 of 6
    // without a source column the row set is unchanged, spread zeroes
    val m2 = run(None)
    assert(m2.keySet == CorpusReport.Metrics.toSet)
    assert(m2("n_sources") == 0.0 && m2("max_source_share") == 0.0)
    assert(m2("n_docs") == 6.0 && m2("exact_dup_rate") == 0.2)
  }

  test("identical across partitionings") {
    val a = CorpusReport.report(corpus.repartition(1), "doc_id", "text",
      Some("source"), ordered = false).collect().map(_.toSeq).toSet
    val b = CorpusReport.report(corpus.repartition(5), "doc_id", "text",
      Some("source"), ordered = false).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("approx mode: same fixed row set, exact metrics untouched, distinct metrics within HLL++ tolerance, and NO expand-mode replay in the plan") {
    val a = CorpusReport.report(corpus, "doc_id", "text", Some("source"),
      ordered = false, approx = true)
    val m = a.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet == CorpusReport.Metrics.toSet,
      "dashboards must key identically on either mode")
    // non-distinct metrics are EXACT in approx mode too
    assert(m("n_docs") == 6.0 && m("n_null_text") == 1.0 &&
      m("n_empty_text") == 2.0 && m("n_tokens") == 8.0 &&
      m("avg_tokens_per_doc") == 1.6 && m("max_source_share") == 0.5)
    // distinct-derived metrics bounded by the rsd (generous 4-sigma
    // band — tiny-cardinality HLL++ is exact in practice, but the law
    // is the bound, not the luck)
    assert(math.abs(m("n_distinct_contents") - 4.0) <= 4.0 * 0.05 * 4.0)
    assert(math.abs(m("n_sources") - 2.0) <= 2.0 * 0.05 * 4.0)
    assert(m("exact_dup_rate") >= 0.0, "HLL overestimate must clamp, never report negative dup")
    // THE SCALE POINT: exact mode's two count_distincts plan as expand
    // mode (the corpus pass replayed per distinct column); approx mode
    // must plan WITHOUT an Expand — one non-replayed pass
    // logical plan, not executedPlan: AQE wraps the physical tree and
    // hides the ExpandExec from a pre-execution traversal
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Expand])
    assert(hasExpand(CorpusReport.report(corpus, "doc_id", "text",
      Some("source"), ordered = false)),
      "exact mode is expected to pay expand — if this stops holding, re-examine the approx default")
    assert(!hasExpand(a), "approx mode must not replay the corpus pass (no Expand)")
  }

  test("degenerate corpora: all-null and empty inputs report zeros, not NaN/null") {
    val allNull = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, null), Row(2L, null)))
    val m = CorpusReport.report(allNull, "doc_id", "text", None, ordered = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == 2.0 && m("n_null_text") == 2.0)
    assert(m("avg_tokens_per_doc") == 0.0 && m("exact_dup_rate") == 0.0)
    val empty = allNull.filter(org.apache.spark.sql.functions.col("doc_id") < 0)
    val me = CorpusReport.report(empty, "doc_id", "text", None, ordered = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(me.keySet == CorpusReport.Metrics.toSet)
    assert(me.values.forall(_ == 0.0))
  }
}
