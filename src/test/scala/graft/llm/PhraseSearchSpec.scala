package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Phrase-search laws (the corpus fixture is oracle-pinned in pq78):
 * agreement with a brute-force token-run referee on both the pruned
 * (>= shingleN tokens) and scan (short phrase) paths, absent-phrase
 * emptiness, multi-occurrence docs reported once, and token-boundary
 * strictness (no substring false positives).
 */
class PhraseSearchSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def brute(phrase: String): Set[Long] = {
    val p = TextOps.tokensJvm(phrase).filter(_.nonEmpty).toSeq
    docs.filter(col("text").isNotNull).collect().flatMap { r =>
      val t = TextOps.tokensJvm(r.getString(r.fieldIndex("text"))).filter(_.nonEmpty).toSeq
      if (t.indexOfSlice(p) >= 0) Some(r.getLong(r.fieldIndex("doc_id"))) else None
    }.toSet
  }

  private def run(phrases: Seq[String]): Map[String, Set[Long]] =
    PhraseSearch.find(docs, "doc_id", "text", phrases, ordered = false)
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

  test("pruned and scan paths both match the brute-force token-run referee") {
    val t0 = docs.filter(col("text").isNotNull).orderBy("doc_id")
      .select("text").limit(1).collect()(0).getString(0)
    val toks = TextOps.tokensJvm(t0).filter(_.nonEmpty)
    val long = toks.take(4).mkString(" ")  // pruned path
    val short = toks.take(1).mkString(" ") // forces the scan path
    val got = run(Seq(long, short, "zq1 zq2 zq3"))
    assert(got(long) == brute(long) && got(long).nonEmpty)
    assert(got(short) == brute(short) && got(short).nonEmpty)
    assert(!got.contains("zq1 zq2 zq3"), "absent phrase matches nothing")
  }

  test("token boundaries are strict; multi-occurrence docs report once") {
    val rows = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "xalpha beta gammay"),       // substring, not a token run
      (3L, "alpha beta gamma alpha beta gamma"), // twice -> one row
      (4L, "beta alpha gamma"))          // right tokens, wrong order
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val got = PhraseSearch.find(df, "doc_id", "text", Seq("alpha beta gamma"),
        ordered = false)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == Set(("alpha beta gamma", 1L), ("alpha beta gamma", 3L)))
    assert(got.length == 2, "each (phrase, doc) reported exactly once")
  }
}
