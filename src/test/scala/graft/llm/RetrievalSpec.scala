package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * BM25 retrieval laws (score arithmetic is oracle-pinned in pq86):
 *
 *  - CLOSED FORM: exact hand computation on a corpus covering tf > 1,
 *    df variation, and length normalization.
 *  - TOP-K: bm25TopK is exactly bm25Scores sorted (score desc, id asc)
 *    head-k, ranks 1..k.
 *  - DETERMINISM: bit-identical across partitionings (term-sorted fold).
 *  - EDGES: all-absent terms → empty; matching is case-folded; blank
 *    term lists refuse.
 */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark.spark

  private def corpus = TestSpark.df("doc_id bigint, text string", Seq(
    Row(1L, "scan scan merge"), // tf(scan)=2, len 3
    Row(2L, "scan sort sort sort sort sort"), // len 6 — length-penalized
    Row(3L, "merge only here"),
    Row(4L, "nothing relevant"),
    Row(5L, null)))

  test("closed form: exact BM25 on a hand corpus") {
    val got = Retrieval.bm25Scores(corpus, "doc_id", "text",
      Seq("scan", "merge"), ordered = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // N = 4 docs with text; avgdl = (3 + 6 + 3 + 2) / 4 = 3.5
    val (n, avg, k1, b) = (4.0, 3.5, 1.2, 0.75)
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Double, dl: Double) =
      tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avg))
    // df(scan)=2 (docs 1, 2); df(merge)=2 (docs 1, 3)
    val e1 = idf(2) * tfn(2, 3) + idf(2) * tfn(1, 3)
    val e2 = idf(2) * tfn(1, 6)
    val e3 = idf(2) * tfn(1, 3)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == 2L && math.abs(got(1L)._2 - e1) < 1e-12)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - e2) < 1e-12)
    assert(got(3L)._1 == 1L && math.abs(got(3L)._2 - e3) < 1e-12)
    // two matched terms outrank one; short doc outranks length-penalized
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("topK == scores sorted head-k with ranks 1..k; heap path used") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("scan", "merge", "window")
    val scores = Retrieval.bm25Scores(docs, "doc_id", "text", terms, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = scores.sortBy { case (id, _, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, m, s), i) => (i + 1L, id, m, s) }.toSeq
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // the plan takes the TakeOrderedAndProject shape, never a full sort
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must heap, not sort:\n$plan")
  }

  test("scores are bit-identical across partitionings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25Scores(df, "doc_id", "text", Seq("scan", "merge"),
        ordered = false)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
  }

  test("edges: absent terms -> empty; case-folded matching; blank terms refuse") {
    assert(Retrieval.bm25Scores(corpus, "doc_id", "text",
      Seq("zzabsent"), ordered = false).count() == 0)
    val folded = Retrieval.bm25Scores(corpus, "doc_id", "text",
      Seq("SCAN"), ordered = false).collect()
    assert(folded.map(_.getLong(0)).toSet == Set(1L, 2L),
      "query terms must match case-insensitively")
    intercept[IllegalArgumentException] {
      Retrieval.bm25Scores(corpus, "doc_id", "text", Seq("  ", ""))
    }
  }
}
