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

  test("rrfFuse closed form: hand-computed fusion, agreement count, single-list candidates, tie to lower cid") {
    // two rank lists for one query: docs 10/11 in both (different
    // ranks), 12 only in list A, 13 only in list B
    val a = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 10L, 1L), Row(1L, 11L, 2L), Row(1L, 12L, 3L)))
    val b = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 11L, 1L), Row(1L, 10L, 2L), Row(1L, 13L, 3L)))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 4, c = 60, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(_._2)
    def rr(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 10: 1/61 + 1/62; 11: 1/62 + 1/61 — IDENTICAL fused score, tie
    // breaks to the lower cid; 12: 1/63; 13: 1/63 — same score again,
    // cid order
    assert(got.toSeq == Seq(
      (1L, 1L, 10L, rr(1, 2), 2L),
      (1L, 2L, 11L, rr(1, 2), 2L),
      (1L, 3L, 12L, rr(3), 1L),
      (1L, 4L, 13L, rr(3), 1L)))
  }

  test("rrfFuse: k bound respected per query, >= 2 lists enforced, three-list fold is partitioning-invariant") {
    val a = TestSpark.df("qid bigint, cid bigint, rnk bigint",
      (1 to 10).map(i => Row(1L, i.toLong, i.toLong)) ++
        (1 to 10).map(i => Row(2L, (100 + i).toLong, i.toLong)))
    val b = TestSpark.df("qid bigint, cid bigint, rnk bigint",
      (1 to 10).map(i => Row(1L, (11 - i).toLong, i.toLong)))
    val c3 = TestSpark.df("qid bigint, cid bigint, rnk bigint",
      (1 to 10).map(i => Row(1L, i.toLong, ((i * 7) % 10 + 1).toLong)))
    val fused = Retrieval.rrfFuse(Seq(a, b, c3), k = 3, ordered = false).collect()
    assert(fused.count(_.getLong(0) == 1L) == 3 &&
      fused.count(_.getLong(0) == 2L) == 3)
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), k = 3) }
    // sorted-fold determinism: identical bits under repartitioning
    def run(parts: Int) = Retrieval.rrfFuse(
      Seq(a.repartition(parts), b.repartition(parts), c3.repartition(parts)),
      k = 10, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(run(1) == run(13))
  }

  test("evalRanking closed form: recall/RR/NDCG hand-computed; rnk > k ignored; zero-hit and no-result queries score 0; duplicate truth deduped") {
    val results = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 10L, 1L), Row(1L, 99L, 2L), Row(1L, 11L, 3L),
      Row(1L, 98L, 4L), Row(1L, 97L, 5L),
      Row(1L, 12L, 6L), // a hit BEYOND k — must not count at k = 5
      Row(2L, 77L, 1L), Row(2L, 78L, 2L))) // no relevant results
    val truth = TestSpark.df("qid bigint, cid bigint", Seq(
      Row(1L, 10L), Row(1L, 11L), Row(1L, 12L), Row(1L, 10L), // dup row
      Row(2L, 20L),
      Row(3L, 30L))) // query with truth but NO results at all
    val got = Retrieval.evalRanking(results, truth, k = 5, ordered = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def g(rank: Int) = math.log(2.0) / math.log(1.0 + rank)
    // q1: hits at ranks 1 and 3 (the rank-6 hit is past k), 3 truth
    val ndcg1 = (g(1) + g(3)) / (g(1) + g(2) + g(3))
    assert(got(1L) == ((3L, 2L, r6(2.0 / 3), 1.0, r6(ndcg1))))
    assert(got(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(got.size == 3, "one row per qid IN TRUTH, nothing else")
  }

  test("duplicate-candidate inputs are min-rank deduped: evalRanking never exceeds 1.0, rrfFuse counts a list once") {
    // cid 10 relevant and listed at ranks 1 AND 3 (an upstream union
    // that skipped its own dedup): it must count as ONE hit at rank 1,
    // not inflate n_hits/recall/ndcg past their 1.0 ceilings
    val dupRes = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 10L, 1L), Row(1L, 10L, 3L)))
    val truth = TestSpark.df("qid bigint, cid bigint", Seq(Row(1L, 10L)))
    val got = Retrieval.evalRanking(dupRes, truth, k = 5, ordered = false)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 1L, 1.0, 1.0, 1.0)))
    // one list carrying cid 10 twice: contributes 1/(60+1) ONCE (best
    // rank), and n_lists stays at the true list count 2
    val a = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 10L, 1L), Row(1L, 10L, 2L)))
    val b = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 10L, 1L)))
    val fused = Retrieval.rrfFuse(Seq(a, b), k = 3, c = 60, ordered = false)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getLong(4)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused.toSeq == Seq((10L, r6(2.0 / 61), 2L)))
  }

  test("hardNegatives: positives excluded, skipTop drops the head, unlabeled queries unmined, dense neg_rank; bad knobs refuse") {
    val results = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 10L, 1L), // positive at rank 1 — skipped by skipTop anyway
      Row(1L, 50L, 2L), // negative
      Row(1L, 11L, 3L), // positive — never mined
      Row(1L, 51L, 4L), // negative
      Row(1L, 52L, 5L),
      Row(1L, 53L, 6L), // beyond k
      Row(9L, 70L, 1L), Row(9L, 71L, 2L))) // qid 9 has NO truth — unmined
    val truth = TestSpark.df("qid bigint, cid bigint", Seq(
      Row(1L, 10L), Row(1L, 11L)))
    val got = Retrieval.hardNegatives(results, truth, k = 5, skipTop = 1,
      ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    assert(got.toSeq == Seq((1L, 50L, 2L, 1L), (1L, 51L, 4L, 2L),
      (1L, 52L, 5L, 3L)))
    // skipTop = 0 keeps a rank-1 NEGATIVE but still never mines positives
    val all = Retrieval.hardNegatives(results, truth, k = 5, ordered = false)
      .collect().map(_.getLong(1)).toSet
    assert(all == Set(50L, 51L, 52L))
    intercept[IllegalArgumentException] {
      Retrieval.hardNegatives(results, truth, k = 5, skipTop = 5)
    }
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
