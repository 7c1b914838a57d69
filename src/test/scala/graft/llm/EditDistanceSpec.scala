package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * PassJoin edit-distance near-dup laws (the full fixture is
 * oracle-pinned in pq70):
 *
 *  - EXACTNESS vs an independent driver-side brute force over the
 *    corpus — the segment join must have NO false negatives (the
 *    pigeonhole + window soundness claim) and the verify no false
 *    positives;
 *  - every edit kind at distance boundaries: substitution, insertion,
 *    deletion, transposition (= 2 ops), and a 3-op pair that must NOT
 *    appear;
 *  - degenerate tiny/empty strings still verify exactly;
 *  - determinism across partitionings.
 */
class EditDistanceSpec extends AnyFunSuite {
  import TestSpark.spark

  /** Textbook DP levenshtein — the independent referee. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def run(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    val df = spark.createDataFrame(rows).toDF("id", "s")
    EditDistance.nearDupPairs(df, "id", "s", maxDist, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def brute(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      d = lev(sa, sb)
      if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet

  test("exactly the brute-force pairs on the corpus prefixes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").substr(
        lit(1), (lit(8) + pmod(col("doc_id"), lit(12))).cast("int")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(run(docs, 2) == brute(docs, 2))
  }

  test("each edit kind at the boundary; 3 ops excluded at maxDist 2") {
    val rows = Seq(
      (1L, "abcdefgh"), (2L, "abXdefgh"),   // substitution: 1
      (3L, "abcdefghZ"), (4L, "bcdefgh"),   // insert: 1 (vs 1); delete: 1 (vs 1)
      (5L, "abdcefgh"),                     // transposition: 2
      (6L, "XYZdefgh"))                     // 3 substitutions: out
    val got = run(rows, 2)
    assert(got == brute(rows, 2))
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)) &&
      got.contains((1L, 4L, 1L)) && got.contains((1L, 5L, 2L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 6L))
  }

  test("tiny and empty strings verify exactly") {
    val rows = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"), (5L, "xy"))
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("deterministic across partitionings") {
    val rows = (0L until 60L).map(i => i -> s"prefix-${i % 7}-common-tail")
    val df13 = spark.createDataFrame(rows).toDF("id", "s").repartition(13)
    val got13 = EditDistance.nearDupPairs(df13, "id", "s", 2, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got13 == run(rows, 2) && got13 == brute(rows, 2))
  }
}
