package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bottom-k corpus-similarity laws (the sketch table is oracle-pinned in
 * pq77):
 *
 *  - EXACTNESS when sketches cover the sets: with k above every
 *    source's distinct-shingle count the estimate IS true Jaccard;
 *  - estimator accuracy at truncating k (within the ~1/sqrt(k) band);
 *  - identical sources estimate 1.0, disjoint sources 0.0;
 *  - determinism across partitionings; at most k rows per source.
 */
class CorpusSimilaritySpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** True shingle Jaccard between two sources, computed brutally. */
  private def trueJaccard(df: org.apache.spark.sql.DataFrame,
      a: String, b: String): Double = {
    def set(src: String): Set[String] = df.filter(col("source") === src)
      .filter(col("text").isNotNull).collect()
      .flatMap { r =>
        val t = TextOps.tokensJvm(r.getString(r.fieldIndex("text")))
        if (t.length < 3) Seq.empty[String]
        else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").distinct.toSeq
      }.toSet
    val (sa, sb) = (set(a), set(b))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("exact at covering k; 1.0 for identical sources; 0.0 for disjoint") {
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon", "s1"),
      (2L, "alpha beta gamma delta epsilon", "s2"), // identical content
      (3L, "one two three four five six", "s3"))    // disjoint
    val df = spark.createDataFrame(rows).toDF("doc_id", "text", "source")
    val sk = CorpusSimilarity.sourceSketches(df, "source", "text", 3, k = 100,
      ordered = false)
    val rep = CorpusSimilarity.similarityReport(sk, 100)
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(rep(("s1", "s2")) == 1.0)
    assert(rep(("s1", "s3")) == 0.0 && rep(("s2", "s3")) == 0.0)
  }

  test("covering-k estimates equal true Jaccard on the corpus sources") {
    val sk = CorpusSimilarity.sourceSketches(docs, "source", "text", 3,
      k = 100000, ordered = false)
    val rep = CorpusSimilarity.similarityReport(sk, 100000)
    assert(rep.nonEmpty)
    rep.foreach { case (a, b, est) =>
      val truth = trueJaccard(docs, a, b)
      assert(math.abs(est - truth) < 1e-12, s"($a, $b): est $est vs true $truth")
    }
  }

  test("truncating-k estimate lands in the error band; k bounds the sketch") {
    val k = 128
    val sk = CorpusSimilarity.sourceSketches(docs, "source", "text", 3, k,
      ordered = false)
    val perSource = sk.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(perSource.values.forall(_ <= k))
    val rep = CorpusSimilarity.similarityReport(sk, k)
    rep.foreach { case (a, b, est) =>
      val truth = trueJaccard(docs, a, b)
      // 4-sigma of the bottom-k estimator's ~sqrt(J(1-J)/k) deviation,
      // floored for the tiny-J corner
      val tol = math.max(4 * math.sqrt(math.max(truth * (1 - truth), 0.01) / k), 0.05)
      assert(math.abs(est - truth) <= tol, s"($a, $b): est $est vs true $truth (tol $tol)")
    }
  }

  test("sketches are partitioning-invariant") {
    def m(parts: Int): Set[(String, String)] =
      CorpusSimilarity.sourceSketches(docs.repartition(parts), "source", "text",
          3, 32, ordered = false)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m(1) == m(13))
  }
}
