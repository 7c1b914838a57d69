package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Sequential-Poisson weighted sampling laws (the k-subset is
 * oracle-pinned in pq67):
 *
 *  - membership equals a driver-side brute-force recomputation of the
 *    same priorities — the operator's TakeOrdered is just an execution
 *    strategy, not a semantics;
 *  - determinism across partitionings;
 *  - a dominating weight is drawn (priority >= w beats 1/u draws);
 *  - null keys and non-positive/null weights never appear.
 */
class WeightedSampleSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def priorities(rows: Seq[(Long, Double)], salt: String): Seq[(Long, Double)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, w) =>
      val h = java.lang.Long.parseLong(
        TextOps.md5HexJvm(md, salt + id.toString).substring(0, 8), 16)
      id -> w / ((h + 1).toDouble / 4294967296.0)
    }
  }

  test("sample == brute-force top-k of the same priorities") {
    val base = docs.select(col("doc_id"), col("n_chars"))
      .filter(col("doc_id").isNotNull && col("n_chars").isNotNull && col("n_chars") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1).toDouble)).toSeq
    val expect = priorities(base, "t")
      .sortBy { case (id, p) => (-p, id) }.take(20).toMap
    val got = Sampling.weightedSample(docs.select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 20, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == expect)
  }

  test("deterministic across partitionings; k caps the size") {
    def ids(parts: Int): Set[Long] =
      Sampling.weightedSample(docs.select("doc_id", "n_chars").repartition(parts),
          "doc_id", "n_chars", k = 15, salt = "t")
        .collect().map(_.getLong(0)).toSet
    val one = ids(1)
    assert(one == ids(13))
    assert(one.size == 15)
  }

  test("a dominating weight is drawn; zero/null weights and null keys are not") {
    val rows = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1e9), (2L, 1.0), (3L, 1.0), (4L, 0.0), (5L, null), (null, 7.0))
    val df = spark.createDataFrame(rows).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 3, salt = "t")
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(1L), "the 1e9-weight row must out-prioritize unit weights")
    assert(!got.contains(4L) && got.size == 3)
  }

  test("weightedTopKPerStratum == per-stratum brute-force top-k of the same priorities") {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .filter(col("doc_id").isNotNull && col("n_chars").isNotNull && col("n_chars") > 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val expect = base.groupBy(_._2).flatMap { case (_, rs) =>
      val pri = priorities(rs.map(t => (t._1, t._3.toDouble)), "tw").toMap
      rs.sortBy(t => (-pri(t._1), t._1)).take(6)
    }.map(t => (t._1, t._2)).toSet
    val got = Sampling.weightedTopKPerStratum(
        docs.select("doc_id", "source", "n_chars").repartition(11),
        "doc_id", "source", "n_chars", k = 6, salt = "tw")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expect)
  }
}
