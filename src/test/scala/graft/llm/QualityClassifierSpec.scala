package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hashed-linear-classifier scoring laws:
 *
 *  - CLOSED FORM: score = bias + Σ w[md5-bucket(token)], prob =
 *    sigmoid — hand-computed on a tiny corpus with the same hash.
 *  - SPINE: null/empty/whitespace texts score the bias alone,
 *    n_tokens 0, one row per doc.
 *  - DETERMINISM: identical bits under repartitioning (the fold runs
 *    over the row's own token array).
 *  - GATE: inclusive threshold on the ROUNDED prob; kept rows carry
 *    the original columns plus the scores.
 */
class QualityClassifierSpec extends AnyFunSuite {
  import TestSpark.spark

  private def bucketOf(tok: String, dim: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  private val dim = 64
  private val weights =
    Array.tabulate(dim)(j => ((j * 2654435761L) % 4294967296L).toDouble
      / 4294967296.0 - 0.5)
  private val bias = 0.125

  test("closed form, spine rows for degenerate texts, bit-identical under repartitioning") {
    val df = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "alpha beta alpha"),
      Row(2L, "gamma"),
      Row(3L, null),
      Row(4L, ""),
      Row(5L, "   ")))
    val got = QualityClassifier.score(df, "doc_id", "text", weights, bias,
      ordered = false)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = bias + 2 * weights(bucketOf("alpha", dim)) +
      weights(bucketOf("beta", dim))
    val s2 = bias + weights(bucketOf("gamma", dim))
    assert(got(1L) == ((3L, r6(s1), r4(1.0 / (1.0 + math.exp(-s1))))))
    assert(got(2L) == ((1L, r6(s2), r4(1.0 / (1.0 + math.exp(-s2))))))
    // degenerate texts: bias-only spine rows
    Seq(3L, 4L, 5L).foreach { id =>
      assert(got(id) == ((0L, r6(bias), r4(1.0 / (1.0 + math.exp(-bias))))),
        s"doc $id must score the bias alone")
    }
    // determinism across partitionings
    def run(parts: Int) = QualityClassifier.score(df.repartition(parts),
      "doc_id", "text", weights, bias, ordered = false)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(run(1) == run(7))
    intercept[IllegalArgumentException] {
      QualityClassifier.score(df, "doc_id", "text", Array.empty[Double])
    }
  }

  test("plan: score is projection-only — zero shuffle, no join (weights ride as a literal), no explode") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val plan = QualityClassifier.score(d, "doc_id", "text", weights, bias,
      ordered = false).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"score shuffled:\n$plan")
    assert(!plan.contains("Join"), s"weights must not arrive by join:\n$plan")
    assert(!plan.contains("Generate"), s"score must not explode tokens:\n$plan")
  }

  test("gate: inclusive threshold, original columns kept, monotone in threshold") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val scored = QualityClassifier.score(d, "doc_id", "text", weights, bias,
      ordered = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored.values.toSet.size > 1, "fixture must spread probabilities")
    val cut = scored.values.toSeq.sorted.apply(scored.size / 2) // a median prob
    val kept = QualityClassifier.gate(d, "doc_id", "text", weights, bias,
      threshold = cut, ordered = false)
    assert(kept.columns.toSeq ==
      Seq("doc_id", "text", "n_tokens", "score", "prob"))
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    assert(keptIds == scored.collect { case (id, p) if p >= cut => id }.toSet,
      "gate must keep exactly the docs at/above the threshold (inclusive)")
    val stricter = QualityClassifier.gate(d, "doc_id", "text", weights, bias,
      threshold = math.min(1.0, cut + 0.01), ordered = false)
      .collect().map(_.getLong(0)).toSet
    assert(stricter.subsetOf(keptIds), "a higher threshold keeps a subset")
    intercept[IllegalArgumentException] {
      QualityClassifier.gate(d, "doc_id", "text", weights, threshold = 1.5)
    }
  }
}
