package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * DSIR importance-resampling laws (arithmetic is oracle-pinned in
 * pq50/pq51; these pin behavior):
 *
 *  - DIRECTION: documents from the target language weigh higher on
 *    average than documents from a disjoint language — the whole point
 *    of the log-likelihood ratio.
 *  - DETERMINISM: weights are bit-identical across partitionings
 *    (ascending-bucket double summation), and resample selects the
 *    exact same rows.
 *  - RESAMPLE == the driver-side Gumbel-top-k recomputed from the
 *    operator's own weights (same JVM arithmetic, so exact).
 *  - Temperature → 0 degenerates to greedy top-k by weight.
 *  - Null/short texts weigh exactly 0.0.
 */
class DsirSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val d = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val target = d.filter(col("lang") === "en")

  private def weights(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    Dsir.importanceWeights(df, target, "doc_id", "text",
      buckets = 256, n = 2, salt = "t", ordered = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("target-language docs weigh higher on average than a disjoint language") {
    val w = weights(d)
    val byLang = d.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def mean(lang: String): Double = {
      val ws = w.collect { case (id, v) if byLang(id) == lang => v }
      ws.sum / ws.size
    }
    val (en, zh) = (mean("en"), mean("zh"))
    info(f"mean weight: en $en%.3f, zh $zh%.3f")
    assert(en > zh, s"target lang should outweigh disjoint lang: en=$en zh=$zh")
  }

  test("weights are bit-identical across partitionings") {
    assert(weights(d.repartition(1)) == weights(d.repartition(13)))
  }

  test("resample == Gumbel-top-k recomputed from the operator's weights") {
    val k = 25
    val got = Dsir.resample(d, target, "doc_id", "text", k = k,
      buckets = 256, n = 2, salt = "t").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = weights(d).toSeq.map { case (id, w) =>
      (id, w, w + Dsir.gumbelJvm(md, "t:g", id.toString))
    }.sortBy { case (id, _, s) => (-s, id) }.take(k)
    assert(got.toSeq == want)
  }

  test("temperature -> 0 degenerates to greedy top-k by weight") {
    val k = 20
    val sel = Dsir.resample(d, target, "doc_id", "text", k = k,
      buckets = 256, n = 2, salt = "t", temperature = 1e-9)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val w = weights(d)
    val selectedMin = sel.map(_._2).min
    val unselectedMax = w.filterNot(kv => sel.exists(_._1 == kv._1)).values.max
    assert(selectedMin >= unselectedMax - 1e-9,
      s"greedy limit violated: selected min $selectedMin < unselected max $unselectedMax")
  }

  test("null and sub-n texts weigh exactly 0.0") {
    // doc 4 skews the raw distribution away from the target's, so doc
    // 3's weight is genuinely nonzero (target == raw would zero λ)
    val f = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, null), Row(2L, "single"), Row(3L, "two words here"),
      Row(4L, "entirely different vocabulary altogether")))
    val w = Dsir.importanceWeights(f, f.filter(col("doc_id") === 3L), "doc_id", "text",
      buckets = 16, n = 2, salt = "t", ordered = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) == 0.0 && w(2L) == 0.0 && w(3L) != 0.0)
  }

  test("bucketCounts: occurrence (not distinct) semantics") {
    val f = TestSpark.df("doc_id bigint, text string", Seq(Row(1L, "a b a b a b")))
    // 5 bigram occurrences: "a b" x3, "b a" x2 -> total cnt 5
    val total = Dsir.bucketCounts(f, "doc_id", "text", buckets = 8, n = 2, salt = "t",
      ordered = false).agg(sum("cnt")).head.getLong(0)
    assert(total == 5L)
  }
}
