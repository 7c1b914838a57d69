package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-group frequent-terms laws (the full report is oracle-pinned in
 * pq76): agreement with a driver-side brute force, the k bound per
 * group, deterministic alphabetical tie-breaks, and the rank-limit
 * pushdown staying in the plan (the scale guard for Zipf vocabularies).
 */
class FrequentTermsSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("matches brute force; at most k rows per group; ranks are 1..k") {
    val k = 5
    val got = TextAnalysis.frequentTerms(docs, "lang", "text", k, ordered = false)
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2), r.getLong(3)))
    val brute = docs.filter(col("text").isNotNull)
      .collect().flatMap(r => TextOps.tokensJvm(r.getString(r.fieldIndex("text")))
        .filter(_.nonEmpty).map(w => Option(r.getString(r.fieldIndex("lang"))) -> w))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .groupBy(_._1._1)
      .flatMap { case (g, rows) =>
        rows.map { case ((_, w), c) => (w, c) }
          .sortBy { case (w, c) => (-c, w) }.take(k).zipWithIndex
          .map { case ((w, c), i) => (g, w, c, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == brute)
    got.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.length <= k && rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq,
        s"group $g ranks malformed")
    }
  }

  test("rank-limit pushdown bounds the per-group sort (WindowGroupLimit in plan)") {
    val plan = TextAnalysis.frequentTerms(docs, "lang", "text", 3, ordered = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-limit pushdown:\n$plan")
  }
}
