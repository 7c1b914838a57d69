package graft.llm

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSampleSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // strata of very different sizes: s0 tiny (< k, taken whole), s1 at
  // the boundary, s2 large (prefilter path does the work)
  private val rows: Seq[(Long, String)] =
    (0L until 3L).map(i => (i, "s0")) ++
      (10L until 15L).map(i => (i, "s1")) ++
      (100L until 400L).map(i => (i, "s2"))
  private def df = rows.toDF("doc_id", "source")
  private val k = 5

  /** The definitional answer: rank the FULL stratum. */
  private def reference(salt: String): Set[(Long, String)] = {
    val hx = substring(md5(concat(lit(salt), col("doc_id").cast("string")).cast("binary")), 1, 8)
    df.withColumn("_rn", row_number().over(
        Window.partitionBy("source").orderBy(hx.asc, col("doc_id").asc)))
      .filter(col("_rn") <= k).select("doc_id", "source")
      .as[(Long, String)].collect().toSet
  }

  private def run(salt: String, safety: Double): Set[(Long, String)] =
    Sampling.topKPerStratum(df, "doc_id", "source", k, salt, safety)
      .as[(Long, String)].collect().toSet

  test("law: equals the full-stratum window answer at every safety, fallback included") {
    val want = reference("tk")
    assert(run("tk", safety = 4.0) === want)
    // safety 0.05 starves the prefilter -> strata route through the
    // exact fallback; the answer must not change
    assert(run("tk", safety = 0.05) === want)
  }

  test("law: exactly min(k, |stratum|) rows per stratum") {
    val bySrc = run("tk2", 4.0).groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc === Map("s0" -> 3, "s1" -> 5, "s2" -> 5))
  }

  test("law: deterministic across runs; salt redraws the sample") {
    assert(run("a", 4.0) === run("a", 4.0))
    val a = run("a", 4.0).filter(_._2 == "s2")
    val b = run("b", 4.0).filter(_._2 == "s2")
    assert(a !== b) // 5-of-300 draws agreeing across salts is ~impossible
  }

  test("law: a null stratum is its own capped group, not silently dropped") {
    val withNulls = (rows ++ (500L until 520L).map(i => (i, null: String)))
      .toDF("doc_id", "source")
    val got = Sampling.topKPerStratum(withNulls, "doc_id", "source", k, "tk", 4.0)
      .as[(Long, Option[String])].collect().toSeq
    assert(got.count(_._2.isEmpty) === k, "null stratum must be capped at k")
    // the non-null strata are unaffected by the null group's presence
    assert(got.filter(_._2.nonEmpty).map(t => (t._1, t._2.get)).toSet ===
      run("tk", 4.0))
  }

  test("plan: the ranking window sees survivors, not the raw stratum") {
    val plan = Sampling.topKPerStratum(df, "doc_id", "source", k, "tk", 4.0)
      .queryExecution.executedPlan.toString
    // both window branches sit above a Filter on the hash threshold /
    // shortfall join — never a bare window over the unfiltered scan
    assert(plan.contains("Window ["))
    assert(!plan.contains("CartesianProduct"))
    // the rn <= k filter must stay adjacent to the window so Spark's
    // rank-limit pushdown fires: a partial WindowGroupLimit ahead of
    // the exchange means only <= k rows per group shuffle at all
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown did not fire:\n$plan")
  }
}
