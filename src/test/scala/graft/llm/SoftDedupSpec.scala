package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Soft dedup — keep one copy per duplicate group, carry the group size
 * as a training weight. The defining law: Σ weight = input rows (mass
 * is redistributed onto keepers, never lost).
 */
class SoftDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("exact: keeper carries its content's copy count; mass conserved") {
    val df = Seq(
      (1L, "aaa"), (2L, "aaa"), (3L, "aaa"),
      (4L, "bbb"), (5L, "bbb"),
      (6L, "ccc")).toDF("doc_id", "text")
    val w = SoftDedup.exact(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == Map(1L -> 3L, 4L -> 2L, 6L -> 1L))
    assert(w.values.sum == 6L, "sum of weights must equal input rows")
  }

  test("fromClusters: cluster keepers weighted by size, singletons weight 1, keeper = min id = cluster label") {
    val docs = (1L to 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // two clusters: {1,2,3} (label 1), {7,9} (label 7); rest singletons
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val w = SoftDedup.fromClusters(docs, clusters, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == Map(1L -> 3L, 7L -> 2L,
      4L -> 1L, 5L -> 1L, 6L -> 1L, 8L -> 1L, 10L -> 1L))
    assert(w.values.sum == 10L, "sum of weights must equal corpus rows")
  }

  test("mass-conservation law holds on real data for both modes, and keepers are distinct") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val n = d.count()

    val exact = SoftDedup.exact(d, "doc_id", "text")
    assert(exact.agg(sum("weight")).head.getLong(0) == n)
    assert(exact.select("keep_id").distinct().count() == exact.count())

    val clusters = DupClusters(
      SimHashNearDup(d, "doc_id", "text", maxHamming = 3, ordered = false),
      "doc_a", "doc_b")
    val soft = SoftDedup.fromClusters(d, clusters, "doc_id")
    assert(soft.agg(sum("weight")).head.getLong(0) == n,
      "cluster mode must conserve corpus mass")
    assert(soft.select("keep_id").distinct().count() == soft.count(),
      "one row per keeper")
    // keepers of multi-doc clusters really are the cluster labels
    val labels = clusters.select("cluster_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val heavy = soft.filter(col("weight") > 1)
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(heavy.subsetOf(labels))
  }
}
