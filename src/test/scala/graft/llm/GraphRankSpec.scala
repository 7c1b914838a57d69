package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * PageRank laws: hand-computed ranks on a tiny graph with a dangling
 * node, Σ rank = 1 (mass conservation incl. dangling redistribution),
 * the hub of a star graph ranks first, partition invariance, and
 * empty/invalid-input refusals.
 */
class GraphRankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("hand-computed one iteration with a dangling node; mass conserved") {
    // 1 -> {2, 3}, 2 -> 3, 3 dangling
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = ranksOf(GraphRank.pageRank(edges, "src", "dst",
      iters = 1, damping = 0.85, ordered = false))
    val n = 3.0
    val base = (1 - 0.85) / n
    val dang = (1.0 / n) / n // node 3's full r0 redistributed
    val expect = Map(
      1L -> (base + 0.85 * (0.0 + dang)),
      2L -> (base + 0.85 * ((1.0 / n) / 2 + dang)),
      3L -> (base + 0.85 * ((1.0 / n) / 2 + (1.0 / n) / 1 + dang)))
    // output ranks are ROUND(6) — compare at rounding resolution
    expect.foreach { case (id, r) =>
      assert(math.abs(got(id) - r) < 5e-7, s"node $id: ${got(id)} vs $r")
    }
    assert(math.abs(got.values.sum - 1.0) < 5e-6,
      "ranks must sum to 1 (dangling mass redistributed, never lost)")
  }

  test("star graph: the hub ranks first; multi-iteration mass conservation") {
    val edges = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
    val got = ranksOf(GraphRank.pageRank(edges, "src", "dst",
      iters = 3, ordered = false))
    assert(got(0L) == got.values.max, "the star hub must rank first")
    assert(got.values.count(_ == got(0L)) == 1)
    assert(math.abs(got.values.sum - 1.0) < 5e-6) // ROUND(6) output
  }

  test("partition-invariant on the real k-NN graph") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val edges = Similarity.cosineTopK(e, e, "vec_id", "embedding",
        k = 3, ordered = false)
      .select(col("qid").as("src"), col("cid").as("dst"))
    val a = ranksOf(GraphRank.pageRank(edges, "src", "dst", ordered = false))
    val b = ranksOf(GraphRank.pageRank(edges.repartition(13), "src", "dst",
      ordered = false))
    assert(a == b, "ROUND(6) ranks must be layout-invariant")
    assert(math.abs(a.values.sum - 1.0) < 1e-3) // rounded to 6 digits
  }

  test("weighted: hand-computed one iteration — rank follows the heavy edge") {
    // 1 -> 2 (w 3), 1 -> 3 (w 1), 2 -> 3 (w 2), 3 dangling
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 2.0))
      .toDF("src", "dst", "w")
    val got = ranksOf(GraphRank.pageRankWeighted(edges, "src", "dst", "w",
      iters = 1, damping = 0.85, ordered = false))
    val n = 3.0
    val base = (1 - 0.85) / n
    val dang = (1.0 / n) / n
    val expect = Map(
      1L -> (base + 0.85 * (0.0 + dang)),
      2L -> (base + 0.85 * ((1.0 / n) * 3.0 / 4.0 + dang)), // W(1) = 4
      3L -> (base + 0.85 * ((1.0 / n) * 1.0 / 4.0 + (1.0 / n) * 2.0 / 2.0 + dang)))
    expect.foreach { case (id, r) =>
      assert(math.abs(got(id) - r) < 5e-7, s"node $id: ${got(id)} vs $r")
    }
    assert(math.abs(got.values.sum - 1.0) < 5e-6,
      "weighted ranks must sum to 1")
  }

  test("weighted laws: constant weights reduce to unweighted; parallel edges combine by sum") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val edges = Similarity.cosineTopK(e, e, "vec_id", "embedding",
        k = 3, ordered = false)
      .select(col("qid").as("src"), col("cid").as("dst"))
    val flat = ranksOf(GraphRank.pageRankWeighted(
      edges.withColumn("w", lit(0.5)), "src", "dst", "w", ordered = false))
    val plain = ranksOf(GraphRank.pageRank(edges, "src", "dst",
      ordered = false))
    assert(flat == plain,
      "a constant weight must reduce to the unweighted ranks (ROUND(6))")
    // parallel (src, dst) duplicates combine by weight SUM
    val single = Seq((1L, 2L, 0.5), (1L, 3L, 0.5)).toDF("src", "dst", "w")
    val dup = Seq((1L, 2L, 0.3), (1L, 2L, 0.2), (1L, 3L, 0.5))
      .toDF("src", "dst", "w")
    assert(
      ranksOf(GraphRank.pageRankWeighted(dup, "src", "dst", "w",
        iters = 2, ordered = false)) ==
      ranksOf(GraphRank.pageRankWeighted(single, "src", "dst", "w",
        iters = 2, ordered = false)))
  }

  test("weighted refusal: a non-positive weight raises instead of corrupting the split") {
    val bad = Seq((1L, 2L, 0.5), (2L, 3L, -0.1)).toDF("src", "dst", "w")
    val e = intercept[Exception] {
      GraphRank.pageRankWeighted(bad, "src", "dst", "w", ordered = false)
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("rank-into-curation: suppressHubs drops the top-k ranks and composes with the sampler") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val edges = Similarity.cosineTopK(e, e, "vec_id", "embedding",
        k = 3, ordered = false)
      .select(col("qid").as("src"), col("cid").as("dst"), col("cos"))
      .filter(col("cos") > 0)
    val ranks = GraphRank.pageRankWeighted(edges, "src", "dst", "cos",
      ordered = false).localCheckpoint(true)
    val hubs = ranks.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, r) => (-r, id) }.take(3).map(_._1).toSet
    val kept = GraphRank.suppressHubs(e, "vec_id", ranks, topK = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val allIds = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == allIds -- hubs && hubs.size == 3)
    // composition: the per-doc sampler over the suppressed corpus ==
    // the sampler over the full corpus minus the hubs (hash sampling
    // is a pure per-doc predicate, so suppression commutes with it)
    val sampledSuppressed = Sampling.hashSample(
        GraphRank.suppressHubs(e, "vec_id", ranks, topK = 3),
        "vec_id", 0.5, "hub")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sampledAll = Sampling.hashSample(e, "vec_id", 0.5, "hub")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(sampledSuppressed == sampledAll -- hubs)
  }

  test("refusals: empty graph, bad knobs") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    intercept[Exception] {
      GraphRank.pageRank(empty, "src", "dst")
    }
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst",
        iters = 0)
    }
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst",
        damping = 1.0)
    }
  }
}
