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

  test("weighted mixture law: rates over the soft-deduped corpus with its weights equal rates over the un-deduped corpus") {
    // content made SOURCE-unique (prefix): a natural cross-source
    // duplicate would collapse onto one source's keeper and move mass
    // between strata — outside the law's premise (duplicates within a
    // stratum). Within-source natural dups stay and conserve fine.
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"),
        concat_ws(":", col("source"), col("text")).as("text"),
        col("n_chars"))
    // exact-duplicate fixture: 3 extra copies of doc_id < 15, 1 of
    // doc_id in [15, 30) — copies inherit source/n_chars, so per-source
    // token mass is duplicated exactly
    val copies = d.filter(col("doc_id") < 15)
      .flatMap { r => (1 to 3).map(i =>
        (r.getLong(0) + 100000L * i, r.getString(1), r.getString(2),
          r.getLong(3))) }
      .toDF("doc_id", "source", "text", "n_chars")
      .unionByName(d.filter(col("doc_id") >= 15 && col("doc_id") < 30)
        .select((col("doc_id") + 400000L).as("doc_id"), col("source"),
          col("text"), col("n_chars")))
    val corpus = d.unionByName(copies)
    val weighted = SoftDedup.exact(corpus, "doc_id", "text")
      .join(corpus.select(col("doc_id").as("keep_id"), col("source"),
        col("n_chars")), Seq("keep_id"))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
        .toMap

    // temperature form: Σ n^alpha over weighted counts
    val wTemp = rows(Sampling.temperatureMixtureRates(weighted, "source",
      "n_chars", alpha = 0.5, budgetTokens = 50000L, ordered = false,
      weightCol = Some("weight")))
    val uTemp = rows(Sampling.temperatureMixtureRates(corpus, "source",
      "n_chars", alpha = 0.5, budgetTokens = 50000L, ordered = false))
    assert(wTemp == uTemp,
      "weighted temperature rates must equal the un-deduped corpus's")

    // fixed-target form shares the law through the same weighted mass
    val shares = Map("src0" -> 0.5, "src1" -> 0.3)
    def mixRows(df: org.apache.spark.sql.DataFrame,
        w: Option[String]) =
      Sampling.mixtureRates(df, "source", "n_chars", shares, 50000L, w)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(mixRows(weighted, Some("weight")) == mixRows(corpus, None),
      "weighted mixtureRates must equal the un-deduped corpus's")
  }

  test("weightedSample over SoftDedup output: deterministic, keeper-only, favors heavy keepers") {
    // texts made doc-unique so each doc_id < 5 group is exactly
    // {itself + its 9 copies} (weight 10) — a natural duplicate among
    // the base docs would merge groups and evict a keeper the
    // assertion names
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), concat(col("text"), lit(" u"),
        col("doc_id")).as("text"))
    // duplicate a small slice 9x so its keepers carry weight 10
    val copies = d.filter(col("doc_id") < 5)
      .flatMap { r => (1 to 9).map(i =>
        (r.getLong(0) + 100000L * i, r.getString(1))) }
      .toDF("doc_id", "text")
    val corpus = d.unionByName(copies)
    val soft = SoftDedup.exact(corpus, "doc_id", "text")
    val take = Sampling.weightedSample(soft, "keep_id", "weight", k = 10,
      salt = "sd")
    val a = take.select("keep_id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedSample(soft.repartition(7), "keep_id",
      "weight", k = 10, salt = "sd")
      .select("keep_id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "selection must be a pure function of (salt, keys, weights)")
    val keepers = soft.select("keep_id").collect().map(_.getLong(0)).toSet
    assert(a.toSet.subsetOf(keepers))
    // weight monotonicity (the A-Res law): u is a pure function of
    // (salt, key), so raising a keeper's weight strictly raises its
    // priority w/u — the weight-10 keepers drawn can only GAIN
    // membership vs the same draw with every weight forced to 1
    val flat = Sampling.weightedSample(
      soft.withColumn("weight", lit(1L)), "keep_id", "weight", k = 10,
      salt = "sd").select("keep_id").collect().map(_.getLong(0)).toSet
    val heavyIds = (0L until 5L).toSet
    assert((flat & heavyIds).subsetOf(a.toSet & heavyIds),
      s"weighting up must never evict a heavy keeper: flat=$flat weighted=$a")
  }
}
