package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * UniMax allocation laws (the fixture row set is oracle-pinned in
 * pq123; these pin the algebra the closed form must satisfy):
 *
 *  - GREEDY EQUIVALENCE: the declarative water-filling closed form
 *    equals the paper's sequential greedy loop (ascending by capacity,
 *    min(cap, equal share of the remainder)) recomputed driver-side;
 *  - budget conservation: Σ alloc = min(budget, Σ cap);
 *  - the epoch cap binds: alloc <= cap, epochs <= maxEpochs;
 *  - the water level sits above every saturated capacity and is shared
 *    exactly by every unsaturated stratum;
 *  - degenerate shapes: over-budget (all saturated), zero-token
 *    strata, and the soft-dedup weight composition.
 */
class UnimaxSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(String, Long)]) = rows.toDF("source", "n_chars")

  private def run(rows: Seq[(String, Long)], budget: Long, epochs: Double) =
    Sampling.unimaxAllocation(df(rows), "source", "n_chars", budget, epochs)
      .select("stratum", "n_tokens", "cap", "alloc", "epochs", "saturated")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))

  /** The paper's greedy loop: ascending capacity, each stratum gets
    * min(cap, remaining / #remaining). */
  private def greedy(tokens: Map[String, Long], budget: Long,
      epochs: Double): Map[String, Double] = {
    val caps = tokens.toSeq.map { case (s, n) => (s, n * epochs) }
      .sortBy { case (s, c) => (c, s) }
    var remaining = budget.toDouble
    var left = caps.size
    val out = Map.newBuilder[String, Double]
    caps.foreach { case (s, c) =>
      val a = math.min(c, remaining / left)
      out += s -> a
      remaining -= a
      left -= 1
    }
    out.result()
  }

  // skewed strata: tiny (always saturated), mid, and a giant
  private val skewed = Seq("a" -> 10L, "b" -> 400L, "c" -> 500L, "d" -> 5000L)

  test("law: closed form equals the sequential greedy loop") {
    val got = run(skewed, budget = 3000L, epochs = 2.0)
    val want = greedy(skewed.toMap, 3000L, 2.0)
    got.foreach { case (s, _, _, alloc, _, _) =>
      assert(math.abs(alloc - want(s)) < 1e-4, s"stratum $s: $alloc vs ${want(s)}")
    }
    // branch coverage: the fixture must exercise both arms
    assert(got.count(_._6) > 0 && got.count(r => !r._6) > 0)
  }

  test("law: budget conservation and the epoch cap") {
    val got = run(skewed, budget = 3000L, epochs = 2.0)
    val capSum = got.map(_._3).sum
    assert(math.abs(got.map(_._4).sum - math.min(3000.0, capSum)) < 1e-6)
    got.foreach { case (s, n, cap, alloc, ep, _) =>
      assert(alloc <= cap + 1e-6, s"$s: alloc $alloc over cap $cap")
      assert(ep <= 2.0 + 1e-6, s"$s: epochs $ep over the cap")
      assert(math.abs(cap - n * 2.0) < 1e-6)
    }
  }

  test("law: one shared water level, above every saturated capacity") {
    val got = run(skewed, budget = 3000L, epochs = 2.0)
    val levels = got.filter(!_._6).map(_._4).distinct
    assert(levels.length == 1, s"unsaturated allocs must be equal: ${levels.toSeq}")
    val maxSat = got.filter(_._6).map(_._3).max
    assert(levels.head >= maxSat - 1e-6)
  }

  test("over-budget: every stratum saturates at its full capacity") {
    val got = run(skewed, budget = 1000000L, epochs = 1.5)
    got.foreach { case (s, _, cap, alloc, ep, sat) =>
      assert(sat, s"$s must saturate under an over-budget")
      assert(math.abs(alloc - cap) < 1e-6 && math.abs(ep - 1.5) < 1e-6)
    }
  }

  test("zero-token stratum: cap 0, alloc 0, epochs 0, saturated") {
    val got = run(skewed :+ ("z" -> 0L), budget = 3000L, epochs = 2.0)
    val z = got.find(_._1 == "z").get
    assert(z._3 == 0.0 && z._4 == 0.0 && z._5 == 0.0 && z._6)
    // and the zero stratum does not disturb the others
    val others = got.filter(_._1 != "z").map(r => r._1 -> r._4).toMap
    val want = run(skewed, budget = 3000L, epochs = 2.0)
      .map(r => r._1 -> r._4).toMap
    assert(others === want)
  }

  test("weightCol: duplicate-count weights reproduce the un-deduped allocation") {
    // three copies of each 'b' row collapsed to one keeper with weight 3
    val full = Seq("a" -> 10L, "b" -> 400L, "b" -> 400L, "b" -> 400L, "c" -> 5000L)
    val deduped = Seq(("a", 10L, 1L), ("b", 400L, 3L), ("c", 5000L, 1L))
      .toDF("source", "n_chars", "w")
    val wantRows = Sampling.unimaxAllocation(df(full), "source", "n_chars",
      budgetTokens = 3000L, maxEpochs = 2.0)
      .select("stratum", "alloc").as[(String, Double)].collect().toMap
    val gotRows = Sampling.unimaxAllocation(deduped, "source", "n_chars",
      budgetTokens = 3000L, maxEpochs = 2.0, weightCol = Some("w"))
      .select("stratum", "alloc").as[(String, Double)].collect().toMap
    assert(gotRows === wantRows)
  }

  test("knob guards: non-positive budget and out-of-range epochs refused") {
    intercept[IllegalArgumentException](run(skewed, budget = 0L, epochs = 2.0))
    intercept[IllegalArgumentException](run(skewed, budget = 10L, epochs = 0.0))
    intercept[IllegalArgumentException](run(skewed, budget = 10L, epochs = 1001.0))
  }

  // ---- materialization (epoch repetition realized) ----

  private lazy val corpus = TestSpark.spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "source", "n_chars")

  test("materialize: per-key copies = floor(epochs) + the deterministic fractional draw, copy indices 0..c-1") {
    val epochs = Sampling.unimaxAllocation(corpus, "source", "n_chars",
        budgetTokens = 360000L, maxEpochs = 2.5, ordered = false)
      .select("stratum", "epochs").as[(String, Double)].collect().toMap
    // the fixture must exercise the cap AND the water level
    assert(epochs.values.exists(_ == 2.5) && epochs.values.exists(_ < 2.5))
    val md = java.security.MessageDigest.getInstance("MD5")
    def expectCopies(id: Long, src: String): Long = {
      val e = epochs(src)
      val full = math.floor(e).toLong
      val u32 = java.lang.Long.parseLong(
        TextOps.md5HexJvm(md, "mx" + id.toString).substring(0, 8), 16)
      full + (if (u32 < ((e - full) * 4294967296.0).toLong) 1L else 0L)
    }
    val got = Sampling.unimaxMaterialize(corpus, "doc_id", "source",
        "n_chars", budgetTokens = 360000L, maxEpochs = 2.5, salt = "mx")
      .select("doc_id", "source", "copy")
      .as[(Long, String, Long)].collect()
    val byKey = got.groupBy(t => (t._1, t._2))
    corpus.select("doc_id", "source").as[(Long, String)].collect()
      .foreach { case (id, src) =>
        val want = expectCopies(id, src)
        val copies = byKey.getOrElse((id, src), Array.empty).map(_._3).sorted
        assert(copies.toSeq == (0L until want),
          s"doc $id/$src: copies ${copies.toSeq} vs expected $want")
      }
  }

  test("materialize composes with packing: copies are first-class rows under a (doc, copy) key") {
    val corpus = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "n_chars", "text")
    val mat = Sampling.unimaxMaterialize(corpus, "doc_id", "source",
        "n_chars", budgetTokens = 360000L, maxEpochs = 2.5, salt = "mp")
      // the copy index makes the key unique again — the shardShuffle
      // precondition repetition would otherwise break
      .withColumn("rep_id", col("doc_id") * 8 + col("copy"))
    assert(mat.count() > corpus.count(), "2.5-epoch budget must repeat docs")
    val packed = Packing.packGreedy(mat, "rep_id", "text",
      targetTokens = 64, shards = 16)
    // token conservation: every copy's tokens land in exactly one pack
    val wantTokens = mat
      .select(size(TextOps.tokens(col("text").cast("string"))).cast("long"))
      .as[Long].collect().sum
    val gotTokens = packed.select(col("n_tokens")).as[Long].collect().sum
    assert(gotTokens == wantTokens,
      s"packed token mass $gotTokens must equal materialized mass $wantTokens")
    assert(packed.select("doc_id").distinct().count() == mat.count(),
      "every (doc, copy) row packs exactly once")
  }

  test("realized-mixture audit: totals conserve, every allocation stratum reports, starved strata read zero") {
    val alloc = Sampling.unimaxAllocation(corpus, "source", "n_chars",
      budgetTokens = 360000L, maxEpochs = 2.5, ordered = false)
    val mat = Sampling.unimaxMaterialize(corpus, "doc_id", "source",
      "n_chars", budgetTokens = 360000L, maxEpochs = 2.5, salt = "ra")
    val audit = Sampling.realizedMixture(mat, "source", "n_chars", alloc,
      ordered = false)
    // conservation: the audit's realized mass is exactly the
    // materialized corpus's token mass, stratum by stratum and total
    val want = mat.groupBy("source").agg(sum("n_chars").as("m"))
      .as[(String, Long)].collect().toMap
    val got = audit.select("stratum", "realized_tokens")
      .as[(String, Long)].collect().toMap
    assert(got == want ++ alloc.select("stratum").as[String].collect()
      .filterNot(want.contains).map(_ -> 0L).toMap)
    // a stratum the materialization never saw still reports, at zero
    val starved = Sampling.realizedMixture(
      mat.filter(col("source") =!= "src0"), "source", "n_chars", alloc,
      ordered = false)
    val z = starved.filter(col("stratum") === "src0").collect()
    assert(z.length == 1 && z.head.getAs[Long]("realized_tokens") == 0L &&
      z.head.getAs[Double]("deviation") == -1.0,
      "a starved stratum must report zero realized and deviation -1")
  }

  test("materialize: over-budget corpus repeats everything at the cap; null keys drop") {
    val withNull = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "a", 50L), (2L, "a", 50L), (null, "a", 50L))
    val d = spark.createDataFrame(withNull).toDF("doc_id", "source", "n_chars")
    val got = Sampling.unimaxMaterialize(d, "doc_id", "source", "n_chars",
        budgetTokens = 100000L, maxEpochs = 3.0, salt = "mo")
      .select("doc_id", "copy").as[(Long, Long)].collect()
    // every stratum saturates at exactly 3.0 epochs: 3 full copies, no draw
    assert(got.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map(1L -> 3, 2L -> 3))
  }

  test("materialize dispatches on the stratum's native type (BIGINT strata)") {
    // a BIGINT stratum — the router-pred composition pq132 feeds the
    // allocation — must materialize without a ClassCastException, and
    // per-stratum copy counts must respect each stratum's epochs
    val d = Seq((1L, 0L, 50L), (2L, 0L, 50L), (3L, 1L, 50L))
      .toDF("doc_id", "pred", "n_chars")
    val got = Sampling.unimaxMaterialize(d, "doc_id", "pred", "n_chars",
        budgetTokens = 100000L, maxEpochs = 2.0, salt = "nt")
      .select("doc_id", "copy").as[(Long, Long)].collect()
    assert(got.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2))
    // and agrees with the string-stratum materialization of the same
    // shape (same doc ids/salt → same draws)
    val s = Seq((1L, "0", 50L), (2L, "0", 50L), (3L, "1", 50L))
      .toDF("doc_id", "pred", "n_chars")
    val gotS = Sampling.unimaxMaterialize(s, "doc_id", "pred", "n_chars",
        budgetTokens = 100000L, maxEpochs = 2.0, salt = "nt")
      .select("doc_id", "copy").as[(Long, Long)].collect()
    assert(got.sorted.toSeq == gotS.sorted.toSeq)
  }

  test("materialize refuses a host-scale stratum column") {
    val d = (0 until (Sampling.MaterializeMaxStrata + 1))
      .map(i => (i.toLong, s"host$i", 10L))
      .toDF("doc_id", "host", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Sampling.unimaxMaterialize(d, "doc_id", "host", "n_chars",
        budgetTokens = 1000L, maxEpochs = 2.0, salt = "hs")
    }
    assert(e.getMessage.contains("host-scale"))
  }

  test("allocation refuses a stratum whose milli-token cap would overflow") {
    // epochsMilli = 1e6 at maxEpochs 1000: a stratum past ~9.2e12
    // tokens would wrap Long — the guard must raise, not corrupt
    val d = Seq(("big", Long.MaxValue / 1000000L + 1L), ("small", 10L))
      .toDF("source", "n_chars")
    val e = intercept[Exception] {
      Sampling.unimaxAllocation(d, "source", "n_chars",
        budgetTokens = 1000L, maxEpochs = 1000.0).collect()
    }
    assert(e.getMessage.contains("overflows exact milli-token capacity"))
  }

  test("realized-mixture audit lines up a NULL stratum as one row") {
    val d = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, null, 40L), (2L, "a", 60L))
    val corpus = spark.createDataFrame(d).toDF("doc_id", "source", "n_chars")
    val alloc = Sampling.unimaxAllocation(corpus, "source", "n_chars",
      budgetTokens = 1000L, maxEpochs = 1.0, ordered = false)
    // materialized = the corpus itself (1 epoch fits the budget)
    val audit = Sampling.realizedMixture(corpus, "source", "n_chars", alloc,
      ordered = false).collect()
    assert(audit.length == 2, s"null stratum must audit as ONE row, got " +
      audit.map(_.toString).mkString(", "))
    val nullRow = audit.find(_.isNullAt(0)).get
    assert(nullRow.getAs[Long]("realized_tokens") == 40L)
    assert(nullRow.getAs[Long]("n_tokens") == 40L)
  }
}
