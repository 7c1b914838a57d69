package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * DoReMi multiplicative-weights laws: a hand-computed step, Σ weight = 1,
 * zero-excess identity (weights = smoothed prev), clipping (negative
 * excess ≡ zero), excess monotonicity, smoothing = 1 → uniform, the
 * absent-domain decay under fixed prevWeights, partition invariance,
 * and refusals (knobs, null stratum/excess, foreign stratum, bad prev).
 */
class DoremiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def weightsOf(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.select("stratum", "weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  private val eta = 0.5
  private val c = 0.125

  test("hand-computed step: uniform prev, two domains") {
    // domain a: excesses (0.5, 1.5) -> λ = 1.0; domain b: (0.0) -> λ = 0
    val losses = Seq(("a", 0.5), ("a", 1.5), ("b", 0.0))
      .toDF("dom", "excess")
    val got = weightsOf(Doremi.reweight(losses, "dom", "excess",
      eta = eta, smoothing = c, ordered = false))
    val eA = BigDecimal(math.exp(0.5)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val eB = 1.0
    val z = eA + eB
    // output is ROUND(6) — compare at rounding resolution
    assert(math.abs(got("a") - ((1 - c) * eA / z + c / 2)) < 5e-7)
    assert(math.abs(got("b") - ((1 - c) * eB / z + c / 2)) < 5e-7)
  }

  test("weights sum to 1 (within rounding) and every stratum emits") {
    val losses = (1 to 100).map(i => (s"d${i % 5}", (i % 7) / 8.0)).toDF("dom", "excess")
    val out = Doremi.reweight(losses, "dom", "excess", eta = 1.0, smoothing = 0.2,
      ordered = false)
    assert(out.count() == 5)
    val s = weightsOf(out).values.sum
    assert(math.abs(s - 1.0) < 5e-6 * 5, s"Σ weight = $s")
  }

  test("zero excess everywhere -> weights equal smoothed prev") {
    val losses = Seq(("a", 0.0), ("b", 0.0), ("b", 0.0)).toDF("dom", "excess")
    val prev = Map("a" -> 0.75, "b" -> 0.25)
    val got = weightsOf(Doremi.reweight(losses, "dom", "excess",
      eta = eta, smoothing = c, prevWeights = Some(prev), ordered = false))
    assert(math.abs(got("a") - ((1 - c) * 0.75 + c / 2)) < 5e-7)
    assert(math.abs(got("b") - ((1 - c) * 0.25 + c / 2)) < 5e-7)
  }

  test("negative excess clips to zero: all-negative ≡ all-zero") {
    val neg = Seq(("a", -3.0), ("b", -0.5)).toDF("dom", "excess")
    val zero = Seq(("a", 0.0), ("b", 0.0)).toDF("dom", "excess")
    assert(weightsOf(Doremi.reweight(neg, "dom", "excess", eta, c, ordered = false))
      == weightsOf(Doremi.reweight(zero, "dom", "excess", eta, c, ordered = false)))
  }

  test("monotone: the domain with larger mean excess gains weight") {
    val losses = Seq(("hi", 2.0), ("lo", 0.1), ("mid", 1.0)).toDF("dom", "excess")
    val got = weightsOf(Doremi.reweight(losses, "dom", "excess", eta, c,
      ordered = false))
    assert(got("hi") > got("mid") && got("mid") > got("lo"))
  }

  test("smoothing = 1 -> exactly uniform regardless of excess") {
    val losses = Seq(("a", 9.0), ("b", 0.0), ("c", 1.0), ("d", 4.0))
      .toDF("dom", "excess")
    val got = weightsOf(Doremi.reweight(losses, "dom", "excess",
      eta = 2.0, smoothing = 1.0, ordered = false))
    assert(got.values.toSet == Set(0.25))
  }

  test("fixed domain set: an absent domain emits λ=0 and decays only by " +
      "normalization; a foreign stratum is refused") {
    val losses = Seq(("a", 1.0)).toDF("dom", "excess")
    val prev = Map("a" -> 0.5, "b" -> 0.5)
    val out = Doremi.reweight(losses, "dom", "excess", eta, smoothing = 0.0,
      prevWeights = Some(prev), ordered = false)
    val rows = out.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("b") == ((0L, 0.0, rows("b")._3)))
    // e_a > 1, e_b = 1 with equal prev -> a gains, b loses, sum 1
    assert(rows("a")._3 > 0.5 && rows("b")._3 < 0.5)
    assert(math.abs(rows("a")._3 + rows("b")._3 - 1.0) < 1e-5)

    val foreign = Seq(("zzz", 1.0)).toDF("dom", "excess")
    val e = intercept[Exception] {
      Doremi.reweight(foreign, "dom", "excess", eta, c,
        prevWeights = Some(prev), ordered = false).collect()
    }
    assert(e.getMessage.contains("not in prevWeights"))
  }

  test("partition invariance: 1 vs 32 partitions, dyadic excesses") {
    val losses = (1 to 500).map(i => (s"d${i % 4}", ((i % 32) - 8) / 16.0))
      .toDF("dom", "excess")
    val a = Doremi.reweight(losses.repartition(1), "dom", "excess", eta, c)
      .collect().toSeq
    val b = Doremi.reweight(losses.repartition(32), "dom", "excess", eta, c)
      .collect().toSeq
    assert(a == b)
  }

  test("nextMixture ≡ mixtureRates over the renormalized reweight output") {
    val losses = Seq(("a", 1.0), ("a", 0.5), ("b", 0.0), ("c", 2.0))
      .toDF("dom", "excess")
    val corpus = Seq(("a", 100L), ("a", 50L), ("b", 400L), ("c", 30L))
      .toDF("dom", "n_tok")
    val got = Doremi.nextMixture(losses, corpus, "dom", "excess", "n_tok",
      eta = eta, smoothing = c, budgetTokens = 300L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet

    val w = Doremi.reweight(losses, "dom", "excess", eta, c, ordered = false)
      .select("stratum", "weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1)
    val z = w.foldLeft(0.0)(_ + _._2)
    val expect = Sampling.mixtureRates(corpus, "dom", "n_tok",
      w.map { case (s, v) => s -> v / z }.toMap, 300L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(got == expect)
    // the under-asked big stratum is uncapped, the tiny one capped
    val byS = got.map(r => r._1 -> r).toMap
    assert(!byS("b")._4 && byS("c")._4)
    assert(got.forall { case (_, _, rate, _) => rate > 0 && rate <= 1.0 })
  }

  test("refusals: knobs, null stratum, null excess, bad prevWeights") {
    val ok = Seq(("a", 1.0)).toDF("dom", "excess")
    intercept[IllegalArgumentException] {
      Doremi.reweight(ok, "dom", "excess", eta = 0.0, smoothing = c) }
    intercept[IllegalArgumentException] {
      Doremi.reweight(ok, "dom", "excess", eta, smoothing = 1.5) }
    intercept[IllegalArgumentException] {
      Doremi.reweight(ok, "dom", "excess", eta, c,
        prevWeights = Some(Map("a" -> 0.4))) } // doesn't sum to 1
    intercept[IllegalArgumentException] {
      Doremi.reweight(ok, "dom", "excess", eta, c,
        prevWeights = Some(Map("a" -> 1.5, "b" -> -0.5))) }
    val nullStratum = Seq((Option.empty[String], 1.0), (Some("a"), 1.0))
      .toDF("dom", "excess")
    val e1 = intercept[Exception] {
      Doremi.reweight(nullStratum, "dom", "excess", eta, c).collect() }
    assert(e1.getMessage.contains("null stratum"))
    val nullExcess = Seq(("a", Option.empty[Double]), ("a", Some(1.0)))
      .toDF("dom", "excess")
    val e2 = intercept[Exception] {
      Doremi.reweight(nullExcess, "dom", "excess", eta, c).collect() }
    assert(e2.getMessage.contains("null excess"))
  }
}
