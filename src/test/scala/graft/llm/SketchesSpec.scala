package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Count-min sketch laws (the sketch table is oracle-pinned in pq57):
 *
 *  - ONE-SIDED ERROR: estimate(w) >= true count for EVERY word — the
 *    defining guarantee, asserted exhaustively;
 *  - at generous width most estimates are exact (measured + floored);
 *  - MERGE: sketch(A ++ B) == merge(sketch(A), sketch(B)) counter for
 *    counter — the incremental/shard property;
 *  - determinism across partitionings.
 */
class SketchesSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def words(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")

  test("estimate >= truth for every word; mostly exact at generous width") {
    val w = words(docs)
    val truth = w.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = CountMin.collect(
      CountMin.build(w, "word", depth = 4, width = 512, salt = "t", ordered = false),
      depth = 4, width = 512, salt = "t")
    var exact = 0
    truth.foreach { case (word, cnt) =>
      val est = sk.estimate(word)
      assert(est >= cnt, s"'$word': estimate $est < truth $cnt")
      if (est == cnt) exact += 1
    }
    info(f"exact estimates: $exact/${truth.size}")
    assert(exact >= truth.size * 0.9,
      s"width 512 over ${truth.size} distinct words should be mostly collision-free")
  }

  test("sketch(A ++ B) == merge(sketch(A), sketch(B))") {
    val a = words(docs.filter(col("doc_id") < 25))
    val b = words(docs.filter(col("doc_id") >= 25))
    def m(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = m(CountMin.build(words(docs), "word", 4, 128, "t", ordered = false))
    val merged = m(CountMin.merge(
      CountMin.build(a, "word", 4, 128, "t", ordered = false),
      CountMin.build(b, "word", 4, 128, "t", ordered = false)))
    assert(whole == merged)
  }

  test("sketch is partitioning-invariant") {
    def m(parts: Int): Map[(Long, Long), Long] =
      CountMin.build(words(docs.repartition(parts)), "word", 3, 64, "t", ordered = false)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m(1) == m(13))
  }

  // ---- HyperLogLog -------------------------------------------------

  test("hll: estimate within the 1.04/sqrt(m) error envelope of truth") {
    val w = words(docs)
    val truth = w.distinct().count().toDouble
    val m = 1024
    val est = Hll.estimate(Hll.sketch(w, "word", m, salt = "t", ordered = false), m)
    // 1.04/sqrt(1024) ~ 3.25% rse; assert a 4-sigma envelope so the
    // fixed-salt draw never flakes while a broken estimator still fails
    assert(math.abs(est - truth) / truth <= 4 * 1.04 / math.sqrt(m.toDouble),
      s"estimate $est vs truth $truth")
  }

  test("hll: merge(sketch(A), sketch(B)) == sketch(A ++ B) exactly") {
    val a = words(docs.filter(col("doc_id") < 25))
    val b = words(docs.filter(col("doc_id") >= 25))
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = m(Hll.sketch(words(docs), "word", 128, "t", ordered = false))
    val merged = m(Hll.merge(
      Hll.sketch(a, "word", 128, "t", ordered = false),
      Hll.sketch(b, "word", 128, "t", ordered = false)))
    assert(whole == merged)
  }

  test("hll: rho is the exact leading-zero rank (oracle's floor-log2 twin)") {
    // Dyadic boundary values: rho(v) must flip exactly at powers of two.
    val rows = Seq(1L, 2L, 3L, 4L, 7L, 8L, 255L, 256L, (1L << 31) - 1, 1L << 31)
    val got = spark.createDataFrame(rows.map(Tuple1(_))).toDF("v")
      .select(col("v"),
        when(col("v") === 0L, lit(33L)).otherwise(lit(33L) - length(bin(col("v")))).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { v =>
      val expect = 32L - (63 - java.lang.Long.numberOfLeadingZeros(v))
      assert(got(v) == expect, s"v=$v got ${got(v)} want $expect")
    }
  }

  test("hll by group: group sketches roll up to the corpus sketch by MAX") {
    val w = docs.select(col("source"),
      explode(TextOps.tokens(col("text"))).as("word")).filter(col("word") =!= "")
    val byGroup = Hll.sketchByGroup(w, "source", "word", 64, "t", ordered = false)
    val rolled = byGroup.groupBy("register")
      .agg(org.apache.spark.sql.functions.max("max_rho").as("max_rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Hll.sketch(w.select("word"), "word", 64, "t", ordered = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rolled == whole)
  }

  test("hll: estimateByGroup equals the driver estimator bit-for-bit per group") {
    val w = docs.select(col("source"),
      explode(TextOps.tokens(col("text"))).as("word")).filter(col("word") =!= "")
    val m = 128
    val sk = Hll.sketchByGroup(w, "source", "word", m, "t", ordered = false)
    val dist = Hll.estimateByGroup(sk, "source", m, ordered = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dist.nonEmpty)
    dist.keys.foreach { src =>
      val drv = Hll.estimate(
        sk.filter(col("source") === src).select("register", "max_rho"), m)
      assert(dist(src) == drv, s"source $src: distributed ${dist(src)} != driver $drv")
    }
  }

  test("hll: estimate reads max_rho by NAME — reordered projections work, mis-shaped input errors") {
    val w = words(docs)
    val m = 128
    val sk = Hll.sketch(w, "word", m, "t", ordered = false)
    // a reordered projection must give the identical estimate
    assert(Hll.estimate(sk.select(col("max_rho"), col("register")), m) ==
      Hll.estimate(sk, m))
    // a table without the exact (register, max_rho) shape must ERROR,
    // never silently mis-estimate
    assertThrows[IllegalArgumentException] {
      Hll.estimate(sk.select(col("register"), col("max_rho").as("rho")), m)
    }
    // a per-group register table must ERROR even when SPARSE (total
    // present registers under m — the row-count bound alone missed it)
    val byGroup = Hll.sketchByGroup(
      words(docs).limit(40), "word", "word", m, "t", ordered = false)
    val e = intercept[IllegalArgumentException] {
      Hll.estimate(byGroup, m)
    }
    assert(e.getMessage.contains("estimateByGroup"))
  }

  test("hll: sketch is partitioning-invariant and m-bounded") {
    def m(parts: Int): Map[Long, Long] =
      Hll.sketch(words(docs.repartition(parts)), "word", 64, "t", ordered = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = m(1)
    assert(one == m(13))
    assert(one.size <= 64 && one.keys.forall(k => k >= 0 && k < 64))
  }
}
