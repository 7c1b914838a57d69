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
}
