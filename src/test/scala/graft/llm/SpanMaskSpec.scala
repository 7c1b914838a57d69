package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Span-corruption mask laws (arithmetic is oracle-pinned in pq60):
 *
 *  - spans are disjoint, ordered, in-bounds, and span_ids are dense;
 *  - the realized masked-token fraction sits near the configured rate;
 *  - adjacent masked blocks merge (rate = 1 -> exactly ONE span
 *    covering every token);
 *  - deterministic across partitionings and sensitive to the salt;
 *  - curriculumShardShuffle ramps scores within each shard.
 */
class SpanMaskSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def collectSpans(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("spans disjoint, ordered, in-bounds; ids dense; coverage near the rate") {
    val got = collectSpans(SpanMask.spans(docs, "doc_id", "text",
      rate = 0.15, blockLen = 3, ordered = false))
    assert(got.nonEmpty)
    val nTokens = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var covered = 0L
    got.groupBy(_._1).foreach { case (id, spans) =>
      val sorted = spans.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"doc $id ids not dense")
      sorted.foreach { case (_, _, s, e) =>
        assert(s >= 0 && e > s && e <= nTokens(id), s"doc $id span [$s,$e) out of bounds")
        covered += e - s
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, e1), (_, _, s2, _)) =>
          assert(s2 > e1, s"doc $id spans overlap or touch without merging")
        case _ =>
      }
    }
    val frac = covered.toDouble / nTokens.values.sum
    info(f"masked-token fraction: $frac%.4f (target 0.15)")
    assert(frac > 0.07 && frac < 0.30, s"coverage $frac far from rate")
  }

  test("rate = 1 merges everything into one span covering every token") {
    val got = collectSpans(SpanMask.spans(docs, "doc_id", "text",
      rate = 1.0, blockLen = 3, ordered = false))
    val nTokens = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == nTokens.keySet)
    byDoc.foreach { case (id, spans) =>
      assert(spans.length == 1, s"doc $id: expected one merged span")
      val (_, _, s, e) = spans.head
      assert(s == 0L && e == nTokens(id))
    }
  }

  test("deterministic across partitionings; salt changes the mask") {
    def run(parts: Int, salt: String) = collectSpans(SpanMask.spans(
      docs.repartition(parts), "doc_id", "text", salt = salt, ordered = false)).toSet
    assert(run(1, "t5") == run(13, "t5"))
    assert(run(4, "t5") != run(4, "other"))
  }

  test("null/empty docs emit no spans") {
    val f = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, null), Row(2L, "some real text here to mask maybe")))
    val got = collectSpans(SpanMask.spans(f, "doc_id", "text", rate = 1.0, ordered = false))
    assert(got.forall(_._1 == 2L))
  }

  test("curriculumShardShuffle ramps the score within each shard") {
    val out = Packing.curriculumShardShuffle(
      docs.select("doc_id", "n_chars"), "doc_id", "n_chars", shards = 4)
      .collect().map(r => (r.getLong(r.fieldIndex("shard")),
        r.getLong(r.fieldIndex("pos")), r.getLong(r.fieldIndex("n_chars"))))
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val scoresInPosOrder = rows.sortBy(_._2).map(_._3)
      scoresInPosOrder.sliding(2).foreach { w =>
        assert(w(1) >= w(0), s"shard $shard: difficulty not monotone")
      }
    }
  }
}
