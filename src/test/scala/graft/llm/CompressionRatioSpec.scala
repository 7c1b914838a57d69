package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Compression-ratio signal goldens (DEFLATE is deterministic per zlib
 * build but not engine-portable, so this is golden-tested like the
 * multimodal stubs): direction (templated << prose << noise),
 * identical texts agree exactly, determinism across partitionings,
 * null exclusion, and the empty-text convention.
 */
class CompressionRatioSpec extends AnyFunSuite {
  import TestSpark.spark

  private def run(rows: Seq[(java.lang.Long, String)]): Map[Long, (Long, Long, Double)] = {
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    TextAnalysis.compressionRatio(df, "doc_id", "text", ordered = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("direction: repeated text compresses far below varied text; noise barely") {
    val repeated = Seq.fill(200)("the same line again").mkString(" ")
    val varied = (0 until 200).map(i => s"w${i * 7919 % 1000} t${i % 83}x").mkString(" ")
    val noise = {
      val rnd = new scala.util.Random(7)
      (0 until 800).map(_ => rnd.nextPrintableChar()).mkString
    }
    val got = run(Seq((1L, repeated), (2L, varied), (3L, noise)))
    assert(got(1L)._3 < got(2L)._3 && got(2L)._3 < got(3L)._3,
      s"expected templated < varied < noise, got $got")
    assert(got(1L)._3 < 0.1, s"heavy repetition must compress hard: ${got(1L)._3}")
  }

  test("identical texts agree exactly; nulls excluded; empty text ratio 1.0") {
    val got = run(Seq((1L, "same words here"), (2L, "same words here"),
      (3L, null), (4L, "")))
    assert(got(1L) == got(2L))
    assert(!got.contains(3L))
    assert(got(4L) == ((0L, got(4L)._2, 1.0)))
  }

  test("deterministic across partitionings on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def m(parts: Int) = TextAnalysis.compressionRatio(
        docs.repartition(parts), "doc_id", "text", ordered = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val one = m(1)
    assert(one == m(13) && one.nonEmpty)
  }
}
