package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Mean-pooling laws (value arithmetic is oracle-pinned in pq96):
 *
 *  - CLOSED FORM: exact hand-computed means, including a single-chunk
 *    group (pool == the vector).
 *  - NULL HANDLING: null vectors dropped; an all-null group emits
 *    nothing (never a null/NaN vector).
 *  - DETERMINISM: bit-identical across partitionings AND input row
 *    orders — the fold runs in orderCol order regardless.
 */
class PoolingSpec extends AnyFunSuite {
  import TestSpark.spark

  private def chunks = TestSpark.df(
    "doc_id bigint, ord bigint, v array<float>", Seq(
      Row(1L, 1L, Seq(1.0f, 2.0f, 3.0f)),
      Row(1L, 2L, Seq(3.0f, 2.0f, 1.0f)),
      Row(1L, 3L, Seq(2.0f, 2.0f, 2.0f)),
      Row(2L, 1L, Seq(10.0f, 20.0f, 30.0f)), // single chunk
      Row(2L, 2L, null),                     // dropped
      Row(3L, 1L, null)))                    // all-null group: no row

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getSeq[Double](2).toList)).toSet

  test("closed form: exact means, single-chunk identity, null drop") {
    val got = collect(Pooling.meanPool(chunks, "doc_id", "ord", "v",
      ordered = false))
    assert(got == Set(
      (1L, 3L, List(2.0, 2.0, 2.0)),
      (2L, 1L, List(10.0, 20.0, 30.0))))
  }

  test("bit-identical across partitionings and input row orders") {
    def run(df: org.apache.spark.sql.DataFrame) =
      collect(Pooling.meanPool(df, "doc_id", "ord", "v", ordered = false))
    val base = run(chunks)
    assert(run(chunks.repartition(13)) == base)
    assert(run(chunks.orderBy(org.apache.spark.sql.functions.col("ord").desc)) == base,
      "the fold must follow orderCol, not arrival order")
  }

  test("pooled vectors feed the similarity stack: cosine of a doc against its own pool is ~1 for identical chunks") {
    val same = TestSpark.df("doc_id bigint, ord bigint, v array<float>", Seq(
      Row(7L, 1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      Row(7L, 2L, Seq(1.0f, 0.0f, 0.0f, 1.0f))))
    val pooled = Pooling.meanPool(same, "doc_id", "ord", "v", ordered = false)
      .collect().head.getSeq[Double](2)
    assert(pooled == Seq(1.0, 0.0, 0.0, 1.0))
  }
}
