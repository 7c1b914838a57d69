package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/**
 * Perceptual-hash (aHash) image-dedup laws over the stub payload tier:
 * signature micro-cases, controlled 1-bit perturbations flowing
 * through the pigeonhole pair join, the maxHamming cutoff, and
 * null/empty payload handling. (The decode itself is the documented
 * stub; these pin the signature fold and the join plumbing a real
 * codec would feed.)
 */
class PerceptualHashSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** 128-byte payload: 64 buckets of 2 bytes, bucket b filled with
    * 200 where bits(b), else 0 — bucket means are exactly 0 or 200,
    * far from any global mean, so the signature equals `bits`. */
  private def payload(bits: Set[Int]): Array[Byte] =
    (0 until 128).map(i => if (bits.contains(i / 2)) 200.toByte else 0.toByte).toArray

  private def sigOf(bits: Set[Int]): Long =
    bits.foldLeft(0L)((acc, b) => acc | (1L << (63 - b)))

  test("aHashJvm: constant payload -> all zero bits; crafted buckets -> exact bits") {
    assert(Multimodal.aHashJvm(Array.fill(100)(7.toByte)) == "0" * 16)
    assert(Multimodal.aHashJvm(Array.empty[Byte]) == null)
    val bits = Set(0, 5, 31, 63)
    assert(Multimodal.aHashJvm(payload(bits)) == f"${sigOf(bits)}%016x")
  }

  test("imageNearDup: 1-bit and 3-bit perturbations pair; 4-bit does not") {
    val base = (0 until 32).filter(_ % 2 == 0).toSet // alternating buckets
    val rows = Seq[(Long, Array[Byte])](
      (1L, payload(base)),
      (2L, payload(base + 33)),           // 1 bit away
      (3L, payload(base ++ Set(35, 37, 39))), // 3 bits away
      (4L, payload(base ++ Set(41, 43, 45, 47))), // 4 bits away
      (5L, null))
    val df = rows.toDF("doc_id", "content")
    val got = Multimodal.imageNearDup(df, "doc_id", "content", maxHamming = 3,
        ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(( 1L, 2L)) == 1L)
    assert(got((1L, 3L)) == 3L)
    assert(!got.contains((1L, 4L)), "4-bit pair must be cut by maxHamming")
    assert(!got.keys.exists(p => p._1 == 5L || p._2 == 5L), "null payload pairs with nothing")
    // 2 vs 3: base+33 vs base+{35,37,39} differ in 4 bits -> absent
    assert(!got.contains((2L, 3L)))
  }

  test("perceptualHash over the corpus payload tier is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val payloads = Multimodal.asBinaryPayload(docs, "doc_id", "text")
    def sigs(parts: Int): Map[Long, Option[String]] =
      Multimodal.perceptualHash(payloads.repartition(parts), "doc_id", "content",
          ordered = false)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val one = sigs(1)
    assert(one == sigs(13) && one.nonEmpty)
    // JVM twin agreement on the raw bytes
    payloads.collect().foreach { r =>
      val expect = Option(r.getAs[Array[Byte]](1)).map(Multimodal.aHashJvm)
      assert(one(r.getLong(0)) == expect.filter(_ != null))
    }
  }
}
