package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Rotated (OPQ-style) product quantization laws:
 *
 *  - COMPOSITION: `trainRotated`/`encodeRotated`/`distortionRotated`
 *    are EXACTLY the manual chain `Pca.fit` → `balancedForPq` →
 *    `transform` → `train`/`encode`/`distortion` — the wiring adds no
 *    arithmetic of its own (everything underneath is deterministic, so
 *    this is bit-for-bit equality).
 *  - OBJECTIVE: on variance-concentrated (correlated) vectors, the
 *    balanced rotation beats natural-order PQ at the same (m, ksub)
 *    bit budget — the reason OPQ exists. The fixture packs all
 *    variance into one raw subspace; balancing deals it across
 *    subspaces, so each codebook quantizes a 1-D spread instead of one
 *    codebook absorbing a 2-D spread.
 *  - GUARD: an OpqModel whose rotation and PQ disagree on dims refuses
 *    construction.
 */
class OpqSpec extends AnyFunSuite {
  import TestSpark.spark

  // all variance in raw dims 0-1 (subspace 0 under natural order);
  // dims 2-7 are constant — the OPQ-favoring worst case for natural PQ
  private lazy val correlated = {
    val rows = (0 until 64).map { i =>
      val t = (i % 16) * 2.0 - 15.0
      Row(i.toLong, Seq(3.0 * t, -2.0 * t, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6))
    }
    TestSpark.df("vec_id bigint, embedding array<double>", rows)
  }

  test("composition law: rotated train/encode/distortion == the manual Pca chain, bit for bit") {
    val (m, ksub, iters) = (4, 4, 3)
    val opq = ProductQuant.trainRotated(correlated, "vec_id", "embedding",
      m, ksub, iters)
    val manualRot = Pca.balancedForPq(Pca.fit(correlated, "embedding"), m)
    val rotDf = Pca.transform(correlated, "vec_id", "embedding", manualRot,
      k = manualRot.components.length, outCol = "_rot", ordered = false)
    val manualPq = ProductQuant.train(rotDf, "vec_id", "_rot", m, ksub, iters)
    assert(opq.rotation.components.map(_.toSeq).toSeq ==
      manualRot.components.map(_.toSeq).toSeq)
    assert(opq.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      manualPq.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "trainRotated must be exactly train-on-transformed")
    val composed = ProductQuant.encodeRotated(correlated, "vec_id",
      "embedding", opq, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val manual = ProductQuant.encode(rotDf, "vec_id", "_rot", manualPq,
      ordered = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(composed == manual, "encodeRotated must be exactly encode-on-transformed")
    assert(ProductQuant.distortionRotated(correlated, "vec_id", "embedding", opq) ==
      ProductQuant.distortion(rotDf, "vec_id", "_rot", manualPq))
  }

  test("objective law: balanced rotation beats natural-order PQ on variance-concentrated vectors") {
    val (m, ksub, iters) = (4, 4, 3)
    val plain = ProductQuant.train(correlated, "vec_id", "embedding", m, ksub, iters)
    val opq = ProductQuant.trainRotated(correlated, "vec_id", "embedding", m, ksub, iters)
    val dPlain = ProductQuant.distortion(correlated, "vec_id", "embedding", plain)
    val dRot = ProductQuant.distortionRotated(correlated, "vec_id", "embedding", opq)
    // the rotation is orthonormal, so the two distortions are measured
    // in the same (L2-preserved) units and directly comparable
    assert(dRot < dPlain,
      s"balanced rotation must cut distortion here: rotated $dRot vs plain $dPlain")
  }

  test("search law: adcTopKRotated == adcTopK on the manually rotated frames") {
    val opq = ProductQuant.trainRotated(correlated, "vec_id", "embedding",
      m = 4, ksub = 4, iters = 2)
    val rot = Pca.transform(correlated, "vec_id", "embedding", opq.rotation,
      k = opq.rotation.components.length, outCol = "_rot", ordered = false)
    val queries = correlated.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val qRot = Pca.transform(queries, "vec_id", "embedding", opq.rotation,
      k = opq.rotation.components.length, outCol = "_rot", ordered = false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))
    assert(rows(ProductQuant.adcTopKRotated(correlated, queries, "vec_id",
      "embedding", opq, k = 3, ordered = false)) ==
      rows(ProductQuant.adcTopK(rot, qRot, "vec_id", "_rot", opq.pq,
        k = 3, ordered = false)),
      "rotated search must be exactly search-on-rotated")
  }

  test("guard: rotation/PQ dimensionality mismatch refuses construction") {
    val opq = ProductQuant.trainRotated(correlated, "vec_id", "embedding",
      m = 4, ksub = 2, iters = 1)
    intercept[IllegalArgumentException] {
      ProductQuant.OpqModel(
        Pca.PcaModel(Array(0.0, 0.0), Array(Array(1.0, 0.0), Array(0.0, 1.0)),
          Array(1.0, 1.0)),
        opq.pq)
    }
  }
}
