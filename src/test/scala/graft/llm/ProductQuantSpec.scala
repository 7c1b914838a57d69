package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Product quantization laws:
 *
 *  - ADC IDENTITY: `adcTopK`'s distance is EXACTLY the squared L2
 *    distance between the query and the corpus vector's reconstruction
 *    (decode codes through the codebooks) — verified row-for-row
 *    against a driver-side recomputation from `encode`'s own output.
 *  - OBJECTIVE: total corpus distortion is monotonically non-increasing
 *    in training iterations (exact-integer Lloyd per subspace).
 *  - RECALL: measured recall@10 of ADC top-k against the exact L2
 *    answer on identical queries, with a stated floor — the number a
 *    user sizing (m, ksub) needs (pq48/pq49 pin arithmetic, not
 *    usefulness).
 *  - EDGES: wrong dimensionality is a hard error; partitioning never
 *    changes codes; self is excluded.
 */
class ProductQuantSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = spark.read.parquet(s"$dir/embeddings.parquet")
  // m=16 four-dim subspaces: synthetic embeddings have no cluster
  // structure, so recall needs fine-grained cells (the m knob); the
  // laws below hold for ANY model — only the recall floor cares
  private lazy val model = ProductQuant.train(e, "vec_id", "embedding",
    m = 16, ksub = 16, iters = 4)

  private def quantized: Map[Long, Array[Long]] =
    e.select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  test("ADC distance == exact squared L2 to the reconstruction, row for row") {
    val codes = ProductQuant.encode(e, "vec_id", "embedding", model, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecs = quantized
    val recon = codes.map { case (id, cs) =>
      id -> cs.zipWithIndex.flatMap { case (c, s) => model.codebooks(s)(c) }
    }
    val got = ProductQuant.adcTopK(e, e.filter(col("vec_id") < 30),
      "vec_id", "embedding", model, k = 5, ordered = false).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (qid, cid, dist) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val q = vecs(qid)
      val rc = recon(cid)
      var want = 0L
      var i = 0
      while (i < q.length) { val d = q(i) - rc(i); want += d * d; i += 1 }
      assert(dist == want, s"ADC($qid,$cid)=$dist but reconstruction distance is $want")
    }
  }

  test("training distortion is monotonically non-increasing in iterations") {
    val ds = (0 to 3).map { it =>
      ProductQuant.distortion(e, "vec_id", "embedding",
        ProductQuant.train(e, "vec_id", "embedding", m = 4, ksub = 8, iters = it))
    }
    info(s"distortion by iters: $ds")
    ds.sliding(2).foreach(w => assert(w(1) <= w(0), s"distortion rose: $ds"))
  }

  /** Exact L2 top-10 per query, computed driver-side — ground truth for
    * the recall rows and the refine-exactness pin. */
  private def exactTop10: Map[Long, Seq[Long]] = {
    val vecs = quantized
    vecs.keys.filter(_ < 50).map { qid =>
      val q = vecs(qid)
      qid -> vecs.iterator.filter(_._1 != qid).map { case (cid, v) =>
        var d2 = 0L
        var i = 0
        while (i < q.length) { val d = q(i) - v(i); d2 += d * d; i += 1 }
        (d2, cid)
      }.toSeq.sorted.take(10).map(_._2)
    }.toMap
  }

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("measured recall@10: plain ADC holds its floor; exact re-rank lifts it") {
    val truth = exactTop10.map { case (q, t) => q -> t.toSet }
    def recall(approx: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    val qdf = e.filter(col("vec_id") < 50)
    val plain = recall(topkSets(ProductQuant.adcTopK(
      e, qdf, "vec_id", "embedding", model, k = 10, ordered = false)))
    val refined = recall(topkSets(ProductQuant.adcTopKRefined(
      e, qdf, "vec_id", "embedding", model, k = 10, refine = 5, ordered = false)))
    info(f"PQ(m=16, ksub=16) recall@10: adc $plain%.3f, adc+refine5 $refined%.3f")
    assert(plain >= 0.25, f"plain ADC recall@10 $plain%.3f below floor 0.25")
    assert(refined >= plain, "exact re-rank over an ADC shortlist cannot lose recall")
    assert(refined >= 0.6, f"refined recall@10 $refined%.3f below floor 0.6")
  }

  test("refine covering the corpus == exact brute-force top-k, including distances") {
    val truth = exactTop10
    val got = ProductQuant.adcTopKRefined(e, e.filter(col("vec_id") < 50),
      "vec_id", "embedding", model, k = 10, refine = 50, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got.keySet == truth.keySet)
    got.foreach { case (q, cids) => assert(cids == truth(q), s"query $q diverged") }
  }

  test("IVF-PQ: full probe == whole-corpus ADC; coded index matches encode") {
    val centroids = Clustering.train(e, "vec_id", "embedding", k = 8, iters = 3).centroids
    val coded = ProductQuant.buildCodedIndex(e, "vec_id", "embedding",
      centroids, model, ordered = false)
    // index codes agree with the standalone encoder
    val idxCodes = coded.select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val encCodes = ProductQuant.encode(e, "vec_id", "embedding", model, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(idxCodes == encCodes)
    val q = e.filter(col("vec_id") < 30)
    val full = ProductQuant.ivfAdcTopK(coded, q, "vec_id", "embedding",
      centroids, model, k = 5, nprobe = centroids.length, ordered = false)
    val adc = ProductQuant.adcTopK(e, q, "vec_id", "embedding", model, k = 5, ordered = false)
    assert(full.collect().map(_.toSeq).toSet == adc.collect().map(_.toSeq).toSet)
  }

  test("IVF-PQ recall@10 is monotone in nprobe and measured per knob") {
    val centroids = Clustering.train(e, "vec_id", "embedding", k = 8, iters = 3).centroids
    val coded = ProductQuant.buildCodedIndex(e, "vec_id", "embedding",
      centroids, model, ordered = false)
    val q = e.filter(col("vec_id") < 50)
    val adcTruth = topkSets(ProductQuant.adcTopK(
      e, q, "vec_id", "embedding", model, k = 10, ordered = false))
    def recallVsAdc(approx: Map[Long, Set[Long]]): Double =
      adcTruth.map { case (qq, t) =>
        approx.getOrElse(qq, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / adcTruth.size
    val byProbe = Seq(1, 2, 4, 8).map { p =>
      p -> recallVsAdc(topkSets(ProductQuant.ivfAdcTopK(coded, q, "vec_id", "embedding",
        centroids, model, k = 10, nprobe = p, ordered = false)))
    }
    info(byProbe.map { case (p, r) => f"nprobe=$p $r%.3f" }
      .mkString("IVF-PQ recall@10 vs full ADC: ", ", ", ""))
    byProbe.sliding(2).foreach { w =>
      assert(w(1)._2 >= w(0)._2, s"recall fell with more probes: $byProbe")
    }
    assert(byProbe.last._2 == 1.0, "nprobe == nlist must reproduce full ADC")
    assert(byProbe.head._2 >= 0.2, f"nprobe=1 recall ${byProbe.head._2}%.3f below floor 0.2")
  }

  test("wrong input dimensionality is a hard error, not silent truncation") {
    val bad = TestSpark.df("id bigint, v array<double>", Seq(Row(1L, Seq(1.0, 2.0))))
    val ex = intercept[Exception] {
      ProductQuant.encode(bad, "id", "v", model).collect()
    }
    assert(ex.getMessage != null)
  }

  test("codes are partitioning-invariant") {
    def codesOf(parts: Int) =
      ProductQuant.encode(e.repartition(parts), "vec_id", "embedding", model, ordered = false)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codesOf(1) == codesOf(11))
  }

  test("self is excluded from ADC results") {
    val got = ProductQuant.adcTopK(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", model, k = 1000, ordered = false)
      .filter(col("qid") === col("cid"))
    assert(got.isEmpty)
  }
}
