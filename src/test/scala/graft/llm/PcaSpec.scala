package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Distributed PCA laws (the moment accumulation is oracle-pinned in
 * pq58):
 *
 *  - fit is BIT-identical across partitionings (exact integer moments
 *    — the double arithmetic starts on the driver);
 *  - momentStats (the oracle view) equals the typed partial-moment
 *    fold fit consumes, slice for slice;
 *  - components are orthonormal, variances descend, and transformed
 *    data has diagonal covariance with exactly those variances;
 *  - full-k projection reconstructs (rotation loses nothing);
 *  - THE POINT (OPQ): on anisotropic embeddings, PQ over the
 *    variance-balanced rotation has lower distortion than PQ over the
 *    raw vectors — measured.
 */
class PcaSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fit is bit-identical across partitionings") {
    val a = Pca.fit(e.repartition(1), "embedding")
    val b = Pca.fit(e.repartition(13), "embedding")
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.variances.toSeq == b.variances.toSeq)
    a.components.zip(b.components).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
  }

  test("momentStats == the typed partial-moment fold, slice for slice") {
    val dims = 8
    val viaStats = Pca.momentStats(e.select(col("embedding")), "embedding", dims,
      ordered = false).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val parts = Pca.partialMoments(e.select(col("embedding")), "embedding").collect()
    val d = parts.head.getSeq[Long](1).length
    def triIdx(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
    for (i <- 0 until dims) {
      val s = parts.map(_.getSeq[Long](1)(i)).sum
      assert(viaStats((i.toLong, -1L)) == s, s"first moment $i")
      for (j <- i until dims) {
        val m = parts.map(_.getSeq[Long](2)(triIdx(i, j))).sum
        assert(viaStats((i.toLong, j.toLong)) == m, s"second moment ($i,$j)")
      }
    }
  }

  test("components orthonormal; variances descend; transformed covariance is diagonal") {
    val model = Pca.fit(e, "embedding")
    val d = model.dim
    for (i <- 0 until d; j <- i until d) {
      val dot = model.components(i).zip(model.components(j)).map(t => t._1 * t._2).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"W[$i].W[$j] = $dot")
    }
    model.variances.sliding(2).foreach(w => assert(w(1) <= w(0) + 1e-12))
    // empirical covariance of the transformed corpus == diag(variances)
    val t = Pca.transform(e, "vec_id", "embedding", model, k = d, ordered = false)
      .select("pca").collect().map(_.getSeq[Double](0).toArray)
    val n = t.length
    val mean = Array.tabulate(d)(c => t.map(_(c)).sum / n)
    // tolerance: the model fits on scale-1000 QUANTIZED vectors while
    // transform projects the raw doubles, so covariance entries carry
    // ~|v| * 5e-4 quantization noise
    for (i <- 0 until d; j <- i until d) {
      val cov = t.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      val want = if (i == j) model.variances(i) else 0.0
      assert(math.abs(cov - want) < 1e-4, s"cov($i,$j) = $cov want $want")
    }
  }

  test("full-k projection reconstructs the centered vectors") {
    val model = Pca.fit(e, "embedding")
    val d = model.dim
    val raw = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    Pca.transform(e, "vec_id", "embedding", model, k = d, ordered = false)
      .collect().take(50).foreach { r =>
        val id = r.getLong(0)
        val proj = r.getSeq[Double](1).toArray
        val centered = raw(id).zip(model.mean).map(t => t._1 - t._2)
        // rebuild: sum_c proj(c) * W_c
        val rebuilt = new Array[Double](d)
        for (c <- 0 until d; i <- 0 until d) rebuilt(i) += proj(c) * model.components(c)(i)
        centered.zip(rebuilt).foreach { case (x, y) =>
          assert(math.abs(x - y) < 1e-8, s"vec $id reconstruction off: $x vs $y")
        }
      }
  }

  test("OPQ: PQ distortion on the balanced rotation beats raw PQ on anisotropic data") {
    // make the embeddings anisotropic: the first 16 dims carry 5x the
    // scale — raw PQ's first subspaces then dominate the error budget
    val skewed = e.select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => (x.cast("double") * when(i < 16, 5.0).otherwise(0.4))).as("embedding"))
    val m = 16
    val rawDist = ProductQuant.distortion(skewed, "vec_id", "embedding",
      ProductQuant.train(skewed, "vec_id", "embedding", m = m, ksub = 16, iters = 4))
    val model = Pca.balancedForPq(Pca.fit(skewed, "embedding"), m)
    val rotated = Pca.transform(skewed, "vec_id", "embedding", model,
      k = model.dim, ordered = false)
    val rotDist = ProductQuant.distortion(rotated, "vec_id", "pca",
      ProductQuant.train(rotated, "vec_id", "pca", m = m, ksub = 16, iters = 4))
    info(f"PQ distortion: raw $rawDist%d vs balanced-PCA $rotDist%d (${rotDist.toDouble / rawDist}%.3f)")
    assert(rotDist < rawDist,
      s"balanced rotation must reduce PQ distortion on anisotropic data: $rotDist >= $rawDist")
  }
}
