package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Distributed Lloyd's k-means laws:
 *
 *  - IDENTITY: with the sample covering the corpus, [[Clustering.train]]
 *    (full-corpus distributed iterations) is bit-identical to
 *    [[Ivf.kmeans]] (the driver-side trainer) from the same strided
 *    init — same quantization, exact integer sums, HALF-UP means. This
 *    is the strongest possible pin: the distributed aggregate must
 *    reproduce a sequential reference exactly, under any partitioning.
 *  - OBJECTIVE: the entering cost is monotonically non-increasing over
 *    iterations (Lloyd's convergence guarantee holds exactly here
 *    because distances and sums are exact integers).
 *  - EDGES: null vectors/elements excluded; empty clusters keep their
 *    centroid; k > n degrades to n centroids; empty corpus → empty
 *    model. Step arithmetic (assignStats/updateStep) is oracle-pinned
 *    in pq46/pq47; these tests pin the iteration glue.
 */
class ClusteringSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = spark.read.parquet(s"$dir/embeddings.parquet")

  test("distributed train == driver-side Ivf.kmeans when the sample covers the corpus") {
    val n = e.count().toInt
    val sample = e.orderBy("vec_id").limit(n)
      .select(Similarity.quantize(col("embedding")).as("v"))
      .collect().map(_.getSeq[Long](0).toArray)
    val iters = 4
    val expected = Ivf.kmeans(sample, nlist = 8, iters = iters)
    val model = Clustering.train(e.repartition(7), "vec_id", "embedding",
      k = 8, iters = iters, sampleN = n)
    assert(model.centroids.length == expected.length)
    model.centroids.zip(expected).zipWithIndex.foreach { case ((got, want), c) =>
      assert(got.toSeq == want.toSeq, s"centroid $c diverged")
    }
  }

  test("entering objective is monotonically non-increasing across iterations") {
    val model = Clustering.train(e, "vec_id", "embedding", k = 8, iters = 5)
    assert(model.costPerIter.length == 5)
    model.costPerIter.sliding(2).foreach { w =>
      assert(w(1) <= w(0), s"cost increased: ${model.costPerIter.toSeq}")
    }
    info(s"costs: ${model.costPerIter.toSeq}")
  }

  test("assign: every in-space row gets exactly one cluster; nulls drop; ties go low") {
    val cents = Array(Array(0L, 0L), Array(0L, 0L), Array(5000L, 0L))
    val df = TestSpark.df("id bigint, v array<double>", Seq(
      Row(1L, Seq(0.0, 0.1)),
      Row(2L, Seq(5.0, 0.0)),
      Row(3L, null),
      Row(4L, Seq(null, 1.0))))
    val got = Clustering.assign(df, "id", "v", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // centroids 0 and 1 are identical -> exact tie -> lowest index wins
    assert(got == Map(1L -> 0L, 2L -> 2L))
  }

  test("empty clusters keep their previous centroid; k > n degrades to n") {
    val df = TestSpark.df("id bigint, v array<double>", Seq(
      Row(1L, Seq(0.0)), Row(2L, Seq(0.002))))
    // k=5 > n=2 -> 2 centroids; both rows sit at init positions, and the
    // far-away-cluster case: train with explicit centroids via one
    // updateStep — cluster 1 at 9000 catches nothing and must persist
    val model = Clustering.train(df, "id", "v", k = 5, iters = 3)
    assert(model.centroids.length == 2)
    val step = Clustering.updateStep(df, "id", "v",
      Array(Array(0L), Array(9000L))).collect()
    assert(step.map(_.getLong(0)).distinct.toSeq == Seq(0L)) // cluster 1 empty: no row
    assert(step.head.getLong(3) == 1L) // HALF-UP mean of 0 and 2 -> 1
  }

  test("empty corpus trains an empty model; assign under it is empty") {
    val empty = e.filter(col("vec_id") < 0)
    val model = Clustering.train(empty, "vec_id", "embedding", k = 4, iters = 2)
    assert(model.centroids.isEmpty && model.costPerIter.isEmpty)
    assert(Clustering.assign(e, "vec_id", "embedding", model.centroids).isEmpty)
  }

  test("Ivf.topKWith under a full-corpus-trained model: full probe == brute force") {
    val q = e.filter(col("vec_id") < 20)
    val model = Clustering.train(e, "vec_id", "embedding", k = 8, iters = 3)
    val ivf = Ivf.topKWith(e, q, "vec_id", "embedding",
      k = 5, nprobe = model.centroids.length, centroids = model.centroids)
    val brute = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
    assert(ivf.collect().map(_.toSeq).toSet == brute.collect().map(_.toSeq).toSet)
  }

  test("assignment is partitioning-invariant (exact integer arithmetic)") {
    val cents = Clustering.train(e, "vec_id", "embedding", k = 4, iters = 2).centroids
    val a1 = Clustering.assign(e.repartition(1), "vec_id", "embedding", cents, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a13 = Clustering.assign(e.repartition(13), "vec_id", "embedding", cents, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a1 == a13)
  }
}
