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

  test("snapshotDrift: identity reads 1.0/1.0, inversion reads -1.0, one-sided cells carry nulls") {
    // two well-separated cells in quantized units
    val cents = Array(Array(100L, 0L), Array(0L, 100L))
    def df(rows: Seq[Row]) =
      TestSpark.df("vec_id bigint, embedding array<float>", rows)
    val old = df(Seq(
      Row(1L, Seq(0.09f, 0.005f)), Row(2L, Seq(0.08f, 0.01f)), // cell 0
      Row(3L, Seq(0.005f, 0.09f))))                            // cell 1
    // identical snapshots: no drift anywhere
    val same = Clustering.snapshotDrift(old, old, "vec_id", "embedding",
      cents, ordered = false).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(same(0L) == ((2L, 2L, 1.0, 1.0)) && same(1L) == ((1L, 1L, 1.0, 1.0)))
    // cell 0 doubles and keeps its direction EXACTLY (same members
    // twice → sum vector scales; cosine of collinear sums is 1.0);
    // cell 1 empties out → occupancy facts with null ratio/cosine
    val grown = df(Seq(
      Row(1L, Seq(0.09f, 0.005f)), Row(2L, Seq(0.08f, 0.01f)),
      Row(11L, Seq(0.09f, 0.005f)), Row(12L, Seq(0.08f, 0.01f))))
    val g = Clustering.snapshotDrift(old, grown, "vec_id", "embedding",
      cents, ordered = false).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(g(0L).getDouble(3) == 2.0 && g(0L).getDouble(4) == 1.0)
    assert(g(1L).getLong(1) == 1L && g(1L).getLong(2) == 0L &&
      g(1L).getDouble(3) == 0.0 && g(1L).isNullAt(4),
      s"an emptied cell reads ratio 0 and a null cosine: ${g(1L)}")
    // a corpus against its exact negation: the cell's sum vectors are
    // antipodal, so the integer-sum cosine is exactly −1
    val twoDocs = df(Seq(Row(1L, Seq(0.09f, 0.005f)),
      Row(2L, Seq(0.08f, 0.01f))))
    val flipped = df(Seq(Row(1L, Seq(-0.09f, -0.005f)),
      Row(2L, Seq(-0.08f, -0.01f))))
    val f = Clustering.snapshotDrift(twoDocs, flipped, "vec_id", "embedding",
      Array(Array(85L, 8L)), ordered = false).collect()
    assert(f.length == 1 && f.head.getDouble(4) == -1.0, f.mkString(","))
    // bit-identical under repartitioning (integer sums all the way)
    val re = Clustering.snapshotDrift(old.repartition(5),
      grown.repartition(7), "vec_id", "embedding", cents, ordered = false)
      .collect().map(r => r.toSeq).toSet
    assert(re == Clustering.snapshotDrift(old, grown, "vec_id", "embedding",
      cents, ordered = false).collect().map(_.toSeq).toSet)
  }
}
