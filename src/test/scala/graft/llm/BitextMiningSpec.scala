package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Margin-based bitext mining laws:
 *
 *  - the emitted pair is the margin-argmax within the forward top-k;
 *  - an exact-copy target wins its source;
 *  - hub suppression — the property the ratio margin exists for: a
 *    target cosine-close to EVERYTHING loses to a mutually-exclusive
 *    partner even when its raw cosine is higher;
 *  - margins replicate a JVM-side recomputation from the quantized
 *    vectors (the operator's own arithmetic, independently coded);
 *  - the minMargin keep/drop is inclusive on the rounded margin;
 *  - deterministic across partitionings.
 */
class BitextMiningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("exact-copy target wins its source; one row per source; subset of forward top-k") {
    val src = df(Seq(1L -> Seq(1.0f, 0.0f, 0.0f), 2L -> Seq(0.0f, 1.0f, 0.0f)))
    val tgt = df(Seq(
      101L -> Seq(1.0f, 0.0f, 0.0f),   // copy of src 1
      102L -> Seq(0.0f, 0.98f, 0.1f),  // near-copy of src 2
      103L -> Seq(0.5f, 0.5f, 0.7f),
      104L -> Seq(0.3f, 0.2f, 0.9f)))
    val out = BitextMining.marginTopPairs(src, tgt, "vec_id", "embedding",
        k = 3, minMargin = 0.0, ordered = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L), "one row per source")
    assert(out.find(_._1 == 1L).get._2 == 101L, "the exact copy must win")
    assert(out.find(_._1 == 2L).get._2 == 102L)
    assert(out.forall(_._3 > 1.0),
      "a clear best pair scores above its neighborhood average")
  }

  test("hub suppression: the margin argmax differs from the raw-cos argmax") {
    // clustered sources a/b/c around the x-axis; the HUB h sits at the
    // cluster's center (raw-nearest to a, and near b and c too, so its
    // backward neighborhood average is inflated); the exclusive
    // partner t tilts out of the cluster plane — slightly farther from
    // a by raw cos, but its starved neighborhood wins on margin.
    // Hand-computed on the rounded quantized cosines:
    //   margin(a, h) = 0.9998/0.9990   = 1.000801
    //   margin(a, t) = 0.9996/0.998375 = 1.001227  → t wins
    val src = df(Seq(
      1L -> Seq(1.0f, 0.0f, 0.0f),
      2L -> Seq(0.995f, 0.0999f, 0.0f),
      3L -> Seq(0.995f, -0.0999f, 0.0f)))
    val tgt = df(Seq(
      100L -> Seq(1.0f, 0.02f, 0.0f),      // hub: cluster center
      101L -> Seq(0.9996f, 0.0f, -0.03f),  // exclusive partner of src 1
      102L -> Seq(0.0f, 0.0f, 1.0f)))      // filler
    val fwd = Similarity.cosineTopK(tgt, src, "vec_id", "embedding", k = 3,
        ordered = false)
      .filter(col("qid") === 1L && col("rnk") === 1L)
      .collect()
    assert(fwd.head.getLong(2) == 100L,
      s"fixture must make the hub the raw-cos winner (got ${fwd.head.toSeq})")
    val out = BitextMining.marginTopPairs(src, tgt, "vec_id", "embedding",
        k = 2, minMargin = 0.0, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 101L,
      "the margin must suppress the hub in favor of the exclusive partner")
  }

  test("margins replicate an independent JVM recomputation from the quantized vectors") {
    val srcRows = Seq(1L -> Seq(0.9f, 0.2f, 0.1f), 2L -> Seq(0.1f, 0.8f, 0.4f))
    val tgtRows = Seq(10L -> Seq(0.8f, 0.3f, 0.0f), 11L -> Seq(0.2f, 0.9f, 0.3f),
      12L -> Seq(0.5f, 0.5f, 0.5f))
    val k = 2

    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 1000)).toArray
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum
      val nb = b.map(x => x * x).sum
      dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def topk(q: (Long, Array[Long]), side: Seq[(Long, Array[Long])]) =
      side.map { case (id, v) => (id, cos(q._2, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k)
        .map { case (id, c) => (id, round4(c)) }

    val srcQ = srcRows.map { case (i, v) => (i, quant(v)) }
    val tgtQ = tgtRows.map { case (i, v) => (i, quant(v)) }
    val fwd = srcQ.map(q => q._1 -> topk(q, tgtQ)).toMap
    val xavg = fwd.view.mapValues(l => l.map(_._2).sum / l.size).toMap
    val cands = fwd.values.flatten.map(_._1).toSet
    val bwd = tgtQ.filter(t => cands(t._1)).map(t => t._1 -> topk(t, srcQ)).toMap
    val yavg = bwd.view.mapValues(l => l.map(_._2).sum / l.size).toMap
    val expected = fwd.map { case (q, tops) =>
      val best = tops.map { case (c, cs) =>
        (c, cs, cs / (0.5 * (xavg(q) + yavg(c))))
      }.maxBy { case (c, _, m) => (m, -c) }
      q -> (best._1, best._2, round6(best._3))
    }

    val out = BitextMining.marginTopPairs(df(srcRows), df(tgtRows),
        "vec_id", "embedding", k = k, minMargin = 0.0, ordered = false)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out == expected)
  }

  test("minMargin is inclusive on the rounded margin; determinism across partitionings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val src = e.filter(col("vec_id") < 10)
    val tgt = e.filter(col("vec_id") >= 10)
    val all = BitextMining.marginTopPairs(src, tgt, "vec_id", "embedding",
        k = 4, minMargin = 0.0, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(all.nonEmpty)
    val cut = all.map(_._3).sorted.apply(all.length / 2)
    val kept = BitextMining.marginTopPairs(src, tgt, "vec_id", "embedding",
        k = 4, minMargin = cut, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(kept.toSet == all.filter(_._3 >= cut).toSet,
      "the threshold must be inclusive on the rounded margin")
    assert(kept.length < all.length, "the cut must actually drop pairs")
    val repart = BitextMining.marginTopPairs(src.repartition(7),
        tgt.repartition(13), "vec_id", "embedding",
        k = 4, minMargin = cut, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(repart.toSet == kept.toSet)
  }

  test("retriever-agnostic: the margin tail over the full-probe IVF retriever emits pairs identical to the brute-force arm") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val src = e.filter(col("vec_id") < 10)
    val tgt = e.filter(col("vec_id") >= 10)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val brute = rows(BitextMining.marginTopPairs(src, tgt, "vec_id",
      "embedding", k = 4, minMargin = 1.0, ordered = false))
    // nprobe = nlist probes every cell — the pq19 law: candidates,
    // cosines, ranks all identical, so the margin tail must be too
    val ivf = rows(BitextMining.marginTopPairsWith(src, tgt, "vec_id",
      (corpus, queries) => Ivf.topK(corpus, queries, "vec_id", "embedding",
        k = 4, nlist = 8, nprobe = 8, ordered = false),
      k = 4, minMargin = 1.0, ordered = false))
    assert(ivf == brute)
    assert(brute.nonEmpty)
  }
}
