package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * IVF (inverted-file) approximate nearest neighbor: a LEARNED coarse
 * quantizer, the classic alternative to [[Similarity]]'s LSH buckets.
 * A small deterministic k-means partitions the embedding space into
 * `nlist` cells; every corpus vector is assigned to its nearest
 * centroid's inverted list, and each query scores only the vectors in
 * its `nprobe` nearest lists.
 *
 * Scale shape (standard IVF practice — e.g. the FAISS IVF design):
 *  - TRAIN on a bounded sample: k-means runs driver-side over the
 *    lowest-id `sampleN` vectors (deterministic sample; centroids are
 *    `nlist * dim` longs — kilobytes). Training cost is independent of
 *    corpus size.
 *  - ASSIGN distributed: centroids broadcast; one typed `mapPartitions`
 *    argmin pass per side — no shuffle, no per-pair work.
 *  - SEARCH is the same join shape as [[Similarity.bucketedTopK]]: one
 *    shuffle on the int list id (cells ~ corpusSize/nlist rows), the
 *    query side exploded `nprobe`x, the corpus never replicated; exact
 *    integer-quantized scoring + bounded per-partition heaps downstream.
 *
 * Determinism: quantized integer vectors, id-ordered sampling, strided
 * init, fixed iteration count, and HALF-UP mean rounding make the
 * centroids — and therefore the full result — reproducible across runs,
 * JVMs and partitionings. With `nprobe == nlist` every cell is probed,
 * so the result provably equals [[Similarity.cosineTopK]] — that
 * identity is the oracle hook (pq19) and the correctness pin for the
 * whole train/assign/probe path; recall-vs-nprobe is pinned in tests.
 */
object Ivf {

  /**
   * Deterministic k-means over quantized vectors (driver-side; inputs
   * are sample-sized by contract). Init = `nlist` evenly strided
   * vectors of the id-ordered sample; `iters` Lloyd rounds; empty
   * cells keep their previous centroid; means round HALF-UP like
   * [[Similarity.quantize]].
   */
  private[llm] def kmeans(sample: Array[Array[Long]], nlist: Int, iters: Int): Array[Array[Long]] = {
    // empty corpus -> no centroids -> no assignments -> empty result,
    // matching cosineTopK on the same (fully filtered) input
    if (sample.isEmpty) return Array.empty
    val k = math.min(nlist, sample.length)
    val dim = sample.head.length
    var centroids = Array.tabulate(k)(i => sample((i.toLong * sample.length / k).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Long](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        val s = sums(c)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val s = sums(c)
          Array.tabulate(dim)(i =>
            java.math.BigDecimal.valueOf(s(i).toDouble / counts(c))
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
        }
      }
      it += 1
    }
    centroids
  }

  /** Index of the nearest centroid by squared L2 distance; for a fixed
   *  vector that is argmin of `n2c - 2*(v . c)` (the `|v|^2` term is
   *  constant), computed exactly in BIGINT. Ties break to the lowest
   *  centroid index. */
  private[llm] def nearest(v: Array[Long], centroids: Array[Array[Long]]): Int = {
    var best = 0
    var bestScore = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var dotVC = 0L
      var n2c = 0L
      var i = 0
      val n = math.min(v.length, ct.length)
      while (i < n) { dotVC += v(i) * ct(i); n2c += ct(i) * ct(i); i += 1 }
      val score = n2c - 2 * dotVC
      if (score < bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  /** `nprobe` nearest centroid indices in ascending distance order
   *  (ties to the lower index) — the query-side probe set. */
  private[llm] def nearestN(v: Array[Long], centroids: Array[Array[Long]], nprobe: Int): Array[Int] =
    centroids.indices.map { c =>
      val ct = centroids(c)
      var dotVC = 0L
      var n2c = 0L
      var i = 0
      val n = math.min(v.length, ct.length)
      while (i < n) { dotVC += v(i) * ct(i); n2c += ct(i) * ct(i); i += 1 }
      (n2c - 2 * dotVC, c)
    }.sorted.take(math.min(nprobe, centroids.length)).map(_._2).toArray

  /** Append the int probe column(s) via a broadcast-centroid typed pass:
   *  one `_list` per corpus row, `nprobe` exploded rows per query. */
  private def withLists(prepped: DataFrame, centroids: Array[Array[Long]],
      nprobe: Int, listCol: String): DataFrame = {
    val bc = prepped.sparkSession.sparkContext.broadcast(centroids)
    val outSchema = StructType(prepped.schema.fields :+
      StructField(listCol, IntegerType, nullable = false))
    prepped.mapPartitions { rows =>
      val cents = bc.value
      if (cents.isEmpty) Iterator.empty // untrained: empty corpus upstream
      else rows.flatMap { r =>
        val v = r.getSeq[Long](1).toArray
        if (nprobe <= 1) Iterator.single(Row.fromSeq(r.toSeq :+ nearest(v, cents)))
        else nearestN(v, cents, nprobe).iterator.map(c => Row.fromSeq(r.toSeq :+ c))
      }
    }(Encoders.row(outSchema))
  }

  /**
   * IVF top-k search. Output (qid, rnk, cid, cos) — the
   * [[Similarity.cosineTopK]] contract; `nprobe == nlist` reproduces it
   * exactly, smaller `nprobe` trades recall for a ~nlist/nprobe
   * candidate reduction.
   */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int, nprobe: Int, iters: Int = 5, sampleN: Int = 4096,
      ordered: Boolean = true): DataFrame = {
    require(nlist >= 1 && nprobe >= 1 && iters >= 0 && sampleN >= 1)
    val (c0, q0) = Similarity.prepSides(corpus, queries, idCol, vecCol)
    // prep is consumed by the sample collect AND the assignment scan —
    // deliberately NOT cached: the sample is a TakeOrdered top-N (per-
    // partition heads, no shuffle) and the assignment re-scans the
    // pruned columnar source, which at corpus scale is far cheaper than
    // materializing the whole projected corpus into the block store
    // (and measurably faster at bench scale too)
    val sample = c0.orderBy("cid").limit(sampleN)
      .select("_vc").collect().map(_.getSeq[Long](0).toArray)
    val centroids = kmeans(sample, nlist, iters)
    search(c0, q0, centroids, k, nprobe, ordered)
  }

  /**
   * IVF search under a caller-supplied coarse quantizer — the hook for
   * [[Clustering.train]]'s full-corpus distributed trainer (the
   * 100 TB-scale alternative to this file's bounded-sample k-means:
   * same model shape, trained by distributed passes instead of a
   * driver loop). Same output contract as [[topK]]; with
   * `nprobe >= centroids.length` it probes every cell and equals
   * [[Similarity.cosineTopK]] exactly (pinned in ClusteringSpec twin
   * tests alongside pq19's sampled-trainer pin).
   */
  def topKWith(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, centroids: Array[Array[Long]],
      ordered: Boolean = true): DataFrame = {
    require(nprobe >= 1, s"topKWith: need nprobe >= 1; got $nprobe")
    val (c0, q0) = Similarity.prepSides(corpus, queries, idCol, vecCol)
    search(c0, q0, centroids, k, nprobe, ordered)
  }

  /** The shared assign/probe/score tail: one broadcast argmin pass per
    * side, one shuffle on the int list id, bounded per-partition heaps. */
  private def search(c0: DataFrame, q0: DataFrame, centroids: Array[Array[Long]],
      k: Int, nprobe: Int, ordered: Boolean): DataFrame = {
    val c = withLists(c0, centroids, nprobe = 1, "_list")
    val q = withLists(q0, centroids, nprobe = nprobe, "_probe")
    val pairs = c
      .join(q, col("_probe") === col("_list") && col("qid") =!= col("cid"))
      .select(Similarity.PairCols: _*)
    Similarity.ranked(Similarity.scorePairs(pairs, k), k, ordered)
  }
}
