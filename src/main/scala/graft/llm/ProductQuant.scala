package graft.llm

import graft.Presented
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * Product quantization (PQ) for embedding columns — the standard
 * memory-footprint path for corpus-scale similarity (Jégou et al.,
 * "Product Quantization for Nearest Neighbor Search", and the FAISS
 * IVF-PQ design): split each dim-d vector into `m` contiguous
 * subvectors of d/m dims, learn a small k-means codebook per subspace,
 * and store each corpus vector as `m` small codes. At 100 TB this is
 * the difference between shuffling/holding d floats per row and m
 * bytes per row (d=768, m=16 → 48x smaller), and queries score corpus
 * rows with table lookups instead of full dot products.
 *
 * Training follows [[Clustering]]'s distributed discipline — ONE corpus
 * pass per Lloyd iteration jointly over all m subspaces (broadcast
 * codebooks, typed per-row argmin per subspace, then a single
 * map-side-combined posexplode aggregate keyed by (sub, code, pos)
 * whose output is model-sized, never corpus-sized). Exact
 * integer-quantized arithmetic end-to-end: assignments, per-sub
 * distortions and ADC distances are BIGINTs, so results are
 * partitioning-invariant and oracle-checkable bit-for-bit (pq48
 * encode, pq49 ADC top-k).
 *
 * Asymmetric distance computation (ADC): queries stay unquantized (to
 * codes — they are still integer-quantized like everything here);
 * `adcTopK` broadcasts the |Q|-bounded query set, builds each query's
 * m * ksub lookup table once per partition, and scans the coded corpus
 * with per-partition bounded heaps — the [[Similarity.cosineTopK]]
 * shape, but each row costs m array lookups instead of d multiplies.
 * ADC distance is EXACTLY the squared L2 distance between the query
 * and the corpus vector's reconstruction (pinned in ProductQuantSpec),
 * so its error is precisely the corpus-side quantization distortion.
 */
object ProductQuant {

  /** Trained model: `codebooks(s)(c)` is the quantized centroid of code
    * `c` in subspace `s` (length d/m each). */
  final case class PqModel(m: Int, dsub: Int, codebooks: Array[Array[Array[Long]]]) {
    require(codebooks.length == m && codebooks.forall(_.forall(_.length == dsub)),
      s"PqModel: codebooks must be m=$m subspaces of dsub=$dsub-dim centroids")
    def dim: Int = m * dsub
  }

  /** Argmin code for the subvector at `off ..< off + dsub` — exact
    * BIGINT squared distance, ties to the lowest code. Returns
    * (code, d2). */
  private def nearestSub(v: Array[Long], off: Int, dsub: Int,
      codebook: Array[Array[Long]]): (Int, Long) = {
    var best = 0
    var bestD2 = Long.MaxValue
    var c = 0
    while (c < codebook.length) {
      val ct = codebook(c)
      var d2 = 0L
      var p = 0
      while (p < dsub) { val d = v(off + p) - ct(p); d2 += d * d; p += 1 }
      if (d2 < bestD2) { bestD2 = d2; best = c }
      c += 1
    }
    (best, bestD2)
  }

  /** The shared typed encode pass: (_id, _codes array<int> (m), _v,
    * _d2s array<long> (m, per-sub distortion)). Null vectors drop;
    * vectors of the wrong dimensionality are a hard error (a silent
    * truncation would quantize garbage). */
  private def encoded(df: DataFrame, idCol: String, vecCol: String,
      cbs: Array[Array[Array[Long]]], dsub: Int): DataFrame = {
    val m = cbs.length
    val prepped = Similarity.prepTyped(df, idCol, "_id", vecCol)
      .filter(col("_v").isNotNull)
    val bc = prepped.sparkSession.sparkContext.broadcast(cbs)
    val outSchema = StructType(Seq(
      prepped.schema("_id"),
      StructField("_codes", ArrayType(IntegerType, containsNull = false), nullable = false),
      prepped.schema("_v"),
      StructField("_d2s", ArrayType(LongType, containsNull = false), nullable = false)))
    prepped.mapPartitions { rows =>
      val books = bc.value
      rows.map { r =>
        val v = r.getSeq[Long](1).toArray
        require(v.length == m * dsub,
          s"ProductQuant: vector of dim ${v.length}, model expects ${m * dsub}")
        val codes = new Array[Int](m)
        val d2s = new Array[Long](m)
        var s = 0
        while (s < m) {
          val (c, d2) = nearestSub(v, s * dsub, dsub, books(s))
          codes(s) = c
          d2s(s) = d2
          s += 1
        }
        Row(r.get(0), codes.toSeq, r.get(1), d2s.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Per-row PQ codes under a fixed model: (idCol, codes array<int>).
    * One broadcast argmin pass, no shuffle. */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: PqModel,
      ordered: Boolean = true): DataFrame =
    encoded(df, idCol, vecCol, model.codebooks, model.dsub)
      .select(col("_id").as(idCol), col("_codes").as("codes"))
      .transform(Presented(_, ordered, idCol))

  /** Flattened encode for the SQL oracle: one (idCol, sub, code) row
    * per subspace. */
  def encodeFlat(df: DataFrame, idCol: String, vecCol: String, model: PqModel,
      ordered: Boolean = true): DataFrame =
    encoded(df, idCol, vecCol, model.codebooks, model.dsub)
      .select(col("_id").as(idCol), posexplode(col("_codes")).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast("long").as("sub"), col("code").cast("long").as("code"))
      .transform(Presented(_, ordered, idCol, "sub"))

  /** The one-job joint update aggregation over all m subspaces: per
    * (sub, code, pos-in-sub) the exact BIGINT component sum; count and
    * per-sub distortion ride the pos-in-sub = 0 guard. Output rows:
    * m * ksub * dsub — model-sized. */
  private def rawUpdate(enc: DataFrame, dsub: Int): DataFrame = {
    val perPos = enc.select(col("_codes"), col("_d2s"),
      posexplode(col("_v")).as(Seq("_pos", "_val")))
      .select(
        (col("_pos") / dsub).cast("int").as("_sub"),
        pmod(col("_pos"), lit(dsub)).as("_p"),
        element_at(col("_codes"), (col("_pos") / dsub).cast("int") + 1).as("_code"),
        element_at(col("_d2s"), (col("_pos") / dsub).cast("int") + 1).as("_d2"),
        col("_val"))
    perPos.groupBy("_sub", "_code", "_p").agg(
      sum("_val").as("_s"),
      sum(when(col("_p") === 0, lit(1L)).otherwise(lit(0L))).as("_n"),
      sum(when(col("_p") === 0, col("_d2")).otherwise(lit(0L))).as("_cost"))
  }

  /**
   * Distributed PQ training: `iters` joint Lloyd rounds over all m
   * subspaces, one corpus pass + one model-sized aggregate each. Init:
   * per-subspace evenly strided subvectors of the id-ordered
   * `sampleN`-bounded prefix (the [[Ivf.kmeans]]/[[Clustering.train]]
   * discipline). Empty codes keep their previous centroid. The corpus
   * dimensionality must divide by `m`.
   */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int,
      iters: Int, sampleN: Int = 4096): PqModel = {
    require(m >= 1 && ksub >= 1 && iters >= 0 && sampleN >= 1,
      s"train: need m, ksub, sampleN >= 1 and iters >= 0; got m=$m ksub=$ksub iters=$iters sampleN=$sampleN")
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(idCol).limit(sampleN)
      .transform(Similarity.prepTyped(_, idCol, "_id", vecCol))
      .filter(col("_v").isNotNull)
      .select("_v").collect().map(_.getSeq[Long](0).toArray)
    require(sample.nonEmpty, "train: no non-null vectors to train on")
    val dim = sample.head.length
    require(dim % m == 0, s"train: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val kk = math.min(ksub, sample.length)
    var cbs: Array[Array[Array[Long]]] = Array.tabulate(m) { s =>
      Array.tabulate(kk) { c =>
        val v = sample((c.toLong * sample.length / kk).toInt)
        java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)
      }
    }
    var it = 0
    while (it < iters) {
      val rows = rawUpdate(encoded(df, idCol, vecCol, cbs, dsub), dsub).collect()
      // counts ride only the pos-in-sub = 0 rows of the aggregate; fan
      // them out per (sub, code) driver-side (rows are model-sized)
      val nBy = rows.iterator.filter(_.getInt(2) == 0)
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(4)).toMap
      val next = cbs.map(_.map(_.clone()))
      rows.foreach { r =>
        val (s, c, p, sm) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))
        val n = nBy((s, c))
        if (n > 0)
          next(s)(c)(p) = java.math.BigDecimal.valueOf(sm.toDouble / n)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }
      cbs = next
      it += 1
    }
    PqModel(m, dsub, cbs)
  }

  /** Total corpus distortion (sum over rows and subspaces of the exact
    * BIGINT squared reconstruction error) — the training objective, for
    * distortion-vs-(m, ksub) tuning. One pass, one scalar. */
  def distortion(df: DataFrame, idCol: String, vecCol: String, model: PqModel): Long = {
    val d = encoded(df, idCol, vecCol, model.codebooks, model.dsub)
      .select(aggregate(col("_d2s"), lit(0L), (acc, x) => acc + x).as("_d"))
      .agg(coalesce(sum("_d"), lit(0L))).head.getLong(0)
    d
  }

  // ------------------------------------------------------------------
  // OPQ-style rotated PQ: variance-balanced PCA rotation, then PQ
  // ------------------------------------------------------------------

  /** Rotated-PQ model: an orthonormal PCA rotation with
    * eigenvalue-balanced subspace allocation ([[Pca.balancedForPq]] —
    * Ge et al.'s "natural" OPQ baseline), plus a [[PqModel]] trained in
    * the rotated space. Encode/search ONLY through the pair: codes of a
    * rotated model are meaningless against raw vectors. */
  final case class OpqModel(rotation: Pca.PcaModel, pq: PqModel) {
    require(rotation.components.length == pq.m * pq.dsub,
      s"OpqModel: rotation spans ${rotation.components.length} dims, " +
        s"PQ expects ${pq.m * pq.dsub}")
  }

  private def rotated(df: DataFrame, idCol: String, vecCol: String,
      rotation: Pca.PcaModel): DataFrame =
    Pca.transform(df, idCol, vecCol, rotation,
      k = rotation.components.length, outCol = "_rot", ordered = false)

  /**
   * OPQ wiring in one call: [[Pca.fit]] → [[Pca.balancedForPq]] →
   * [[Pca.transform]] → [[train]] in the rotated space. PQ quantizes
   * each subspace independently, so correlated dims concentrated in a
   * few raw coordinates waste codebook entropy; rotating to
   * decorrelated coordinates and dealing eigenvalues round-robin
   * across the m subspaces balances per-subspace variance — lower
   * distortion for the same (m, ksub) bit budget on correlated
   * embeddings. Costs one extra corpus pass per training round (the
   * rotation projection); the PCA fit itself is one shuffle-free pass +
   * a driver-side O(d^3) eigendecomposition.
   */
  def trainRotated(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, iters: Int, sampleN: Int = 4096,
      pcaScale: Int = 1000): OpqModel = {
    val rotation = Pca.balancedForPq(Pca.fit(df, vecCol, pcaScale), m)
    OpqModel(rotation,
      train(rotated(df, idCol, vecCol, rotation), idCol, "_rot", m, ksub,
        iters, sampleN))
  }

  /** [[encode]] through the model's rotation: rotate, then code. Same
    * output shape as [[encode]]; same no-shuffle scale shape (the
    * rotation is a broadcast-model typed pass). */
  def encodeRotated(df: DataFrame, idCol: String, vecCol: String,
      model: OpqModel, ordered: Boolean = true): DataFrame =
    encode(rotated(df, idCol, vecCol, model.rotation), idCol, "_rot",
      model.pq, ordered)

  /** [[distortion]] in the rotated space — the objective
    * [[trainRotated]] minimizes. The rotation is orthonormal, so this
    * is comparable to an unrotated model's distortion on the same
    * corpus (rotations preserve L2). */
  def distortionRotated(df: DataFrame, idCol: String, vecCol: String,
      model: OpqModel): Long =
    distortion(rotated(df, idCol, vecCol, model.rotation), idCol, "_rot",
      model.pq)

  /** [[adcTopK]] under the model's rotation: BOTH sides rotate (codes
    * of a rotated model are meaningless against raw queries), then the
    * usual coded-corpus LUT scan. The rotation is orthonormal, so the
    * rotated ADC distance estimates the ORIGINAL-space squared L2 up
    * to the (reduced) quantization distortion — rankings are
    * rotation-faithful, which is the entire point of OPQ search. */
  def adcTopKRotated(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: OpqModel, k: Int,
      ordered: Boolean = true): DataFrame =
    adcTopK(rotated(corpus, idCol, vecCol, model.rotation),
      rotated(queries, idCol, vecCol, model.rotation),
      idCol, "_rot", model.pq, k, ordered)

  /**
   * ADC top-k: for each query, the k corpus vectors with the smallest
   * asymmetric squared L2 distance (query vs corpus RECONSTRUCTION),
   * self excluded, ties to the lower cid. Output (qid, rnk, cid, dist)
   * with `dist` the exact BIGINT ADC distance.
   *
   * Scale shape: the corpus flows CODED (m ints per row, not dim); the
   * query set is collected and broadcast (small-|Q| exact-baseline
   * contract, as [[Similarity.cosineTopK]]); each partition builds the
   * |Q| * m * ksub LUTs once, scores rows by m lookups, and keeps a
   * bounded per-query heap — only numPartitions * |Q| * k survivor rows
   * shuffle into the ranking window.
   */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      model: PqModel, k: Int, ordered: Boolean = true): DataFrame = {
    require(k >= 1, s"adcTopK: need k >= 1; got $k")
    val enc = encoded(corpus, idCol, vecCol, model.codebooks, model.dsub)
      .select(col("_id").as("cid"), col("_codes"))
    val qs = Similarity.prepTyped(queries, idCol, "qid", vecCol)
      .filter(col("_v").isNotNull)
      .collect().map(r => (r.get(0), r.getSeq[Long](1).toArray))
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast((qs, model.codebooks))
    val cidType = enc.schema("cid").dataType
    val outSchema = StructType(Seq(
      enc.schema("cid").copy(name = "qid"),
      enc.schema("cid"),
      StructField("_dist", LongType, nullable = false)))
    val cidOrd = Similarity.idOrdering(cidType)
    val m = model.m
    val dsub = model.dsub
    val scored = enc.mapPartitions { rows =>
      val (queries, books) = bc.value
      if (queries.isEmpty) Iterator.empty
      else {
        // lut(q)(s)(c) = exact squared distance from query q's subvector
        // s to codebook centroid c
        val lut = queries.map { case (_, qv) =>
          Array.tabulate(m) { s =>
            Array.tabulate(books(s).length) { c =>
              val ct = books(s)(c)
              var d2 = 0L
              var p = 0
              while (p < dsub) { val d = qv(s * dsub + p) - ct(p); d2 += d * d; p += 1 }
              d2
            }
          }
        }
        // per-query bounded heap, worst survivor on top: rank is
        // (dist asc, cid asc), so the heap dequeues its current max
        type Cand = (Long, Any) // (dist, cid)
        val byRank: Ordering[Cand] = cidOrd match {
          case Some(ord) => Ordering.by[Cand, Long](_._1).orElse(Ordering.by[Cand, Any](_._2)(ord))
          case None => Ordering.by[Cand, Long](_._1) // unordered ids: dist-only heap, k per dist tie may overflow — fall back to no pre-reduce
        }
        cidOrd match {
          case None =>
            // no JVM ordering for the id type: skip the pre-reduce
            // (correct, just shuffles all pairs)
            rows.flatMap { r =>
              val cid = r.get(0)
              val codes = r.getSeq[Int](1)
              queries.iterator.zipWithIndex.collect {
                case ((qid, _), qi) if qid != cid =>
                  var dist = 0L
                  var s = 0
                  while (s < m) { dist += lut(qi)(s)(codes(s)); s += 1 }
                  Row(qid, cid, dist)
              }
            }
          case Some(_) =>
            val heaps = Array.fill(queries.length)(
              scala.collection.mutable.PriorityQueue.empty[Cand](byRank))
            rows.foreach { r =>
              val cid = r.get(0)
              val codes = r.getSeq[Int](1)
              var qi = 0
              while (qi < queries.length) {
                if (queries(qi)._1 != cid) {
                  var dist = 0L
                  var s = 0
                  while (s < m) { dist += lut(qi)(s)(codes(s)); s += 1 }
                  val cand = (dist, cid)
                  val heap = heaps(qi)
                  if (heap.size < k) heap.enqueue(cand)
                  else if (byRank.lt(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
                }
                qi += 1
              }
            }
            heaps.iterator.zipWithIndex.flatMap { case (heap, qi) =>
              heap.iterator.map { case (dist, cid) => Row(queries(qi)._1, cid, dist) }
            }
        }
      }
    }(Encoders.row(outSchema))
    val w = Window.partitionBy("qid").orderBy(col("_dist"), col("cid"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), col("_dist").as("dist"))
      .transform(Presented(_, ordered, "qid", "rnk"))
  }

  /**
   * Materialize the IVF-PQ index: (idCol, list, codes) — the coarse
   * cell each vector belongs to plus its PQ codes, in ONE typed pass
   * (both argmins share the row's quantized vector). This is the
   * billion-scale deployment shape: write this table once (4 + m small
   * ints per row instead of dim floats), then every [[ivfAdcTopK]]
   * query scans the coded index, never the raw vectors.
   */
  def buildCodedIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], model: PqModel,
      ordered: Boolean = true): DataFrame = {
    val enc = encoded(corpus, idCol, vecCol, model.codebooks, model.dsub)
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val outSchema = StructType(Seq(
      enc.schema("_id"),
      StructField("list", IntegerType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false)))
    enc.mapPartitions { rows =>
      val cents = bc.value
      if (cents.isEmpty) Iterator.empty
      else rows.map { r =>
        val v = r.getSeq[Long](2).toArray
        Row(r.get(0), Ivf.nearest(v, cents), r.get(1))
      }
    }(Encoders.row(outSchema))
      .select(col("_id").as(idCol), col("list"), col("codes"))
      .transform(Presented(_, ordered, idCol))
  }

  /**
   * IVF-PQ search over a materialized [[buildCodedIndex]] table: each
   * query ADC-scores ONLY the rows of its `nprobe` nearest cells.
   * Probe sets are computed driver-side on the |Q|-bounded broadcast
   * query set and inverted into a cell -> queries map, so the scan
   * stays shuffle-free: a corpus row looks up which queries probe its
   * cell, pays m LUT lookups per probing query, and bounded
   * per-partition heaps keep survivors. With `nprobe >= nlist` every
   * cell is probed and the result equals [[adcTopK]] exactly (the pq53
   * oracle pin, sharing pq49's SQL); smaller `nprobe` trades recall
   * (measured in ProductQuantSpec) for a ~nlist/nprobe candidate cut.
   * Output (qid, rnk, cid, dist), ADC-distance semantics.
   */
  def ivfAdcTopK(coded: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], model: PqModel, k: Int, nprobe: Int,
      ordered: Boolean = true): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"ivfAdcTopK: need k, nprobe >= 1; got k=$k nprobe=$nprobe")
    val qs = Similarity.prepTyped(queries, idCol, "qid", vecCol)
      .filter(col("_v").isNotNull)
      .collect().map(r => (r.get(0), r.getSeq[Long](1).toArray))
    val probes: Array[Array[Int]] =
      qs.map { case (_, qv) => Ivf.nearestN(qv, centroids, nprobe) }
    val bc = coded.sparkSession.sparkContext.broadcast((qs, probes, model.codebooks))
    val in = coded.select(col(idCol).as("cid"), col("list"), col("codes"))
    val outSchema = StructType(Seq(
      in.schema("cid").copy(name = "qid"),
      in.schema("cid"),
      StructField("_dist", LongType, nullable = false)))
    val cidOrd = Similarity.idOrdering(in.schema("cid").dataType)
    val m = model.m
    val dsub = model.dsub
    val scored = in.mapPartitions { rows =>
      val (queryVecs, probeSets, books) = bc.value
      if (queryVecs.isEmpty) Iterator.empty
      else {
        val lut = queryVecs.map { case (_, qv) =>
          Array.tabulate(m) { s =>
            Array.tabulate(books(s).length) { c =>
              val ct = books(s)(c)
              var d2 = 0L
              var p = 0
              while (p < dsub) { val d = qv(s * dsub + p) - ct(p); d2 += d * d; p += 1 }
              d2
            }
          }
        }
        // invert probe sets: cell -> indices of the queries probing it
        val byCell = new java.util.HashMap[Int, Array[Int]]()
        probeSets.zipWithIndex.foreach { case (cells, qi) =>
          cells.foreach { cell =>
            val cur = byCell.get(cell)
            byCell.put(cell, if (cur == null) Array(qi) else cur :+ qi)
          }
        }
        type Cand = (Long, Any)
        val byRank: Ordering[Cand] = cidOrd match {
          case Some(ord) => Ordering.by[Cand, Long](_._1).orElse(Ordering.by[Cand, Any](_._2)(ord))
          case None => Ordering.by[Cand, Long](_._1)
        }
        val heaps = Array.fill(queryVecs.length)(
          scala.collection.mutable.PriorityQueue.empty[Cand](byRank))
        val emitAll = cidOrd.isEmpty // unordered ids: no pre-reduce, emit directly
        val direct = Array.newBuilder[Row]
        rows.foreach { r =>
          val probing = byCell.get(r.getInt(1))
          if (probing != null) {
            val cid = r.get(0)
            val codes = r.getSeq[Int](2)
            var j = 0
            while (j < probing.length) {
              val qi = probing(j)
              if (queryVecs(qi)._1 != cid) {
                var dist = 0L
                var s = 0
                while (s < m) { dist += lut(qi)(s)(codes(s)); s += 1 }
                if (emitAll) direct += Row(queryVecs(qi)._1, cid, dist)
                else {
                  val cand = (dist, cid)
                  val heap = heaps(qi)
                  if (heap.size < k) heap.enqueue(cand)
                  else if (byRank.lt(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
                }
              }
              j += 1
            }
          }
        }
        if (emitAll) direct.result().iterator
        else heaps.iterator.zipWithIndex.flatMap { case (heap, qi) =>
          heap.iterator.map { case (dist, cid) => Row(queryVecs(qi)._1, cid, dist) }
        }
      }
    }(Encoders.row(outSchema))
    val w = Window.partitionBy("qid").orderBy(col("_dist"), col("cid"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), col("_dist").as("dist"))
      .transform(Presented(_, ordered, "qid", "rnk"))
  }

  /** The union of the queries' `nprobe` nearest coarse cells — the
    * cell set a probed search touches, computed driver-side on the
    * |Q|-bounded query set (the same per-query probe sets
    * [[ivfAdcTopK]] recomputes; sorted for determinism). */
  def ivfProbedCells(queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], nprobe: Int): Array[Int] = {
    require(nprobe >= 1, s"ivfProbedCells: nprobe >= 1, got $nprobe")
    Similarity.prepTyped(queries, idCol, "qid", vecCol)
      .filter(col("_v").isNotNull)
      .collect()
      .flatMap(r => Ivf.nearestN(r.getSeq[Long](1).toArray, centroids, nprobe))
      .distinct.sorted
  }

  /**
   * [[ivfAdcTopK]] over a CELL-PARTITIONED persisted coded index
   * ([[IndexStore.saveCoded]]): the probed-cell set is computed
   * driver-side and applied as a `list IN (...)` prefilter, which
   * Catalyst resolves into a PARTITION filter on the scan — only the
   * probed cells' directories are listed and read, ~nprobe/nlist of
   * the index bytes (pinned in the spec: the scan's selected partition
   * count equals the probed-cell count). Results are EXACTLY
   * [[ivfAdcTopK]]'s on the same index: the in-scan cell→queries map
   * already ignores unprobed cells row-wise, so the prefilter changes
   * bytes read, never candidates scored.
   */
  def ivfAdcTopKPruned(coded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Long]], model: PqModel, k: Int,
      nprobe: Int, ordered: Boolean = true): DataFrame = {
    val cells = ivfProbedCells(queries, idCol, vecCol, centroids, nprobe)
    ivfAdcTopK(coded.filter(col("list").isin(cells.map(Int.box).toSeq: _*)),
      queries, idCol, vecCol, centroids, model, k, nprobe, ordered)
  }

  /**
   * ADC shortlist + exact re-rank (the FAISS "refine" pattern): take
   * the top `k * refine` ADC candidates per query, then score ONLY
   * those with the exact quantized squared L2 distance and return the
   * exact top-k. Output (qid, rnk, cid, dist) with `dist` now the EXACT
   * distance. Recall is bounded by the shortlist's (measured in
   * ProductQuantSpec per refine factor); cost adds one broadcast-join
   * corpus scan over |Q| * k * refine shortlist rows — the corpus side
   * still never shuffles, and with `refine >= corpus size / k` this
   * provably equals the brute-force exact answer (pinned in the spec).
   */
  def adcTopKRefined(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      model: PqModel, k: Int, refine: Int, ordered: Boolean = true): DataFrame = {
    require(k >= 1 && refine >= 1, s"adcTopKRefined: need k, refine >= 1; got k=$k refine=$refine")
    val shortlist = adcTopK(corpus, queries, idCol, vecCol, model,
      k = math.multiplyExact(k, refine), ordered = false)
      .select(col("qid"), col("cid"))
    val qs = Similarity.prepTyped(queries, idCol, "qid", vecCol)
      .filter(col("_v").isNotNull)
      .collect().map(r => (r.get(0), r.getSeq[Long](1).toArray))
    val bc = corpus.sparkSession.sparkContext.broadcast(qs.toMap)
    val c = Similarity.prepTyped(corpus, idCol, "_cid", vecCol)
      .filter(col("_v").isNotNull)
    // shortlist is |Q| * k * refine rows — broadcast it so the corpus
    // side scans in place (no shuffle of the coded or raw corpus)
    val pairs = c.join(broadcast(shortlist), col("_cid") === col("cid"))
      .select(col("qid"), col("cid"), col("_v"))
    val outSchema = StructType(Seq(
      pairs.schema("qid"), pairs.schema("cid"),
      StructField("_dist", LongType, nullable = false)))
    val exact = pairs.mapPartitions { rows =>
      val queryVecs = bc.value
      rows.map { r =>
        val qv = queryVecs(r.get(0))
        val v = r.getSeq[Long](2)
        var d2 = 0L
        var i = 0
        val n = math.min(qv.length, v.length)
        while (i < n) { val d = qv(i) - v(i); d2 += d * d; i += 1 }
        Row(r.get(0), r.get(1), d2)
      }
    }(Encoders.row(outSchema))
    val w = Window.partitionBy("qid").orderBy(col("_dist"), col("cid"))
    exact
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), col("_dist").as("dist"))
      .transform(Presented(_, ordered, "qid", "rnk"))
  }
}
