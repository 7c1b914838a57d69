package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * Distributed PCA over embedding columns, built for the OPQ use case
 * (Ge et al. 2013, "Optimized Product Quantization"): rotate vectors
 * into the principal basis and spread the variance across PQ subspaces
 * so [[ProductQuant]]'s per-subspace codebooks quantize evenly —
 * measurably lower distortion on anisotropic embeddings (pinned in
 * PcaSpec).
 *
 * Scale shape: moments accumulate EXACTLY — vectors are integer-
 * quantized ([[Similarity.quantize]]) and each partition folds its
 * rows into one (count, sums, upper-triangle second moments) triple of
 * BIGINTs, so the only driver traffic is numPartitions model-sized
 * rows and the covariance is bit-identical under ANY partitioning (the
 * double arithmetic starts only at the dim x dim eigen step on the
 * driver — a cyclic Jacobi over a matrix that is dim^2 doubles,
 * microseconds at embedding dims). One pass, no shuffle. The moment
 * accumulation arithmetic is oracle-checked in exact integers on a dim
 * slice (pq58).
 *
 * Overflow headroom: |q| <= scale * |v|; the BIGINT product sum holds
 * corpus sums up to ~9e18 — at 1e12 rows keep `scale * max|v|` under
 * ~2000 (the default scale 1000 over unit-normalized embeddings is
 * fine) or fit on a sample.
 */
object Pca {

  /** Fitted model: the (quantized-space) mean, eigenvectors as rows in
    * descending-eigenvalue order, and the eigenvalues (variances). */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      variances: Array[Double]) {
    def dim: Int = mean.length
  }

  /** Exact quantized first/second moments over a leading dim slice, as
    * the oracle-checkable view of [[fit]]'s accumulation (pq58): rows
    * (i, -1, Σ q_i) and (i, j, Σ q_i·q_j) for 0 <= i <= j < dims. Pure
    * Catalyst — a codegen'd product projection + one map-side-combined
    * aggregate; PcaSpec pins it equal to the typed partial-moment pass
    * [[fit]] actually folds. */
  def momentStats(df: DataFrame, vecCol: String, dims: Int,
      ordered: Boolean = true): DataFrame = {
    require(dims >= 1, s"momentStats: need dims >= 1; got $dims")
    val qv = df.select(Similarity.quantize(col(vecCol)).as("_v"))
      .filter(col("_v").isNotNull)
    val firsts = (0 until dims).map(i =>
      struct(lit(i.toLong).as("i"), lit(-1L).as("j"),
        element_at(col("_v"), i + 1).as("v")))
    val seconds = for { i <- 0 until dims; j <- i until dims } yield
      struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"),
        (element_at(col("_v"), i + 1) * element_at(col("_v"), j + 1)).as("v"))
    qv.select(explode(array((firsts ++ seconds): _*)).as("_p"))
      .groupBy(col("_p.i").as("i"), col("_p.j").as("j"))
      .agg(sum(col("_p.v")).as("val"))
      .transform(Presented(_, ordered, "i", "j"))
  }

  /** One row per partition: (n, sums[dim], upper-tri moments
    * [dim*(dim+1)/2]) — all exact BIGINTs. */
  private[llm] def partialMoments(df: DataFrame, vecCol: String): DataFrame = {
    val prepped = df.select(col(vecCol))
      .transform(d => d.select(Similarity.quantize(col(vecCol)).as("_v")))
      .filter(col("_v").isNotNull)
    val outSchema = StructType(Seq(
      StructField("n", org.apache.spark.sql.types.LongType, nullable = false),
      StructField("s", ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)),
      StructField("m", ArrayType(org.apache.spark.sql.types.LongType, containsNull = false))))
    prepped.mapPartitions { rows =>
      var n = 0L
      var s: Array[Long] = null
      var m: Array[Long] = null
      rows.foreach { r =>
        val v = r.getSeq[Long](0)
        val d = v.length
        if (s == null) { s = new Array[Long](d); m = new Array[Long](d * (d + 1) / 2) }
        require(v.length == s.length,
          s"Pca: ragged vectors (${v.length} vs ${s.length})")
        n += 1
        var i = 0
        var k = 0
        while (i < d) {
          val vi = v(i)
          s(i) = Math.addExact(s(i), vi)
          var j = i
          while (j < d) {
            m(k) = Math.addExact(m(k), Math.multiplyExact(vi, v(j)))
            j += 1
            k += 1
          }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single(Row(n, s.toSeq, m.toSeq))
    }(Encoders.row(outSchema))
  }

  /**
   * Fit on the full corpus: one shuffle-free pass + a driver-side
   * eigendecomposition. Deterministic: exact integer moments (order-
   * free), then a fixed-sweep cyclic Jacobi.
   */
  def fit(df: DataFrame, vecCol: String, scale: Int = 1000): PcaModel = {
    val parts = partialMoments(df, vecCol).collect()
    require(parts.nonEmpty, "Pca.fit: no non-null vectors")
    val d = parts.head.getSeq[Long](1).length
    var n = 0L
    val s = new Array[Long](d)
    val m = new Array[Long](d * (d + 1) / 2)
    parts.foreach { r =>
      n = Math.addExact(n, r.getLong(0))
      val ps = r.getSeq[Long](1)
      val pm = r.getSeq[Long](2)
      var i = 0
      while (i < d) { s(i) = Math.addExact(s(i), ps(i)); i += 1 }
      var k = 0
      while (k < m.length) { m(k) = Math.addExact(m(k), pm(k)); k += 1 }
    }
    val sc = scale.toDouble
    val mean = s.map(_.toDouble / n / sc)
    // cov[i][j] = E[v_i v_j] - mean_i mean_j, back in raw (unquantized) units
    val cov = Array.ofDim[Double](d, d)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val e2 = m(k).toDouble / n / (sc * sc)
        val c = e2 - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        k += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // sort desc by eigenvalue, ties by original index (deterministic)
    val order = values.indices.sortBy(i => (-values(i), i))
    PcaModel(mean,
      order.map(i => vectors.map(_(i))).toArray, // column i -> row vector
      order.map(values(_)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector columns). Fixed sweep order and
    * convergence threshold — deterministic for a given matrix. */
  private[llm] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scaleRef = math.max(frobenius(a), Double.MinPositiveValue)
    while (sweep < maxSweeps && off > tol * scaleRef) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol * scaleRef / (d.toDouble * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p)
              val aiq = a(i)(q)
              a(i)(p) = c * aip - sn * aiq
              a(i)(q) = sn * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i)
              val aqi = a(q)(i)
              a(p)(i) = c * api - sn * aqi
              a(q)(i) = sn * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p)
              val viq = v(i)(q)
              v(i)(p) = c * vip - sn * viq
              v(i)(q) = sn * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /**
   * Project vectors onto the model's top `k` components:
   * out_c = components(c) . (v - mean). One typed pass, broadcast
   * model, no shuffle; null vectors stay null.
   */
  def transform(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      k: Int, outCol: String = "pca", ordered: Boolean = true): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"transform: k in [1, ${model.components.length}]; got $k")
    val in = df.select(col(idCol), col(vecCol).cast("array<double>").as("_raw"))
    val bc = df.sparkSession.sparkContext.broadcast((model.mean, model.components.take(k)))
    val outSchema = StructType(Seq(
      in.schema(in.schema.fieldIndex(idCol)),
      StructField(outCol, ArrayType(DoubleType, containsNull = false), nullable = true)))
    in.mapPartitions { rows =>
      val (mean, comps) = bc.value
      rows.map { r =>
        val raw = if (r.isNullAt(1)) null else r.getSeq[Any](1)
        if (raw == null || raw.contains(null)) Row(r.get(0), null)
        else {
          val v = new Array[Double](raw.length)
          var i = 0
          while (i < raw.length) {
            v(i) = raw(i).asInstanceOf[Double] - mean(i)
            i += 1
          }
          val out = new Array[Double](comps.length)
          var c = 0
          while (c < comps.length) {
            val w = comps(c)
            var acc = 0.0
            var j = 0
            val nmin = math.min(w.length, v.length)
            while (j < nmin) { acc += w(j) * v(j); j += 1 }
            out(c) = acc
            c += 1
          }
          Row(r.get(0), out.toSeq)
        }
      }
    }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, idCol))
  }

  /**
   * OPQ-style eigenvalue allocation: permute the model's components so
   * that, read in order and split into `m` contiguous PQ subspaces,
   * each subspace receives eigenvalues round-robin by rank — the
   * variance-balancing heuristic that replaces OPQ's learned rotation
   * (Ge et al. §4's "natural" baseline). Transform with the returned
   * model, then [[ProductQuant.train]] on the `outCol`.
   */
  def balancedForPq(model: PcaModel, m: Int): PcaModel = {
    val d = model.components.length
    require(m >= 1 && d % m == 0, s"balancedForPq: $d components must split into m=$m")
    val dsub = d / m
    // rank r goes to subspace r % m, slot r / m
    val perm = new Array[Int](d)
    var r = 0
    while (r < d) { perm((r % m) * dsub + (r / m)) = r; r += 1 }
    PcaModel(model.mean,
      perm.map(model.components(_)),
      perm.map(model.variances(_)))
  }
}
