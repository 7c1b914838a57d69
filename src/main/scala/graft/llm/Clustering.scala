package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * Fully distributed Lloyd's k-means over embedding columns — the
 * corpus-scale sibling of [[Ivf.kmeans]] (which by contract trains on a
 * bounded driver-side sample). Here every iteration is ONE distributed
 * pass over the full corpus:
 *
 *  - ASSIGN: centroids broadcast (k * dim longs — kilobytes), one typed
 *    `mapPartitions` argmin per row. No shuffle.
 *  - UPDATE: `posexplode` the quantized vector and aggregate
 *    `groupBy(cluster, pos).sum` — partial (map-side) aggregation means
 *    the only shuffled rows are `numPartitions * k * dim` partials; the
 *    per-cluster count and the exact BIGINT cost ride along on the
 *    `pos = 0` rows, so one aggregation job per iteration carries the
 *    means, the sizes and the objective.
 *  - New centroids (k * dim rows) collect to the driver — bounded by the
 *    model size, never the corpus.
 *
 * Determinism (the same discipline as [[Ivf]]): integer-quantized
 * vectors ([[Similarity.quantize]]), exact BIGINT sums/distances
 * (commutative — partitioning cannot change them), HALF-UP mean
 * rounding, id-ordered strided init, fixed iteration count. With
 * `sampleN >= corpus size` the result is bit-identical to
 * [[Ivf.kmeans]] on the collected corpus — that identity is pinned in
 * ClusteringSpec, and the per-step arithmetic is oracle-checked against
 * DuckDB (pq46/pq47) via the same quantization contract as pq8/pq9.
 *
 * At 100 TB: per-iteration cost is one columnar scan plus a k*dim-sized
 * exchange; nothing corpus-sized is cached, collected or re-shuffled.
 * Rows with a null vector (or a null element) are excluded from
 * training and assignment, matching [[Similarity]]'s null contract.
 */
object Clustering {

  /** Trained model: quantized centroids plus, when cost tracking is on,
    * the exact BIGINT objective (sum of squared quantized L2 distances)
    * measured under the centroids ENTERING each iteration. */
  final case class KMeansModel(centroids: Array[Array[Long]], costPerIter: Array[Long])

  /** The assignment pass: (_id, _cluster, _v, _d2) — nearest-centroid
    * index (ties to the lowest index, [[Ivf.nearest]]) and the EXACT
    * squared quantized distance as BIGINT. Null vectors are dropped
    * (they have no position in the space); zero vectors are kept —
    * unlike cosine ranking, k-means handles the origin fine. */
  private[llm] def assigned(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]]): DataFrame = {
    val prepped = Similarity.prepTyped(df, idCol, "_id", vecCol)
      .filter(col("_v").isNotNull)
    val bc = prepped.sparkSession.sparkContext.broadcast(centroids)
    val outSchema = StructType(Seq(
      prepped.schema("_id"),
      StructField("_cluster", IntegerType, nullable = false),
      prepped.schema("_v"),
      StructField("_d2", LongType, nullable = false)))
    prepped.mapPartitions { rows =>
      val cents = bc.value
      if (cents.isEmpty) Iterator.empty
      else rows.map { r =>
        val v = r.getSeq[Long](1).toArray
        val c = Ivf.nearest(v, cents)
        val ct = cents(c)
        var d2 = 0L
        var i = 0
        val n = math.min(v.length, ct.length)
        while (i < n) { val d = v(i) - ct(i); d2 += d * d; i += 1 }
        // dims beyond the centroid's length (ragged input) contribute
        // their full magnitude, matching nearest()'s truncated dot
        while (i < v.length) { d2 += v(i) * v(i); i += 1 }
        Row(r.get(0), c, r.get(1), d2)
      }
    }(Encoders.row(outSchema))
  }

  /** Per-row cluster assignment under fixed centroids: (idCol, cluster).
    * One broadcast argmin pass, no shuffle. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], ordered: Boolean = true): DataFrame =
    assigned(df, idCol, vecCol, centroids)
      .select(col("_id").as(idCol), col("_cluster").cast("long").as("cluster"))
      .transform(Presented(_, ordered, idCol))

  /** Per-cluster size and exact BIGINT objective under fixed centroids:
    * (cluster, n, cost). Empty clusters emit no row (the oracle's
    * GROUP BY has the same shape). One pass, one k-bounded aggregate. */
  def assignStats(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], ordered: Boolean = true): DataFrame =
    assigned(df, idCol, vecCol, centroids)
      .groupBy(col("_cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n"), sum("_d2").as("cost"))
      .transform(Presented(_, ordered, "cluster"))

  /** One distributed Lloyd update under fixed centroids:
    * (cluster, pos, n, next_c) — the HALF-UP-rounded mean per dimension
    * (`pos` is 0-based), with the cluster size alongside. Empty clusters
    * emit no rows (callers — and [[train]] — keep the old centroid).
    * This is the single-aggregation shape [[train]] iterates. */
  def updateStep(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], ordered: Boolean = true): DataFrame =
    rawUpdate(assigned(df, idCol, vecCol, centroids))
      .select(col("_cluster").cast("long").as("cluster"), col("_pos").cast("long").as("pos"),
        col("_n").as("n"), round(col("_s").cast("double") / col("_n")).cast("long").as("next_c"))
      .transform(Presented(_, ordered, "cluster", "pos"))

  /** The shared one-job update aggregation: per (cluster, pos) the exact
    * BIGINT component sum `_s`; the per-cluster count `_n` and cost
    * `_cost` ride on the `pos = 0` guard so a single map-side-combined
    * aggregate carries all three. Output rows: k * dim. */
  private def rawUpdate(asg: DataFrame): DataFrame = {
    val perPos = asg.select(col("_cluster"), col("_d2"),
      posexplode(col("_v")).as(Seq("_pos", "_val")))
    val agg = perPos.groupBy("_cluster", "_pos").agg(
      sum("_val").as("_s"),
      sum(when(col("_pos") === 0, lit(1L)).otherwise(lit(0L))).as("_n0"),
      sum(when(col("_pos") === 0, col("_d2")).otherwise(lit(0L))).as("_cost0"))
    // _n/_cost only materialize on pos=0 rows; broadcast them across the
    // cluster's rows (k*dim rows total — a broadcast-sized self-join)
    val stats = agg.filter(col("_pos") === 0)
      .select(col("_cluster").as("_c2"), col("_n0").as("_n"), col("_cost0").as("_cost"))
    agg.join(broadcast(stats), col("_cluster") === col("_c2"))
      .select(col("_cluster"), col("_pos"), col("_s"), col("_n"), col("_cost"))
  }

  /**
   * Distributed k-means training. Init: `k` evenly strided vectors of
   * the id-ordered `sampleN`-bounded prefix (identical to
   * [[Ivf.kmeans]]'s init when the sample covers the corpus); then
   * `iters` full-corpus Lloyd rounds, each one scan + one k*dim-bounded
   * aggregate. Empty clusters keep their previous centroid; `costs` in
   * the model is per-iteration (entering objective) when `trackCost`,
   * empty otherwise — tracking is free (the cost rides the same
   * aggregate), it is a flag only so callers can ignore it.
   */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, sampleN: Int = 4096, trackCost: Boolean = true): KMeansModel = {
    require(k >= 1 && iters >= 0 && sampleN >= 1,
      s"train: need k >= 1, iters >= 0, sampleN >= 1; got k=$k iters=$iters sampleN=$sampleN")
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(idCol).limit(sampleN)
      .transform(Similarity.prepTyped(_, idCol, "_id", vecCol))
      .filter(col("_v").isNotNull)
      .select("_v").collect().map(_.getSeq[Long](0).toArray)
    if (sample.isEmpty) return KMeansModel(Array.empty, Array.empty)
    val kk = math.min(k, sample.length)
    var centroids = Array.tabulate(kk)(i =>
      sample((i.toLong * sample.length / kk).toInt).clone())
    val costs = Array.newBuilder[Long]
    var it = 0
    while (it < iters) {
      val rows = rawUpdate(assigned(df, idCol, vecCol, centroids)).collect()
      if (trackCost) {
        var cost = 0L
        val seen = new Array[Boolean](kk)
        rows.foreach { r =>
          val c = r.getInt(0)
          if (!seen(c)) { seen(c) = true; cost += r.getLong(4) }
        }
        costs += cost
      }
      val next = centroids.map(_.clone())
      rows.foreach { r =>
        val (c, pos, s, n) = (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))
        next(c)(pos) = java.math.BigDecimal.valueOf(s.toDouble / n)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }
      centroids = next
      it += 1
    }
    KMeansModel(centroids, costs.result())
  }

  /**
   * Embedding-drift report between two corpus snapshots under a FIXED
   * coarse quantizer — the SIGNAL for [[graft.llm.IndexStore.reindexCoded]]:
   * a coded index stays sharp only while the corpus still looks like
   * what the quantizer was trained on. Per cell: old/new occupancy and
   * the cosine between the cell's old and new MEAN vectors. A healthy
   * cell reads cos_shift ≈ 1 and count_ratio ≈ corpus growth; cells
   * drifting below ~0.98 cosine or emptying/flooding are the retrain
   * cue (runbook in SCALE.md).
   *
   * EXACT BY CONSTRUCTION: both snapshots assign with the broadcast
   * argmin pass (no shuffle), then ONE map-side-combined aggregate per
   * snapshot produces exact BIGINT per-(cell, dim) component sums —
   * and cos(mean_old, mean_new) = cos(sum_old, sum_new) because the
   * 1/n factors cancel, so the cosine is computed on exact integer
   * sums with a single final double op: bit-deterministic under any
   * partitioning, no double-summation order anywhere. Everything after
   * assignment is k·dim-bounded (model-sized), never corpus-sized.
   *
   * Contracts: snapshots share the quantization scale and vector dim.
   * Component sums must fit BIGINT — |v| ≤ v_max quantized units and
   * n rows per cell need n·v_max < ~3e9/√dim (raise nlist or rescale
   * past ~10M rows/cell at the default 10^3 scale).
   *
   * Output: (list, n_old, n_new, count_ratio ROUND(6), cos_shift
   * ROUND(4)). One-sided cells keep their occupancy facts: an emptied
   * cell reads count_ratio 0 with a null cosine; a brand-new cell
   * reads a null ratio (nothing to divide by) and a null cosine.
   */
  def snapshotDrift(oldVecs: DataFrame, newVecs: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Long]],
      ordered: Boolean = true): DataFrame = {
    def sums(df: DataFrame, s: String, n: String) =
      assigned(df, idCol, vecCol, centroids)
        .select(col("_cluster"), posexplode(col("_v")).as(Seq("_pos", "_val")))
        .groupBy(col("_cluster").cast("long").as("list"), col("_pos"))
        .agg(sum("_val").as(s),
          sum(when(col("_pos") === 0, lit(1L)).otherwise(lit(0L))).as(n))
    sums(oldVecs, "_so", "_no").join(
        sums(newVecs, "_sn", "_nn"), Seq("list", "_pos"), "full_outer")
      .groupBy("list")
      .agg(
        sum(coalesce(col("_no"), lit(0L))).as("n_old"),
        sum(coalesce(col("_nn"), lit(0L))).as("n_new"),
        sum(col("_so") * col("_sn")).as("_dot"),
        sum(col("_so") * col("_so")).as("_o2"),
        sum(col("_sn") * col("_sn")).as("_n2"))
      .select(col("list"), col("n_old"), col("n_new"),
        round(when(col("n_old") > 0,
          col("n_new").cast("double") / col("n_old")), 6).as("count_ratio"),
        round(when(col("_dot").isNotNull && col("_o2") > 0 && col("_n2") > 0,
          col("_dot").cast("double") /
            sqrt(col("_o2").cast("double") * col("_n2").cast("double"))), 4)
          .as("cos_shift"))
      .transform(Presented(_, ordered, "list"))
  }
}
