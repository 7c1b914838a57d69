package graft.llm

import graft.Presented
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multiclass domain routing — the K-class hashed-softmax sibling of
 * [[QualityClassifier]]/[[QualityTrainer]] (which are binary by
 * construction). The DoReMi/domain-mixing input: route every document
 * to a learned domain, then feed the predicted stratum to
 * [[Sampling.mixtureRates]]/[[Sampling.temperatureMixtureRates]]
 * instead of assuming the label column already exists.
 *
 *   score_k(doc) = b_k + Σ_tokens W[k][hash(token)]
 *   p = softmax(score),  pred = argmax_k score_k (ties → lowest k)
 *
 * SCALE SHAPE (inference): zero shuffle — the K×dim weight matrix
 * rides the plan as ONE flattened array literal (bucket-major, so a
 * token's per-class weight vector is one `slice`), the per-doc fold
 * accumulates a K-vector, and every output column is a projection.
 * 10^6 buckets × 8 domains is 64 MB of literal — ship it broadcast
 * via the plan exactly like the binary classifier's vector.
 *
 * SCALE SHAPE (training): ONE job per iteration, (dim·K)-bounded
 * state — the per-doc softmax residual vector rides each exploded
 * token occurrence, the aggregate groups by bucket with K sum columns
 * (map-side combined, dim+1 groups), and the bias gradients / loss /
 * label sanity check ride a per-doc SENTINEL row in the SAME
 * aggregate (the [[QualityTrainer]] design, vectorized over classes).
 *
 * DETERMINISM: iteration 1 from zero init is EXACT when K is a power
 * of two — softmax(0) = 1/K is then a dyadic (exp(0) = 1 and the
 * K-term sum are IEEE-exact), so residuals (1[y=k] − 1/K) and every
 * gradient sum are order-free exact; pq108 pins one K = 4 step
 * bit-for-bit through a scoring pass. Later iterations cross libm —
 * ship the trained matrix, never re-train per site (the
 * [[QualityClassifier]] contract).
 */
object DomainRouter {

  /** Trained router + pre-update cross-entropy loss per iteration. */
  final case class TrainedRouter(weights: Array[Array[Double]],
      biases: Array[Double], losses: Array[Double]) {
    def score(docs: DataFrame, idCol: String, textCol: String,
        ordered: Boolean = true): DataFrame =
      DomainRouter.score(docs, idCol, textCol, weights, biases, ordered)
  }

  /**
   * Score every document under the hashed softmax model. Output:
   * (doc_id, n_tokens, score_0..score_{K−1} ROUND(6),
   * prob_0..prob_{K−1} ROUND(4), pred) — flat columns, one row per
   * doc. `pred` is the argmax of the EXACT scores (ties → lowest
   * class), so routing never depends on libm; probs cross exp and are
   * reported rounded (the pq54 discipline).
   *
   * @param weights K rows (classes) × dim columns (hash buckets)
   * @param biases  length-K per-class bias
   */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Array[Double]], biases: Array[Double],
      ordered: Boolean = true): DataFrame = {
    val k = weights.length
    require(k >= 2, s"score: need >= 2 classes, got $k")
    require(biases.length == k, s"score: ${biases.length} biases, $k classes")
    val dim = weights(0).length
    require(dim > 0 && weights.forall(_.length == dim),
      "score: every class row must have the same positive dim")
    // ONE typed pass (the QualityClassifier.score discipline): the
    // K-vector HOF fold evaluated interpreted per token was the hot
    // expression; the JVM twin runs the identical arithmetic — same
    // token order, per-class left-to-right accumulation, stable
    // softmax through java.lang.Math (the same libm Spark's exp
    // calls), first-index argmax on EXACT scores (ties → lowest
    // class), Spark's exact HALF_UP rounding — pinned bit-for-bit by
    // the pq108 oracle.
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = StructType(
      Seq(docs.schema(docs.schema.fieldIndex(idCol)).copy(name = "doc_id"),
        StructField("n_tokens", LongType, nullable = false)) ++
      (0 until k).map(i => StructField(s"score_$i", DoubleType, nullable = false)) ++
      (0 until k).map(i => StructField(s"prob_$i", DoubleType, nullable = false)) :+
      StructField("pred", LongType, nullable = false))
    val w = weights
    val b = biases
    docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val sv = b.clone()
          var n = 0L
          if (!r.isNullAt(1)) {
            val toks = TextOps.tokensJvm(r.getString(1))
            var i = 0
            while (i < toks.length) {
              val t = toks(i)
              if (t.nonEmpty) {
                val bkt = TextOps.bucketJvm(md, t, dim)
                var c = 0
                while (c < k) { sv(c) += w(c)(bkt); c += 1 }
                n += 1
              }
              i += 1
            }
          }
          var mx = sv(0)
          var c = 1
          while (c < k) { if (sv(c) > mx) mx = sv(c); c += 1 }
          val ex = new Array[Double](k)
          var den = 0.0
          c = 0
          while (c < k) { ex(c) = math.exp(sv(c) - mx); den += ex(c); c += 1 }
          var pred = 0
          c = 1
          while (c < k) { if (sv(c) > sv(pred)) pred = c; c += 1 }
          val out = new Array[Any](2 + 2 * k + 1)
          out(0) = r.get(0)
          out(1) = n
          c = 0
          while (c < k) {
            out(2 + c) = TextOps.roundHalfUpJvm(sv(c), 6)
            out(2 + k + c) = TextOps.roundHalfUpJvm(ex(c) / den, 4)
            c += 1
          }
          out(2 + 2 * k) = pred.toLong
          Row(out.toIndexedSeq: _*)
        }
      }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, "doc_id"))
  }

  private val KKey = "graft.router.k"
  private val DimKey = "graft.router.dim"
  private val BiasKey = "graft.router.biases"

  /**
   * Persist a trained router as a tiny catalog table — one (class,
   * bucket, weight) row per matrix cell, with K, dim, and the biases
   * STAMPED as table properties (the [[QualityTrainer.saveModel]]
   * discipline: a missing or drifted stamp fails fast instead of
   * silently mis-routing). Biases round-trip through
   * `Double.toString`/`parseDouble` (exact for every IEEE double), so
   * save → load → [[TrainedRouter.score]] is bit-identical to scoring
   * in memory. Loss history is a training artifact, not the model —
   * not persisted.
   */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      model: TrainedRouter, tableName: String, path: String): Unit = {
    import spark.implicits._
    val k = model.weights.length
    val rows = for {
      c <- 0 until k
      j <- model.weights(c).indices
    } yield (c, j, model.weights(c)(j))
    rows.toDF("class", "bucket", "weight")
      .repartition(1)
      .write.option("path", path).mode("overwrite").format("parquet")
      .saveAsTable(tableName)
    spark.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES " +
      s"('$KKey'='$k', '$DimKey'='${model.weights(0).length}', " +
      s"'$BiasKey'='${model.biases.map(_.toString).mkString(",")}')")
  }

  /** Load a [[saveModel]] table back into a scoring-ready
    * [[TrainedRouter]]. Fails fast on a missing stamp (a table this
    * code did not write) or a row count that disagrees with K×dim. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      tableName: String): TrainedRouter = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $tableName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def stamp(key: String): String = props.getOrElse(key, sys.error(
      s"$tableName carries no $key stamp — not a DomainRouter.saveModel table"))
    val k = stamp(KKey).toInt
    val dim = stamp(DimKey).toInt
    val biases = stamp(BiasKey).split(",")
      .map(java.lang.Double.parseDouble)
    require(biases.length == k,
      s"$tableName: stamped k=$k but ${biases.length} biases")
    val rows = spark.table(tableName).collect()
    require(rows.length == k * dim,
      s"$tableName: stamped k*dim=${k * dim} but ${rows.length} weight rows")
    val w = Array.fill(k, dim)(0.0)
    rows.foreach(r => w(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    TrainedRouter(w, biases, Array.empty)
  }

  /**
   * Train `iters` full-batch softmax-GD steps from zero init:
   *
   *   W[k][j] ← W[k][j] + lr · Σ_docs (1[y=k] − p_k) · count_j(doc)
   *   b_k     ← b_k     + lr · Σ_docs (1[y=k] − p_k)
   *
   * @param labelCol integer class in [0, k). Null / out-of-range /
   *                 non-integer labels are refused up front via the
   *                 sentinel group — a silently-skipped row is a
   *                 training bug nobody finds.
   * @param tol      convergence probe: stop early once the loss
   *                 improvement between consecutive iterations drops to
   *                 ≤ tol · max(1, |prev|) — relative on large losses,
   *                 absolute near zero. 0 (default) disables; `iters`
   *                 stays the hard budget either way. The probe is FREE
   *                 (the loss already rides each iteration's gradient
   *                 aggregate) and deterministic; `losses.length` in
   *                 the result reports how many iterations ran, and the
   *                 early-stopped model is bit-identical to
   *                 train(iters = losses.length) — the prefix identity
   *                 the spec pins.
   * @param sampleRate mini-batch arm: each iteration's gradient is
   *                 computed over a DETERMINISTIC [[Sampling]] hash
   *                 sample of the corpus at this rate, keyed on
   *                 `sampleKeyCol` with a per-iteration salt
   *                 (`sampleSalt:it<i>`) so successive iterations draw
   *                 independent subsets — the SGD-flavored option for
   *                 corpora where even one full pass per iteration is
   *                 expensive. At the default 1.0 the filter is NOT
   *                 applied at all, so the full-batch path is
   *                 bit-identical to the pre-arm behavior (the rate-1
   *                 identity law the spec pins). At rate < 1 the loss
   *                 sequence (and the `tol` plateau probe reading it)
   *                 estimates the full-batch loss on that iteration's
   *                 subset — expected sampling noise, not drift; pick
   *                 `tol` above the noise floor or leave it 0.
   * @param sampleKeyCol doc-id column hashing the mini-batch membership
   *                 (required when sampleRate < 1; null keys are
   *                 excluded per the [[Sampling]] contract)
   */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      k: Int, dim: Int, iters: Int = 5, lr: Double = 0.5,
      tol: Double = 0.0, sampleRate: Double = 1.0,
      sampleKeyCol: String = "", sampleSalt: String = ""): TrainedRouter = {
    require(k >= 2, s"train: need >= 2 classes, got $k")
    require(dim > 0, s"train: dim must be positive, got $dim")
    require(iters >= 1, s"train: iters must be >= 1, got $iters")
    require(tol >= 0, s"train: tol must be >= 0, got $tol")
    require(sampleRate > 0 && sampleRate <= 1.0,
      s"train: sampleRate must be in (0, 1], got $sampleRate")
    require(sampleRate >= 1.0 || sampleKeyCol.nonEmpty,
      "train: sampleRate < 1 needs sampleKeyCol (hash-sampled mini-batches " +
        "are keyed — membership must be a pure function of (salt, key))")
    val w = Array.fill(k, dim)(0.0)
    val b = Array.fill(k)(0.0)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    val y = col(labelCol).cast("double")
    var it = 0
    var plateaued = false
    // Per-doc gradient prep as ONE TYPED pass (the r20 score-twin
    // discipline — see [[QualityTrainer.train]]): the per-token
    // interpreted K-vector fold was this trainer's hot expression; the
    // JVM twin runs the identical arithmetic (same token order, same
    // left-to-right per-class accumulation from the biases, the stable
    // softmax through the same libm) and emits each token's bucket as
    // a long, so the downstream explode + bucket-keyed aggregate
    // (unchanged — same rows in the same partition order, so the
    // double sums are bit-identical) pays no per-token md5 either.
    import org.apache.spark.sql.types.{ArrayType, BooleanType, DoubleType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val prepSchema = org.apache.spark.sql.types.StructType(Seq(
      StructField("_r", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("_loss", DoubleType, nullable = false),
      StructField("_bad", BooleanType, nullable = false),
      StructField("_bk", ArrayType(LongType, containsNull = false), nullable = false)))
    while (it < iters && !plateaued) {
      // mini-batch arm: rate 1 skips the filter entirely (bit-identical
      // full-batch plan), rate < 1 is a per-iteration-salted hash sample
      val iterDocs =
        if (sampleRate >= 1.0) docs
        else docs.filter(Sampling.samplePredicate(col(sampleKeyCol),
          sampleRate, s"$sampleSalt:it$it"))
      val wSnap = w.map(_.clone())
      val bSnap = b.clone()
      val prepped = iterDocs
        .select(y.as("_y"), col(textCol).cast("string").as("_t"))
        .mapPartitions { rowsIt =>
          val md = java.security.MessageDigest.getInstance("MD5")
          rowsIt.map { r =>
            val yv: java.lang.Double = if (r.isNullAt(0)) null else r.getDouble(0)
            val toks =
              if (r.isNullAt(1)) Array.empty[String]
              else TextOps.tokensJvm(r.getString(1))
            val sv = bSnap.clone()
            val bks = Array.newBuilder[Long]
            var j = 0
            while (j < toks.length) {
              val t = toks(j)
              if (t.nonEmpty) {
                val bkt = TextOps.bucketJvm(md, t, dim)
                var c = 0
                while (c < k) { sv(c) += wSnap(c)(bkt); c += 1 }
                bks += bkt.toLong
              }
              j += 1
            }
            // stable softmax + residual K-vector (1[y=cls] − p_cls);
            // the label indicator is 0 (not null) for a null/bad label,
            // exactly the Catalyst when/otherwise result
            var mx = sv(0)
            var c = 1
            while (c < k) { if (sv(c) > mx) mx = sv(c); c += 1 }
            val ex = new Array[Double](k)
            var den = 0.0
            c = 0
            while (c < k) { ex(c) = math.exp(sv(c) - mx); den += ex(c); c += 1 }
            val resid = new Array[Double](k)
            c = 0
            while (c < k) {
              val ind = if (yv != null && yv.doubleValue == c) 1.0 else 0.0
              resid(c) = ind - ex(c) / den
              c += 1
            }
            val bad = yv == null || yv.doubleValue < 0.0 ||
              yv.doubleValue >= k ||
              yv.doubleValue != math.floor(yv.doubleValue)
            // cross-entropy −log p_y = log Σ exp(s − mx) + mx − s_y,
            // bad-label rows contribute 0 (refused via the count anyway)
            val loss =
              if (bad) 0.0
              else math.log(den) + mx - sv(yv.doubleValue.toInt)
            Row(resid.toIndexedSeq, loss, bad, bks.result().toIndexedSeq)
          }
        }(Encoders.row(prepSchema))
      val rows = prepped
        .select(col("_r"), col("_loss"), col("_bad"),
          explode(concat(col("_bk"), array(lit(null).cast("long"))))
            .as("_tok"))
        .groupBy(when(col("_tok").isNull, lit(-1L))
          .otherwise(col("_tok")).as("_bkt"))
        .agg(sum(element_at(col("_r"), 1)).as("_g0"),
          (1 until k).map(c =>
            sum(element_at(col("_r"), c + 1)).as(s"_g$c")) ++
          Seq(sum(when(col("_tok").isNull, col("_loss"))).as("_l"),
            count(when(col("_tok").isNull && col("_bad"), 1)).as("_nbad")): _*)
        .collect()
      val sentinel = rows.find(_.getLong(0) == -1L).getOrElse(
        sys.error(if (sampleRate >= 1.0)
          "train: empty corpus — nothing to fit"
        else s"train: iteration $it sampled no rows at rate $sampleRate — " +
          "raise sampleRate or shrink the iteration count"))
      require(sentinel.getLong(k + 2) == 0L,
        s"train: $labelCol must be an integer in [0, $k) and non-null " +
          s"(${sentinel.getLong(k + 2)} offending rows)")
      losses += sentinel.getDouble(k + 1)
      rows.foreach { r =>
        val bkt = r.getLong(0)
        if (bkt >= 0L)
          (0 until k).foreach(c => w(c)(bkt.toInt) += lr * r.getDouble(c + 1))
      }
      (0 until k).foreach(c => b(c) += lr * sentinel.getDouble(c + 1))
      // convergence probe: the loss already rides the gradient
      // aggregate (the sentinel row), so the check is FREE — no extra
      // job. The plateau iteration's update is still applied, keeping
      // the prefix identity: train(iters, tol) ≡ train(n_run, tol=0)
      // bit-for-bit, where n_run = losses.length.
      val n = losses.length
      plateaued = tol > 0 && n >= 2 &&
        losses(n - 2) - losses(n - 1) <= tol * math.max(1.0, losses(n - 2).abs)
      it += 1
    }
    TrainedRouter(w, b, losses.toArray)
  }
}
