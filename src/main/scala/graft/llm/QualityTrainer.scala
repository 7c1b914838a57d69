package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training for the hashed linear quality model [[QualityClassifier]]
 * scores — the other half of the DCLM/fastText recipe (the reference's
 * quality gates are hand-written heuristics; a learned gate needs its
 * weights to come from somewhere). Full-batch logistic regression by
 * gradient descent over hashed bag-of-words counts:
 *
 *   w_j ← w_j + lr · Σ_docs residual(doc) · count_j(doc)
 *   b   ← b   + lr · Σ_docs residual(doc),  residual = y − sigmoid(score)
 *
 * SCALE SHAPE — ONE job per iteration, model-sized driver state: the
 * per-doc score/residual is the same zero-shuffle fold inference uses
 * (weights ride the plan as one array `Literal`), token occurrences
 * explode to (bucket, residual) and aggregate map-side-combined into
 * at most `dim`+1 groups — the only shuffle is dim-bounded,
 * independent of corpus size. The bias gradient, the (pre-update)
 * logistic loss, and the label sanity check ride the SAME aggregate
 * as a per-doc sentinel row, so nothing costs a second scan. The
 * driver holds only the dim-sized weight vector (the
 * k-means/PQ-codebook discipline): 10^6 hash buckets is 8 MB.
 *
 * DETERMINISM: iteration 1 from zero init is EXACT — sigmoid(0) is
 * 0.5 by IEEE definition, so residuals are the dyadics y − 0.5 and
 * every gradient sum is order-free exact (the pq100 oracle pins this
 * bit-for-bit through a scoring pass). Later iterations cross libm
 * (sigmoid of non-zero scores), so their weights are reproducible on
 * a fixed layout but only ulp-stable across layouts — train/serve
 * skew is avoided by shipping the TRAINED VECTOR, never by
 * re-training (the [[QualityClassifier]] contract).
 *
 * Labels are the caller's problem by design (human ratings, LLM
 * judgments, "is this a reference document" — whatever the recipe
 * distills); they arrive as a 0/1 double column on the corpus frame.
 */
object QualityTrainer {

  /** Trained model + the pre-update logistic loss observed at each
    * iteration (losses(0) is the loss of the INIT weights; a training
    * run that helps shows a decreasing sequence). */
  final case class Trained(weights: Array[Double], bias: Double,
      losses: Array[Double]) {
    /** Inference with the trained model — [[QualityClassifier.score]]. */
    def score(docs: DataFrame, idCol: String, textCol: String,
        ordered: Boolean = true): DataFrame =
      QualityClassifier.score(docs, idCol, textCol, weights, bias, ordered)
  }

  /**
   * Train `iters` full-batch GD steps from `init` (zeros by default).
   *
   * @param labelCol 0.0/1.0 double column (1 = quality). Null labels
   *                 are refused up front — a silently-skipped row is a
   *                 training bug nobody finds.
   * @param dim      hash-bucket count; the returned weight vector's
   *                 length. Collisions are the usual hashing-trick
   *                 trade: more buckets, less aliasing, bigger literal.
   */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int, iters: Int = 5, lr: Double = 0.5,
      init: Option[Array[Double]] = None, initBias: Double = 0.0): Trained = {
    require(dim > 0, s"train: dim must be positive, got $dim")
    require(iters >= 1, s"train: iters must be >= 1, got $iters")
    require(init.forall(_.length == dim),
      s"train: init length must equal dim=$dim")
    val w = init.map(_.clone()).getOrElse(Array.fill(dim)(0.0))
    var b = initBias
    val losses = new Array[Double](iters)
    val y = col(labelCol).cast("double")
    // Per-doc gradient prep as ONE TYPED pass (the r20 score-twin
    // discipline: Catalyst evaluates HOF lambdas INTERPRETED per token,
    // and the per-token md5+lookup fold was this trainer's hot
    // expression). The JVM twin runs the identical arithmetic — same
    // token order (tokensJvm ≡ tokens, pinned), same left-to-right
    // accumulation from the bias, the same libm exp/log1p — and emits
    // each token's BUCKET as a long, so the downstream explode +
    // bucket-keyed aggregate (unchanged: same rows in the same
    // partition order, so the double sums are bit-identical) no longer
    // pays a per-token md5 either.
    import org.apache.spark.sql.types.{ArrayType, BooleanType, DoubleType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val prepSchema = StructType(Seq(
      StructField("_r", DoubleType, nullable = true),
      StructField("_loss", DoubleType, nullable = true),
      StructField("_bad", BooleanType, nullable = false),
      StructField("_bk", ArrayType(LongType, containsNull = false), nullable = false)))
    for (i <- 0 until iters) {
      val wSnap = w.clone()
      val bSnap = b
      val prepped = docs
        .select(y.as("_y"), col(textCol).cast("string").as("_t"))
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { r =>
            val yv: java.lang.Double = if (r.isNullAt(0)) null else r.getDouble(0)
            val toks =
              if (r.isNullAt(1)) Array.empty[String]
              else TextOps.tokensJvm(r.getString(1))
            var sc = bSnap
            val bks = Array.newBuilder[Long]
            var j = 0
            while (j < toks.length) {
              val t = toks(j)
              if (t.nonEmpty) {
                val bkt = TextOps.bucketJvm(md, t, dim)
                sc += wSnap(bkt)
                bks += bkt.toLong
              }
              j += 1
            }
            // residual y − σ(s) and the stable logistic loss
            // max(s,0) − s·y + log1p(exp(−|s|)); both NULL when the
            // label is null (exactly the Catalyst three-valued result)
            val (resid, loss) =
              if (yv == null) (null, null)
              else (java.lang.Double.valueOf(
                  yv.doubleValue - 1.0 / (1.0 + math.exp(-sc))),
                java.lang.Double.valueOf(
                  math.max(sc, 0.0) - sc * yv.doubleValue +
                    math.log1p(math.exp(-math.abs(sc)))))
            val bad = yv == null ||
              (yv.doubleValue != 0.0 && yv.doubleValue != 1.0)
            Row(resid, loss, bad, bks.result().toIndexedSeq)
          }
        }(Encoders.row(prepSchema))
      // ONE aggregate carries everything: each doc's token occurrences
      // (multiplicity = the count feature) plus one SENTINEL null-token
      // row per doc, exploded together and grouped by bucket — the
      // sentinel group (-1) accumulates the bias gradient, the loss,
      // and the bad-label count, so no second pass. The shuffle is
      // dim+1 groups, map-side combined — corpus-size-independent.
      val rows = prepped
        .select(col("_r"), col("_loss"), col("_bad"),
          explode(concat(col("_bk"), array(lit(null).cast("long")))).as("_tok"))
        .groupBy(when(col("_tok").isNull, lit(-1L))
          .otherwise(col("_tok")).as("_bkt"))
        .agg(sum(col("_r")).as("_g"),
          sum(when(col("_tok").isNull, col("_loss"))).as("_l"),
          count(when(col("_tok").isNull && col("_bad"), 1)).as("_bad"))
        .collect()
      val sentinel = rows.find(_.getLong(0) == -1L).getOrElse(
        sys.error("train: empty corpus — nothing to fit"))
      require(sentinel.getLong(3) == 0L,
        s"train: $labelCol must be 0.0/1.0 and non-null " +
          s"(${sentinel.getLong(3)} offending rows)")
      losses(i) = sentinel.getDouble(2)
      rows.foreach { r =>
        if (r.getLong(0) >= 0L) w(r.getLong(0).toInt) += lr * r.getDouble(1)
      }
      b += lr * sentinel.getDouble(1)
    }
    Trained(w, b, losses)
  }

  private val DimKey = "graft.qc.dim"
  private val BiasKey = "graft.qc.bias"

  /**
   * Persist a trained model as a tiny catalog table — one (bucket,
   * weight) row per hash bucket, with dim and bias STAMPED as table
   * properties (the IndexStore discipline: a missing or drifted stamp
   * fails fast instead of silently mis-scoring). Bias round-trips
   * through `Double.toString`/`parseDouble`, which is exact for every
   * IEEE double, so save → load → [[Trained.score]] is bit-identical
   * to scoring with the in-memory model. Training-loss history is a
   * training artifact, not the model — it is not persisted.
   */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Trained,
      tableName: String, path: String): Unit = {
    import spark.implicits._
    model.weights.zipWithIndex.map { case (w, j) => (j, w) }.toSeq
      .toDF("bucket", "weight")
      .repartition(1)
      .write.option("path", path).mode("overwrite").format("parquet")
      .saveAsTable(tableName)
    spark.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES " +
      s"('$DimKey'='${model.weights.length}', '$BiasKey'='${model.bias}')")
  }

  /** Load a [[saveModel]] table back into a scoring-ready [[Trained]].
    * Fails fast on a missing stamp (a table this code did not write)
    * or a row count that disagrees with the stamped dim. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      tableName: String): Trained = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $tableName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val dim = props.getOrElse(DimKey, sys.error(
      s"$tableName carries no $DimKey stamp — not a saveModel table")).toInt
    val bias = java.lang.Double.parseDouble(props.getOrElse(BiasKey,
      sys.error(s"$tableName carries no $BiasKey stamp")))
    val rows = spark.table(tableName).collect()
    require(rows.length == dim,
      s"$tableName: stamped dim=$dim but ${rows.length} weight rows")
    val w = new Array[Double](dim)
    rows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    Trained(w, bias, Array.empty)
  }
}
