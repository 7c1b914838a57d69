package graft.llm

import graft.Presented
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering — the linear-classifier gate modern
 * pretraining pipelines run beside the heuristic one (a
 * fastText-style model scoring "does this look like reference-quality
 * text", the DCLM / FineWeb-Edu recipe; cf. reference heuristics in
 * `ncpi-whistler`'s value-cleaning filters, which gate on FORM — this
 * gates on learned CONTENT weights). The engine side is pure
 * inference: a trained weight vector is applied over hashed
 * bag-of-words features at corpus scale. Training stays wherever the
 * labels are; what must scale is the scoring pass.
 *
 * SCALE SHAPE — zero shuffle, zero UDF: tokens come from the shared
 * [[TextOps.tokens]] column expression, each token feature-hashes to
 * a bucket (top-32-bits-of-md5 mod dim — the engine's cross-engine
 * hash discipline), the weight lookup is `element_at` into ONE array
 * literal (the weight vector rides the plan as a single `Literal`,
 * never a join), and the per-document fold is a codegen'd
 * higher-order `aggregate`. A corpus scan scores in place; the plan
 * is projection-only, so it pipelines into whatever filter/write
 * follows.
 *
 * DETERMINISM: hashed weights are exact dyadics when the caller's
 * vector is (any IEEE double works, but sums are then order-free ONLY
 * up to ulps); the per-doc fold runs in token order, which is
 * partition-invariant because the tokens array itself is. `score` is
 * rounded to 6, `prob` (sigmoid) to 4 — the pq54 discipline for
 * libm-crossing values.
 *
 * Output: (doc_id, n_tokens, score, prob). Null/empty texts score the
 * bias alone with n_tokens 0 — every document gets exactly one row.
 */
object QualityClassifier {

  /** Feature-hash a token to [0, dim): top 32 bits of md5, mod dim —
    * SQL-expressible on both engines (the determinism-playbook hash).
    * Shared with [[QualityTrainer]] so training and inference can
    * never disagree on the feature space. */
  private[llm] def bucket(tok: Column, dim: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(dim.toLong))

  /**
   * Score every document under the hashed linear model:
   * `score = bias + Σ_tokens w[hash(token)]`, `prob = sigmoid(score)`.
   *
   * @param weights the trained weight vector; its length IS the
   *                feature dimension (hash buckets)
   */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double = 0.0,
      ordered: Boolean = true): DataFrame = {
    require(weights.nonEmpty, "score: weights must be non-empty")
    val dim = weights.length
    // ONE typed pass (the qualityGate discipline): Catalyst evaluates
    // higher-order-function lambdas INTERPRETED — per token, per doc —
    // so at bench scale the HOF fold was the chain's hottest
    // expression; the JVM twin evaluates the identical fold (same
    // token order, same left-to-right double accumulation, the same
    // md5-prefix bucket via TextOps.bucketJvm, Spark's exact HALF_UP
    // rounding) and is pinned bit-for-bit by the pq99/pq100 oracles.
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = StructType(Seq(
      docs.schema(docs.schema.fieldIndex(idCol)).copy(name = "doc_id"),
      StructField("n_tokens", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("prob", DoubleType, nullable = false)))
    val w = weights
    val b = bias
    docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          var raw = b
          var n = 0L
          if (!r.isNullAt(1)) {
            val toks = TextOps.tokensJvm(r.getString(1))
            var i = 0
            while (i < toks.length) {
              val t = toks(i)
              if (t.nonEmpty) {
                raw += w(TextOps.bucketJvm(md, t, dim))
                n += 1
              }
              i += 1
            }
          }
          Row(r.get(0), n, TextOps.roundHalfUpJvm(raw, 6),
            TextOps.roundHalfUpJvm(1.0 / (1.0 + math.exp(-raw)), 4))
        }
      }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, "doc_id"))
  }

  /**
   * The gate: keep documents whose classifier probability reaches
   * `threshold` (inclusive — compared on the ROUNDED `prob` so the
   * keep/drop decision is engine-portable, the contaminationReport
   * discipline). Returns the kept documents with their score columns
   * attached; compose with [[TextAnalysis.qualityGate]] for the
   * heuristic+model double gate.
   */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double = 0.0, threshold: Double = 0.5,
      ordered: Boolean = true): DataFrame = {
    require(threshold >= 0 && threshold <= 1,
      s"gate: threshold in [0, 1], got $threshold")
    val scored = score(docs, idCol, textCol, weights, bias, ordered = false)
      .filter(col("prob") >= threshold)
    docs.join(scored, docs(idCol) === scored("doc_id"))
      .drop(scored("doc_id"))
      .transform(Presented(_, ordered, idCol))
  }

  /**
   * Empirical calibration + threshold sweep over SCORE bins — the
   * reliability read that turns "we trained a quality classifier" into
   * "gate at this score for this precision": per bin of width
   * `binWidth` in raw-score (log-odds) space, the observed positive
   * rate, plus the CUMULATIVE precision of gating at that bin's lower
   * bound (sum over this-and-better bins — the threshold-sweep table,
   * one pass instead of re-gating per candidate threshold).
   *
   * Bins are over the SCORE, not the probability, deliberately: the
   * score is exact arithmetic (hash-bucket weight sums) while prob
   * crosses libm's exp — binning on prob would hang bin MEMBERSHIP on
   * a libm ulp (the pq54 rule: rounding absorbs value drift, never
   * membership). Monotone binning makes the curves equivalent reads.
   *
   * One map-side-combined aggregate over the scored corpus (bins are
   * data-bounded: scores are bounded by the weight mass), then
   * bin-count-sized windows; counts are exact BIGINTs, each rate ONE
   * division under ROUND(6). Null labels and null scores are excluded.
   * Output: (bucket, n_docs, n_pos, pos_rate, cum_docs, cum_pos,
   * cum_precision); `bucket * binWidth` is the bin's score lower bound.
   */
  def calibrationSweep(scored: DataFrame, scoreCol: String,
      labelCol: String, binWidth: Double = 1.0,
      ordered: Boolean = true): DataFrame = {
    require(binWidth > 0, s"calibrationSweep: binWidth must be positive, got $binWidth")
    import org.apache.spark.sql.expressions.Window
    val agg = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(floor(col(scoreCol) / lit(binWidth)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(labelCol).cast("long")).as("n_pos"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n_docs"), 6))
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("cum_precision",
        round(col("cum_pos").cast("double") / col("cum_docs"), 6))
      .transform(Presented(_, ordered, "bucket"))
  }

  /** The gate threshold a [[calibrationSweep]] recommends: the LOWEST
    * bin lower-bound whose cumulative precision clears the target —
    * lowest because every cleared bin keeps strictly more docs at
    * acceptable precision. None when no bin clears. The sweep is
    * bin-count-sized, so the collect is model-sized by construction. */
  def pickScoreThreshold(sweep: DataFrame, targetPrecision: Double,
      binWidth: Double = 1.0): Option[Double] = {
    require(targetPrecision > 0 && targetPrecision <= 1,
      s"pickScoreThreshold: target in (0, 1], got $targetPrecision")
    require(binWidth > 0, s"pickScoreThreshold: binWidth must be positive")
    val hit = sweep.filter(col("cum_precision") >= targetPrecision)
      .agg(min(col("bucket"))).collect()
    hit.headOption.filterNot(_.isNullAt(0)).map(_.getLong(0) * binWidth)
  }
}
