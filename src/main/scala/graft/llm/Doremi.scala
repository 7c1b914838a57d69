package graft.llm

import graft.Presented
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DoReMi domain reweighting — the multiplicative-weights (Group-DRO)
 * update that turns per-document EXCESS LOSS (proxy-model loss minus
 * reference-model loss) into the next round's domain mixture (Xie et
 * al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
 * Pretraining", Algorithm 1):
 *
 *   λ_s   = mean over domain s of max(0, excess)      (clipped excess)
 *   raw_s = α_s · exp(η · λ_s)                        (MW step)
 *   w_s   = (1−c) · raw_s / Σ_t raw_t + c / K         (smoothed toward uniform)
 *
 * This closes the engine's DoReMi loop end-to-end: [[DomainRouter]]
 * assigns domains, [[LmScore]] produces the per-doc log-probs whose
 * difference is the excess, THIS step turns them into weights, and
 * [[Sampling.mixtureRates]] takes the weights as the next `targetShares`.
 *
 * SCALE SHAPE: one map-side-combined keyed aggregate over the corpus
 * (the excess column never shuffles raw — only (stratum, sum, count)
 * partials move), then K-bounded arithmetic: the normalizer Σ raw and
 * the domain count K ride ONE broadcast one-row aggregate whose sum is
 * a SORTED stratum-ordered fold (the [[Sampling.temperatureMixtureRates]]
 * discipline — a partition-order double sum would make the last ulp,
 * and a rounding boundary with it, depend on layout). Output is
 * K rows; nothing collects to the driver.
 *
 * DETERMINISM / PORTABILITY: `exp` is the only libm crossing, wrapped
 * in the pq54 discipline — `e_s = ROUND(exp(ROUND(η·λ_s, 4)), 4)` — so
 * an engine whose exp differs in the last ulp still produces the
 * identical rounded factor; weights are ROUND(6) (values, never
 * membership). Clipping keeps η·λ ≥ 0 so e_s ∈ [1, e^(η·λmax)] and the
 * rounded factor can never hit 0.
 *
 * CONTRACT: a NULL stratum or a NULL excess is refused inline
 * (raise_error) — the upstream router/scorer always emits both; a null
 * here is a wiring bug, and silently dropping or zero-filling it would
 * bias the mixture. With `prevWeights` given, the map defines the
 * domain set: weights must be positive and sum to 1 (±1e-6), a stratum
 * outside the map is refused (DoReMi's domains are fixed upfront), and
 * a mapped domain ABSENT from this batch still emits its row with
 * λ = 0 (e = 1: it decays only through normalization — exactly the
 * no-evidence update). With no `prevWeights`, α is uniform over the
 * OBSERVED strata (the common factor 1/K cancels in raw/Σraw).
 */
object Doremi {

  /** @param losses    per-document frame carrying the domain and excess
    *                   loss columns (anything else is ignored)
    * @param strataCol  domain column (group key; null refused)
    * @param excessCol  per-doc excess loss, cast to double (null refused)
    * @param eta        MW step size, > 0
    * @param smoothing  uniform-mixing c ∈ [0, 1]; 1 = uniform output
    * @param prevWeights previous round's mixture α (positive, Σ=1);
    *                   None = uniform over observed strata
    * @return (stratum, n_docs, excess, weight): λ_s ROUND(6), w ROUND(6)
    */
  def reweight(losses: DataFrame, strataCol: String, excessCol: String,
      eta: Double, smoothing: Double,
      prevWeights: Option[Map[String, Double]] = None,
      ordered: Boolean = true): DataFrame = {
    require(eta > 0, s"doremi: eta must be > 0, got $eta")
    require(smoothing >= 0 && smoothing <= 1,
      s"doremi: smoothing must be in [0, 1], got $smoothing")
    prevWeights.foreach { pw =>
      require(pw.nonEmpty, "doremi: prevWeights must be non-empty")
      pw.foreach { case (s, w) =>
        require(w > 0, s"doremi: prevWeights('$s') = $w must be > 0")
      }
      val total = pw.values.sum
      require(math.abs(total - 1.0) <= 1e-6,
        f"doremi: prevWeights sum to $total%.8f, expected 1")
    }

    val stratum = when(col(strataCol).isNull,
        raise_error(lit("doremi: null stratum — the router upstream " +
          "must assign every document a domain")))
      .otherwise(col(strataCol).cast("string"))
    val clipped = when(col(excessCol).isNull,
        raise_error(lit("doremi: null excess loss — the scorer upstream " +
          "must score every document")).cast("double"))
      .otherwise(greatest(lit(0.0), col(excessCol).cast("double")))

    // one corpus pass: (stratum, Σ clipped, count) partials only
    val agg = losses
      .select(stratum.as("stratum"), clipped.as("_c"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum(col("_c")).as("_sum"))

    // with a fixed domain set, absent domains still emit (λ = 0) and
    // foreign domains are refused — both via the full-outer spine
    val withPrev = prevWeights match {
      case Some(pw) =>
        val spark = losses.sparkSession
        import spark.implicits._
        val spine = pw.toSeq.sortBy(_._1).toDF("stratum", "_alpha")
        agg.join(spine, Seq("stratum"), "full_outer")
          .select(
            when(col("_alpha").isNull,
              raise_error(concat(lit("doremi: stratum '"), col("stratum"),
                lit("' is not in prevWeights — DoReMi's domain set is " +
                  "fixed upfront")))).otherwise(col("stratum")).as("stratum"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            coalesce(col("_sum"), lit(0.0)).as("_sum"),
            col("_alpha"))
      // uniform α cancels in raw/Σraw — carry 1.0 and let it
      case None => agg.withColumn("_alpha", lit(1.0))
    }

    val lam = when(col("n_docs") > 0, col("_sum") / col("n_docs"))
      .otherwise(lit(0.0))
    // the pq54 libm discipline: round INTO exp, round OUT of it
    val factor = round(exp(round(lit(eta) * lam, 4)), 4)
    val keyed = withPrev.select(col("stratum"), col("n_docs"),
      round(lam, 6).as("excess"), (col("_alpha") * factor).as("_raw"))

    // Σ raw as a SORTED stratum-ordered fold + K, one broadcast row
    val norm = keyed
      .select(struct(col("stratum"), col("_raw")).as("_s"))
      .agg(sort_array(collect_list(col("_s"))).as("_cs"))
      .select(
        aggregate(col("_cs"), lit(0.0),
          (acc, s) => acc + s.getField("_raw")).as("_z"),
        size(col("_cs")).cast("double").as("_k"))

    keyed.crossJoin(broadcast(norm))
      .select(col("stratum"), col("n_docs"), col("excess"),
        round(lit(1.0 - smoothing) * col("_raw") / col("_z") +
          lit(smoothing) / col("_k"), 6).as("weight"))
      .transform(Presented(_, ordered, "stratum"))
  }

  /**
   * Close the DoReMi round: [[reweight]] the excess losses and feed the
   * resulting domain weights straight into [[Sampling.mixtureRates]] as
   * the next round's target shares — the handoff that turns "these
   * domains are under-learned" into "sample them at these rates".
   *
   * The weights frame is K-bounded (one row per domain), so collecting
   * it is model-sized driver state — the [[DomainRouter]] discipline,
   * never corpus data. The ROUND(6) weights can sum to 1 ± K·5e-7, so
   * they are renormalized (w / Σw, the sum a SORTED stratum-ordered
   * fold) before the share contract's Σ ≤ 1 check — shares shift by
   * ≤ 1e-5 relative, rates carry [[Sampling.mixtureRates]]'s own
   * ROUND(6).
   *
   * @param losses   per-doc (domain, excess) frame for [[reweight]]
   * @param corpus   the corpus to mix — may be the same frame or a
   *                 different snapshot; grouped by `strataCol`
   * @param tokensCol per-doc token count in `corpus`
   * @param weightCol optional count-valued token multiplier (the
   *                 [[SoftDedup]] composition, see mixtureRates)
   * @return mixtureRates output: (stratum, n_tokens, rate, capped)
   */
  def nextMixture(losses: DataFrame, corpus: DataFrame, strataCol: String,
      excessCol: String, tokensCol: String, eta: Double, smoothing: Double,
      budgetTokens: Long, prevWeights: Option[Map[String, Double]] = None,
      weightCol: Option[String] = None): DataFrame = {
    val w = reweight(losses, strataCol, excessCol, eta, smoothing,
        prevWeights, ordered = false)
      .select(col("stratum"), col("weight")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .sortBy(_._1)
    val z = w.foldLeft(0.0)(_ + _._2)
    Sampling.mixtureRates(corpus, strataCol, tokensCol,
      w.map { case (s, v) => s -> v / z }.toMap, budgetTokens, weightCol)
  }
}
