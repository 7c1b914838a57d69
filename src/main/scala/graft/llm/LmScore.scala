package graft.llm

import graft.Presented
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Unigram language-model quality scoring — the CCNet-style perplexity
 * signal (Wenzek et al. 2020: score web text under a reference LM,
 * bucket the corpus into head/middle/tail by score) with a unigram LM
 * standing in for KenLM: every document gets its mean per-token
 * Laplace-smoothed log-probability under a reference word-frequency
 * table (any [[Bpe.wordCounts]] output — the corpus itself for a
 * self-LM, or a trusted corpus for quality filtering).
 *
 * Scale shape: one explode + one (id, word)-keyed aggregate (skew-free
 * by construction — the document id spreads hot words), then the word
 * join against the LM table runs SALTED ([[SkewJoin.saltedJoin]]):
 * Zipf head words hit every document, and a plain shuffle join would
 * funnel "the" through one task. The per-document fold sums in
 * sorted-word order (a `sort_array` + `aggregate` higher-order fold),
 * so scores are bit-deterministic across partitionings despite double
 * arithmetic. Nothing is ever collected: the two LM scalars (total
 * count, vocabulary size) ride the plan as a broadcast one-row
 * aggregate, so composing a score is lazy like every other operator.
 *
 * Per-document score: lp = (Σ_w occ_w · ln((cnt_w + 1) / (T + V))) / n
 * with cnt_w = 0 for out-of-vocabulary words; documents with no tokens
 * score exactly 0.0 with n_tokens 0 (oracle-pinned, pq54).
 */
object LmScore {

  /**
   * Score `docs` under the unigram LM `lm` (columns (word, cnt)).
   * Output: (idCol, n_tokens, logprob) — mean per-token smoothed log
   * probability (higher = more LM-like).
   */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String, lm: DataFrame,
      saltBuckets: Int = 8, ordered: Boolean = true): DataFrame = {
    // LM scalars (total count, vocab) ride as a broadcast one-row
    // aggregate — composition stays lazy, no eager driver action.
    val lmStats = lm.agg(
      coalesce(sum("cnt"), lit(0L)).as("_lm_t"), count(lit(1)).as("_lm_v"))
    // explode_OUTER keeps token-free docs (null/empty text) as a single
    // null-word row, so every document flows through the ONE keyed
    // aggregate — the alternative is a corpus-sized spine left-join at
    // the end just to restore them (what this operator shipped until
    // round 15). Null words never match the salted LM join and
    // contribute exactly nothing to either fold, so scores are
    // bit-identical to the joined form.
    val words = docs
      .select(col(idCol).as("_id"),
        explode_outer(filter(TextOps.tokens(col(textCol)), w => w =!= "")).as("word"))
      .groupBy("_id", "word").agg(count(lit(1)).as("_occ"))
    val joined = SkewJoin.saltedJoin(
      words, lm.select(col("word"), col("cnt").as("_cnt")),
      Seq("word"), "left", saltBuckets)
    // deterministic per-doc fold: sorted (word, occ, cnt) structs summed
    // in word order, so the double total never depends on partitioning.
    // The fold itself runs as ONE TYPED pass over the sorted array (the
    // trainer-twin discipline — Catalyst evaluates HOF lambdas
    // interpreted per element): same left-to-right order over the same
    // sort_array output, the same libm log, so the sums are
    // bit-identical to the HOF form.
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = StructType(Seq(
      docs.schema(docs.schema.fieldIndex(idCol)).copy(name = idCol),
      StructField("n_tokens", LongType, nullable = false),
      StructField("logprob", DoubleType, nullable = false)))
    joined
      .select(col("_id"), struct(col("word").as("w"), col("_occ").as("o"),
        coalesce(col("_cnt"), lit(0L)).as("c")).as("_s"))
      .groupBy("_id").agg(sort_array(collect_list(col("_s"))).as("_ws"))
      .crossJoin(broadcast(lmStats))
      .select(col("_id"), col("_ws"),
        (col("_lm_t") + col("_lm_v")).cast("double").as("_denom"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ws = r.getSeq[Row](1)
          val dn = r.getDouble(2)
          var n = 0L
          var lpsum = 0.0
          ws.foreach { s =>
            if (!s.isNullAt(0)) { // w null = token-free sentinel row
              val o = s.getLong(1)
              n += o
              lpsum += o.toDouble * math.log((s.getLong(2) + 1L).toDouble / dn)
            }
          }
          Row(r.get(0), n, if (n == 0L) 0.0 else lpsum / n)
        }
      }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, idCol))
  }

  /**
   * CCNet-style corpus partition by score: adds `bucket` =
   * head (logprob >= headMin) / middle (>= middleMin) / tail. Pure
   * derived column — thresholds come from the caller (typically chosen
   * from score quantiles of a held-out sample, as CCNet does).
   */
  def perplexityBuckets(scored: DataFrame, headMin: Double, middleMin: Double): DataFrame = {
    require(headMin >= middleMin,
      s"perplexityBuckets: headMin ($headMin) must be >= middleMin ($middleMin)")
    scored.withColumn("bucket",
      when(col("logprob") >= headMin, "head")
        .when(col("logprob") >= middleMin, "middle")
        .otherwise("tail"))
  }

  /** Adjacent-token bigram counts (w1, w2, cnt) — the context table
    * [[bigramLogProb]] consumes, built like [[Bpe.wordCounts]]: a pure
    * Catalyst zip of each token array with its own tail, one explode,
    * one map-side-combined aggregate. No window, no shuffle before the
    * count. */
  def bigramCounts(docs: DataFrame, textCol: String,
      ordered: Boolean = true): DataFrame = {
    // `_toks` materialized in a lower projection: the pairs expression
    // references the tokenize chain FIVE times (two sizes, two slices,
    // the zip input) inside a Generate, where codegen subexpression
    // elimination does not apply — inlined, the regex split ran five
    // times per row. CollapseProject keeps the split single-evaluated
    // (it refuses to merge a multiply-referenced non-cheap expression)
    // — the Blocklist.score lesson.
    val toks = col("_toks")
    val pairs = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    docs.filter(col(textCol).isNotNull)
      .select(filter(TextOps.tokens(col(textCol)), w => w =!= "").as("_toks"))
      .select(explode(pairs).as("_p"))
      .select(col("_p.w1"), col("_p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .transform(Presented(_, ordered, "w1", "w2"))
  }

  /**
   * Bigram language-model scoring with STUPID BACKOFF (Brants et al.
   * 2007 — the web-scale smoothing that needs no discount tuning):
   * position 0 scores under the smoothed unigram; every later position
   * scores ln(cnt(w_{i-1} w_i) / cnt(w_{i-1})) when the bigram is in
   * the LM, else backs off to ln(alpha · P_uni(w_i)) with the same
   * Laplace-smoothed unigram as [[unigramLogProb]].
   *
   * Scale shape: ONE salted unigram join attaches cnt(w) per position,
   * then a lag window keyed BY DOCUMENT (bounded partitions — never a
   * word key) derives both the context word AND its unigram count
   * (lag of the joined cnt — the context-denominator join for free),
   * and one salted bigram join attaches cnt(ctx, w); "of the" hits
   * every document, so both joins run SALTED, the Zipf-head discipline
   * of the unigram path. Per-document fold sums in position order, so
   * scores are bit-deterministic under any partitioning; tokenless
   * documents score exactly 0.0 with n_tokens 0.
   *
   * `uni` and `bi` must come from the same corpus (a bigram whose
   * context word is missing from `uni` backs off defensively rather
   * than dividing by zero).
   */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame, alpha: Double = 0.4,
      saltBuckets: Int = 8, ordered: Boolean = true): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"bigramLogProb: alpha in (0, 1], got $alpha")
    val lmStats = uni.agg(
      coalesce(sum("cnt"), lit(0L)).as("_lm_t"), count(lit(1)).as("_lm_v"))
    // posexplode_OUTER: token-free docs survive as one (null pos, null
    // word) row and the trailing corpus-sized spine join disappears —
    // see [[unigramLogProb]]; null words match neither LM join and the
    // folds skip null-pos structs, so scores are bit-identical
    val positioned = docs
      .select(col(idCol).as("_id"),
        posexplode_outer(filter(TextOps.tokens(col(textCol)), w => w =!= "")).as(Seq("_pos", "word")))
    val withUni = SkewJoin.saltedJoin(positioned,
      uni.select(col("word"), col("cnt").as("_ccnt")), Seq("word"), "left", saltBuckets)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_id").orderBy("_pos")
    val withCtx = withUni
      .withColumn("ctx", lag(col("word"), 1).over(w))
      .withColumn("_pcnt", lag(col("_ccnt"), 1).over(w)) // cnt(ctx) for free
    val withBi = SkewJoin.saltedJoin(withCtx,
      bi.select(col("w1").as("ctx"), col("w2").as("word"), col("cnt").as("_bcnt")),
      Seq("ctx", "word"), "left", saltBuckets)
    // the fold struct carries ONLY what the fold reads: `_pos` (unique
    // per doc, so it alone fixes the sort_array order — bit-identical
    // summation) plus the three counts and a first-position flag. The
    // ctx/word STRINGS stay out of the per-doc collect_list shuffle —
    // they were ~half its bytes and the fold never read them beyond
    // ctx IS NULL. The fold itself runs as ONE TYPED pass over the
    // sorted array (the trainer-twin discipline): same left-to-right
    // position order, the same libm log — bit-identical to the HOF form.
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = StructType(Seq(
      docs.schema(docs.schema.fieldIndex(idCol)).copy(name = idCol),
      StructField("n_tokens", LongType, nullable = false),
      StructField("logprob", DoubleType, nullable = false)))
    withBi
      .select(col("_id"), struct(col("_pos").as("x"),
        col("ctx").isNull.as("f"),
        col("_bcnt").as("b"), col("_pcnt").as("p"),
        coalesce(col("_ccnt"), lit(0L)).as("u")).as("_s"))
      .groupBy("_id").agg(sort_array(collect_list(col("_s"))).as("_ws"))
      .crossJoin(broadcast(lmStats))
      .select(col("_id"), col("_ws"),
        (col("_lm_t") + col("_lm_v")).cast("double").as("_denom"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ws = r.getSeq[Row](1)
          val dn = r.getDouble(2)
          var n = 0L
          var lpsum = 0.0
          ws.foreach { s =>
            if (!s.isNullAt(0)) { // x null = token-free doc's null row
              n += 1L
              val u = s.getLong(4)
              val unigram = (u + 1L).toDouble / dn
              lpsum +=
                (if (s.getBoolean(1)) math.log(unigram)
                else if (!s.isNullAt(2) && !s.isNullAt(3) && s.getLong(3) > 0L)
                  math.log(s.getLong(2).toDouble / s.getLong(3).toDouble)
                else math.log(alpha * unigram))
            }
          }
          Row(r.get(0), n, if (n == 0L) 0.0 else lpsum / n)
        }
      }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, idCol))
  }

  /**
   * CCNet's head/middle/tail split: bucket every document by its LM
   * perplexity RELATIVE TO ITS GROUP (per language in the original —
   * a ppl that is "tail" for English prose is routine for code), via
   * per-group percentile CUTOFFS, not a rank window. That distinction
   * is the scale shape: `ntile` needs a total order per group — a
   * corpus-wide sort under every language key, exactly the Zipf-keyed
   * window this engine bans — while the cutoff form is one
   * partial+final percentile aggregate (group-count-sized result)
   * broadcast back for a comparison projection. Swap `percentile` for
   * `percentile_approx` at sketch scale; the plan is identical.
   *
   * Buckets are 1..cuts.size+1 ascending in perplexity (1 = head =
   * most LM-like). Comparisons are engine-portable by the playbook
   * discipline: ppl = ROUND(exp(−ROUND(logprob, 4)), 4) (the pq54
   * value), cutoffs interpolated over those rounded ppls and ROUND(6)
   * before the strict `>` — both engines compare identical doubles.
   * Token-free docs score logprob 0 → ppl 1, the head of any real
   * group; gate them upstream ([[TextAnalysis.qualityGate]]) when
   * that is not wanted.
   *
   * Output: (idCol, groupCol, n_tokens, ppl, bucket).
   */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, lm: DataFrame,
      cuts: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      saltBuckets: Int = 8, ordered: Boolean = true): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted &&
      cuts.forall(c => c > 0 && c < 1) && cuts.distinct == cuts,
      s"perplexityBuckets: cuts must be distinct, ascending, in (0,1): $cuts")
    val scored = unigramLogProb(docs, idCol, textCol, lm, saltBuckets,
      ordered = false)
    val base = scored
      .select(col(idCol), col("n_tokens"),
        round(exp(-round(col("logprob"), 4)), 4).as("ppl"))
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
    val cutCols = cuts.zipWithIndex.map { case (q, i) =>
      round(percentile(col("ppl"), lit(q)), 6).as(s"_c$i")
    }
    val cutoffs = base.groupBy(col(groupCol))
      .agg(cutCols.head, cutCols.tail: _*)
    val bucket = cuts.indices.foldLeft(lit(1)) { (acc, i) =>
      acc + (col("ppl") > col(s"_c$i")).cast("int")
    }
    base.join(broadcast(cutoffs), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("n_tokens"), col("ppl"),
        bucket.cast("long").as("bucket"))
      .transform(Presented(_, ordered, idCol))
  }
}
