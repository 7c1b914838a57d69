package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Keyword retrieval over the corpus — BM25 scoring (Robertson et al.,
 * Okapi BM25, in the non-negative `ln(1 + (N-df+0.5)/(df+0.5))` idf
 * form Lucene uses) for corpus audit: "which documents best match this
 * probe query" is the lexical sibling of [[Similarity.cosineTopK]]'s
 * embedding search, and the standard way to pull contamination /
 * memorization suspects for a known probe string when no embedding
 * column exists.
 *
 * Scale shape: the query's term set is list-sized and rides the plan as
 * literals; one explode restricted to query terms (codegen'd `isin` on
 * the scan side — the corpus never shuffles full text), one
 * (doc, term) count aggregate, a broadcast join against the
 * terms-bounded document-frequency table, and a per-doc fold over
 * term-sorted structs (bit-deterministic double summation). Corpus
 * scalars (N, avgdl) ride as a broadcast one-row aggregate — scoring
 * composes lazily, the [[LmScore]] discipline. Matching is
 * case-folded on both sides (`lower`), whitespace tokens, the
 * [[graft.llm.TextOps.tokens]] convention.
 */
object Retrieval {

  /**
   * Per-document BM25 scores for `terms`: (idCol, matched, score), one
   * row per document containing at least one query term; `matched` =
   * distinct query terms present. score = Σ_t idf(t) · tf(t,d)·(k1+1)
   * / (tf(t,d) + k1·(1 − b + b·|d|/avgdl)), idf = ln(1 + (N − df +
   * 0.5)/(df + 0.5)) — non-negative, so more matched terms never score
   * below fewer. Oracle-pinned (pq86) under ROUND(…, 4).
   */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      ordered: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25Scores: need at least one query term")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"bm25Scores: k1 >= 0 and b in [0, 1]; got k1=$k1 b=$b")
    val termsLc = terms.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
    require(termsLc.nonEmpty, "bm25Scores: terms are all empty/blank")
    val toks = filter(TextOps.tokens(col(textCol)), w => w =!= "")
    // `_toks` materialized below explode: size + explode reference the
    // tokenize chain twice inside a Generate (no codegen subexpression
    // elimination there) — the Blocklist.score / bigramCounts lesson
    val docs = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"), toks.as("_toks"))
      .select(col("_id"), size(col("_toks")).cast("long").as("_len"),
        explode(col("_toks")).as("_w0"))
      .select(col("_id"), col("_len"), lower(col("_w0")).as("_w"))
    val hits = docs.filter(col("_w").isin(termsLc: _*))
    // corpus scalars (N docs, average length) as a broadcast one-row
    // aggregate: composition stays lazy, nothing collects
    val stats = df.filter(col(textCol).isNotNull)
      .select(size(toks).cast("long").as("_l"))
      .agg(count(lit(1)).as("_n"),
        coalesce(avg(col("_l")), lit(0.0)).as("_avg"))
    val tf = hits.groupBy("_id", "_len", "_w").agg(count(lit(1)).as("_tf"))
    val dft = hits.select("_id", "_w").distinct()
      .groupBy("_w").agg(count(lit(1)).as("_df"))
    val term: Column => Column = s => {
      val idf = log(lit(1.0) +
        (col("_n").cast("double") - s.getField("d") + lit(0.5)) /
          (s.getField("d") + lit(0.5)))
      val tfn = s.getField("t").cast("double") * lit(k1 + 1.0) /
        (s.getField("t").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("_len").cast("double") / col("_avg")))
      idf * tfn
    }
    tf.join(broadcast(dft), Seq("_w"))
      .select(col("_id"), col("_len"),
        struct(col("_w").as("w"), col("_tf").as("t"),
          col("_df").cast("double").as("d")).as("_s"))
      // term-sorted fold: the double sum never depends on partitioning
      .groupBy("_id", "_len")
      .agg(sort_array(collect_list(col("_s"))).as("_ws"),
        count(lit(1)).as("matched"))
      .crossJoin(broadcast(stats))
      .select(col("_id").as(idCol), col("matched"),
        aggregate(col("_ws"), lit(0.0), (acc, s) => acc + term(s)).as("score"))
      .transform(Presented(_, ordered, idCol))
  }

  /**
   * Top-k retrieval: the `k` highest-scoring documents for `terms`,
   * ties to the lower id. `orderBy(...).limit(k)` executes as
   * TakeOrderedAndProject — per-partition bounded heaps, only
   * partitions·k rows move (the [[Similarity.cosineTopK]] discipline);
   * equal to [[bm25Scores]] sorted head-k by construction (golden law).
   * Output adds `rnk` (1-based).
   */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"bm25TopK: k >= 1, got $k")
    val scored = bm25Scores(df, idCol, textCol, terms, k1, b, ordered = false)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    scored.select(
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col(idCol).asc))).cast("long").as("rnk"),
      col(idCol), col("matched"), col("score"))
  }

  /**
   * Ranking-quality evaluation — recall@k, reciprocal rank, and binary
   * NDCG@k per query — the audit loop every retrieval stack needs:
   * after building an index ([[graft.llm.ProductQuant]], [[Ivf]]) or a
   * fusion ([[rrfFuse]]), this is how its quality is measured against
   * labeled relevant pairs (and how nprobe/bands/k knobs are tuned on
   * real numbers instead of vibes).
   *
   * Inputs: `results` carries (qid, cid, rnk) ranked lists (rows with
   * rnk > k are ignored, so feeding a deeper list evaluates the top-k
   * cut; a candidate appearing at multiple ranks is min-rank
   * deduplicated so it counts as one hit); `truth` carries (qid, cid)
   * relevant pairs (deduplicated here). Output, one row per qid IN TRUTH (a query with no truth has
   * no defined metrics; a query with truth but no results scores 0):
   *
   *  - `n_truth`, `n_hits`: relevant total / relevant retrieved in top-k
   *  - `recall_at_k` = n_hits / n_truth
   *  - `rr` = 1/rank of the first relevant result (0 when none) — the
   *    mean over queries is MRR
   *  - `ndcg_at_k`: binary gains, DCG = Σ 1/log2(1+rank) over relevant
   *    retrieved, normalized by the ideal DCG for min(n_truth, k) hits
   *
   * SCALE SHAPE: results are top-k-bounded and truth is eval-sized, so
   * everything is model-sized — one dedup, one join on (qid, cid), two
   * keyed aggregates. Double sums fold over SORTED rank arrays
   * (partitioning-invariant); gains use ln(2)/ln(1+r) so both engines
   * compute the same libm expression (log2 differs by ulps across
   * implementations); all ratios ROUND(6).
   */
  def evalRanking(results: DataFrame, truth: DataFrame, k: Int,
      ordered: Boolean = true): DataFrame = {
    require(k >= 1, s"evalRanking: k >= 1, got $k")
    // min-rank dedup on (qid, cid): a candidate listed at two ranks (an
    // upstream union/fusion that skipped its own dedup) must count as ONE
    // hit at its best rank — without this, n_hits double-counts and
    // recall/ndcg can exceed 1.0. A no-op (same plan cardinality) when the
    // input honors the one-row-per-candidate shape the retrievers emit.
    val res = results.filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("rnk").cast("long").as("_r"))
      .groupBy("qid", "cid").agg(min(col("_r")).as("_r"))
    val t = truth.select(col("qid"), col("cid")).distinct()
    val nTruth = t.groupBy("qid").agg(count(lit(1)).as("n_truth"))
    val perQ = res.join(t, Seq("qid", "cid"))
      .groupBy("qid").agg(
        count(lit(1)).as("_nh"),
        min(col("_r")).as("_first"),
        sort_array(collect_list(col("_r"))).as("_hr"))
    val ln2 = math.log(2.0)
    val dcg = aggregate(col("_hr"), lit(0.0),
      (acc, r) => acc + lit(ln2) / log(r.cast("double") + 1.0))
    val idcg = aggregate(sequence(lit(1L), least(col("n_truth"), lit(k.toLong))),
      lit(0.0), (acc, i) => acc + lit(ln2) / log(i.cast("double") + 1.0))
    nTruth.join(perQ, Seq("qid"), "left")
      .select(col("qid"), col("n_truth"),
        coalesce(col("_nh"), lit(0L)).as("n_hits"),
        round(coalesce(col("_nh"), lit(0L)).cast("double") / col("n_truth"), 6)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("_first"), lit(0.0)), 6).as("rr"),
        round(when(col("_nh").isNull, 0.0).otherwise(dcg / idcg), 6)
          .as("ndcg_at_k"))
      .transform(Presented(_, ordered, "qid"))
  }

  /**
   * Hard-negative mining (the DPR/ANCE recipe): top-ranked retrieved
   * candidates that are NOT labeled positives are the hard negatives a
   * contrastive trainer needs — random negatives are too easy, and
   * everything the retriever ranks highly but the labels reject is
   * exactly the decision boundary. Emits one row per negative:
   * (qid, cid, rnk, neg_rank) with `rnk` the retriever's original rank
   * and `neg_rank` a dense 1-based rank over the negatives.
   *
   * `skipTop` drops the first positions of each list entirely
   * (positives AND negatives): the very top of a strong retriever is
   * where UNLABELED TRUE positives concentrate, and mining them as
   * negatives poisons the training signal — skipping rank 1 (or a few)
   * is the standard mitigation when labels are sparse.
   *
   * Only queries PRESENT IN TRUTH are mined: a query with no labeled
   * positive gives no signal about which candidates are safe to call
   * negative. Scale shape: results are top-k-bounded, truth is
   * eval-sized — one semi-join, one anti-join, one bounded-cardinality
   * window. Model-sized at any corpus scale.
   */
  def hardNegatives(results: DataFrame, truth: DataFrame, k: Int,
      skipTop: Int = 0, ordered: Boolean = true): DataFrame = {
    require(k >= 1 && skipTop >= 0 && skipTop < k,
      s"hardNegatives: need k >= 1 and 0 <= skipTop < k; got k=$k skipTop=$skipTop")
    val res = results.filter(col("rnk") <= k && col("rnk") > skipTop)
      .select(col("qid"), col("cid"), col("rnk").cast("long").as("rnk"))
    val t = truth.select(col("qid"), col("cid")).distinct()
    val negs = res
      .join(t.select("qid").distinct(), Seq("qid"), "left_semi")
      .join(t, Seq("qid", "cid"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("rnk"), col("cid"))
    negs.withColumn("neg_rank", row_number().over(w).cast("long"))
      .transform(Presented(_, ordered, "qid", "neg_rank"))
  }

  /**
   * Reciprocal-rank fusion (Cormack et al., RRF) over two or more
   * ranked retrieval lists — the standard score-free way to combine
   * heterogeneous retrievers (dense ANN + lexical BM25, or an ensemble
   * of ANN indexes): each list contributes 1/(c + rank) per candidate,
   * summed across lists; candidates ranked by the fused score. Scores
   * need no calibration because only RANKS enter — which is exactly
   * why RRF is the default fusion for rankers whose score scales are
   * incomparable (an ADC distance and a cosine can't be averaged; their
   * ranks can).
   *
   * CONTRACT: every input carries (qid, cid, rnk) — the shape
   * [[Similarity.cosineTopK]], [[ProductQuant.adcTopK]]/ivfAdcTopK*,
   * and [[Ivf.topK]] all emit (adapt [[bm25TopK]]'s single-query
   * output by adding a literal qid). A candidate absent from a list
   * simply contributes nothing (`n_lists` reports how many lists
   * surfaced it — the agreement signal).
   *
   * SCALE SHAPE: inputs are already top-k-bounded (≤ |Q|·k rows each),
   * so fusion is model-sized regardless of corpus scale — one union,
   * one keyed aggregate, one window over ≤ lists·k rows per qid
   * (bounded per-key cardinality, NOT a Zipf-keyed window). The heavy
   * lifting stays in the retrievers. The per-candidate sum folds over
   * the SORTED rank list (sort_array + aggregate), so every double is
   * partitioning-invariant — the pq54/pq72 double-fold discipline —
   * and the fused score is ROUND(6) BEFORE ranking so the rank order
   * is engine-portable.
   *
   * @param c rank damping (Cormack's 60): higher flattens the
   *          difference between rank 1 and rank k
   * @return (qid, rnk, cid, rrf, n_lists), top `k` per qid, ties on
   *         the fused score broken by cid
   */
  /** [[tuneNprobe]]'s result: the chosen knob, its measured mean
    * recall@k, and every (nprobe, recall) the search evaluated —
    * the audit trail a tuning decision should ship with. */
  final case class NprobeTuning(nprobe: Int, recall: Double,
      sweep: Seq[(Int, Double)])

  /**
   * ANN knob auto-tuning on measured ranking quality — the
   * SCALE.md retrieval tuning loop as code instead of prose: find the
   * SMALLEST `nprobe` whose mean recall@k against `truth` meets
   * `targetRecall`, by running [[ProductQuant.ivfAdcTopKPruned]]
   * searches and scoring them with [[evalRanking]].
   *
   * The sweep is a galloping upper probe + binary search, not a linear
   * walk: the cap is evaluated first (ONE search refuses an
   * unreachable target before any sweep work — recall at the cap is
   * the best this index can do), then lower-bound binary search over
   * [1, cap] costs O(log cap) searches — at nlist = 4096 that is ~12
   * evaluations, not 4096. Correctness of the binary search rests on
   * recall being monotone in nprobe; structurally, more probes score a
   * SUPERSET of candidates (AnnRecallSpec pins per-query monotonicity
   * for the probe machinery), though a closer false neighbor entering
   * the top-k can in principle dip a query's recall — if that
   * pathological corpus materializes, the returned knob still MEETS
   * the target (its recall was measured, and is returned), it just may
   * not be the global minimum.
   *
   * Scale shape: each evaluation is one partition-pruned search over
   * the probed cells plus a model-sized evalRanking — the sweep never
   * touches more than the searches a serving deployment would run
   * anyway. `truth` is (qid, cid) labeled relevant pairs, eval-sized.
   *
   * @throws IllegalArgumentException when even nprobe = cap misses
   *         `targetRecall` — raise k, add a refine stage, retrain the
   *         quantizer, or lower the target
   */
  def tuneNprobe(index: DataFrame, queries: DataFrame, truth: DataFrame,
      idCol: String, vecCol: String, centroids: Array[Array[Long]],
      model: ProductQuant.PqModel, k: Int, targetRecall: Double,
      maxNprobe: Int = 0): NprobeTuning = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"tuneNprobe: need 0 < targetRecall <= 1, got $targetRecall")
    require(k >= 1, s"tuneNprobe: k >= 1, got $k")
    val cap =
      if (maxNprobe >= 1) math.min(maxNprobe, centroids.length)
      else centroids.length
    require(!truth.isEmpty, "tuneNprobe: truth must carry labeled pairs")
    val evaluated = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    def recallAt(np: Int): Double = evaluated.getOrElseUpdate(np, {
      val res = ProductQuant.ivfAdcTopKPruned(index, queries, idCol, vecCol,
        centroids, model, k, np, ordered = false)
      evalRanking(res, truth, k, ordered = false)
        .agg(avg(col("recall_at_k"))).collect()(0).getDouble(0)
    })
    val atCap = recallAt(cap)
    if (atCap < targetRecall - 1e-9)
      throw new IllegalArgumentException(
        f"tuneNprobe: target recall $targetRecall%.3f unreachable — " +
          f"nprobe=$cap (the cap) measures $atCap%.3f; raise k, add a " +
          "refine stage, retrain the quantizer, or lower the target")
    var lo = 1
    var hi = cap
    while (lo < hi) {
      val mid = lo + (hi - lo) / 2
      if (recallAt(mid) >= targetRecall - 1e-9) hi = mid else lo = mid + 1
    }
    NprobeTuning(lo, evaluated(lo), evaluated.toSeq.sortBy(_._1))
  }

  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60,
      ordered: Boolean = true): DataFrame = {
    require(rankings.size >= 2, s"rrfFuse: need >= 2 lists, got ${rankings.size}")
    require(k >= 1 && c >= 0, s"rrfFuse: need k >= 1, c >= 0; got k=$k c=$c")
    // min-rank dedup PER LIST before the union: a list carrying one
    // candidate at two ranks would otherwise contribute 1/(c+r) twice
    // (and inflate n_lists past the list count). Model-sized inputs make
    // the extra keyed aggregate per list free; a no-op on the
    // one-row-per-candidate shape the retrievers emit.
    val u = rankings.map(_.select(col("qid"), col("cid"),
        col("rnk").cast("int").as("_r"))
      .groupBy("qid", "cid").agg(min(col("_r")).as("_r")))
      .reduce(_ unionByName _)
    val fused = u.groupBy("qid", "cid")
      .agg(sort_array(collect_list(col("_r"))).as("_rs"))
      .select(col("qid"), col("cid"),
        round(aggregate(col("_rs"), lit(0.0),
          (acc, r) => acc + lit(1.0) / (lit(c.toDouble) + r.cast("double"))),
          6).as("rrf"),
        size(col("_rs")).cast("long").as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("rrf").desc, col("cid"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), col("rrf"), col("n_lists"))
      .transform(Presented(_, ordered, "qid", "rnk"))
  }
}
