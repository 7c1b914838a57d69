package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Edit-distance near-duplicate pairs by partition-based signature join
 * (the PassJoin scheme, Li et al., VLDB 2012) — the character-level
 * dedup tier for short strings (titles, queries, code lines, URLs)
 * where token-level [[SimHashSignatures]]/[[MinHashNearDup]] are blind:
 * a one-character typo is a whole-token change.
 *
 * Soundness (no false negatives): split every indexed string into
 * k = maxDist+1 contiguous segments; at most maxDist edit operations
 * touch a true pair, so some segment survives UNCHANGED and appears in
 * the other string as an exact substring, displaced by the net
 * insertions/deletions before it. With `shift` that displacement and
 * `delta` the length difference, ops-before >= |shift| and ops-after >=
 * |delta - shift| force |shift| + |delta - shift| <= maxDist — the
 * multi-match-aware window that keeps the probe expansion at
 * O(maxDist²) substrings per row instead of O(maxDist³).
 *
 * Spark shape: both sides are codegen'd projections (segment explode on
 * the index side, windowed-substring explode on the probe side), ONE
 * shuffle joins on (segment_index, segment, indexed_length), and
 * `levenshtein(..., threshold)` verifies candidates with early exit
 * BEFORE the pair distinct. Never all-pairs; candidate volume is
 * quadratic only in a single segment bucket (identical leading
 * segments), so run [[ExactDedup]] first on adversarial corpora — the
 * [[SimHashNearDup]] contract. Strings shorter than k yield empty
 * segments that match every same-(i, L) empty probe; such degenerate
 * tiny-string pairs still verify exactly.
 */
object EditDistance {

  /** floor(l / k) on a non-negative int column — exact for l < 2^31. */
  private def fdiv(l: Column, k: Int): Column = floor(l / k).cast("int")

  /** Segment i's (start, length) for an indexed string of length `len`,
    * 0-based: the first k-rem segments take floor(len/k) chars, the
    * last rem take one more. */
  private def segStartLen(len: Column, i: Int, k: Int): (Column, Column) = {
    val base = fdiv(len, k)
    val rem = len - base * k
    val extra = greatest(lit(0), lit(i) - (lit(k) - rem)) // longer segs before i
    val start = lit(i) * base + extra
    val sl = base + when(lit(i) >= lit(k) - rem, 1).otherwise(0)
    (start, sl)
  }

  /**
   * All pairs within Levenshtein distance `maxDist`, exactly:
   * (doc_a, doc_b, dist) with doc_a < doc_b. Ids must be a numeric or
   * string type with a total order; null ids/strings are skipped.
   */
  def nearDupPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2, ordered: Boolean = true): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4,
      s"nearDupPairs: maxDist in [1, 4] (probe expansion is quadratic in it), got $maxDist")
    val k = maxDist + 1
    val base = df
      .select(col(idCol).as("_ed_id"), col(strCol).cast("string").as("_ed_s"))
      .filter(col("_ed_id").isNotNull && col("_ed_s").isNotNull)
      .withColumn("_ed_l", length(col("_ed_s")))

    // Index side: the k segments of each string, keyed (i, seg, l).
    val segCols = (0 until k).map { i =>
      val (start, sl) = segStartLen(col("_ed_l"), i, k)
      struct(lit(i).as("i"), substring(col("_ed_s"), start + 1, sl).as("seg"))
    }
    val index = base.select(col("_ed_id").as("doc_a"), col("_ed_s").as("_ed_sa"),
        col("_ed_l").as("_ed_la"), explode(array(segCols: _*)).as("_p"))
      .select(col("doc_a"), col("_ed_sa"), col("_ed_la"),
        col("_p.i").as("_ed_i"), col("_p.seg").as("_ed_seg"))

    // Probe side: for every candidate indexed length L = lt - delta and
    // segment i, the substrings at starts within the multi-match-aware
    // window. (i, delta, shift) are static; start/length are Columns.
    val probeCols = for {
      i <- 0 until k
      delta <- -maxDist to maxDist
      shift <- -maxDist to maxDist
      if math.abs(shift) + math.abs(shift - delta) <= maxDist
    } yield {
      val cl = col("_ed_l") - delta // candidate indexed length L
      val (start, sl) = segStartLen(cl, i, k)
      val pos = start + shift
      val valid = cl >= 0 && pos >= 0 && pos + sl <= col("_ed_l")
      when(valid, struct(lit(i).as("i"), substring(col("_ed_s"), pos + 1, sl).as("seg"),
        cl.as("l"))).otherwise(lit(null))
    }
    val probe = base.select(col("_ed_id").as("doc_b"), col("_ed_s").as("_ed_sb"),
        explode(array(probeCols: _*)).as("_p"))
      .filter(col("_p").isNotNull)
      .select(col("doc_b"), col("_ed_sb"),
        col("_p.i").as("_ed_i"), col("_p.seg").as("_ed_seg"), col("_p.l").as("_ed_lb"))
      .dropDuplicates("doc_b", "_ed_i", "_ed_seg", "_ed_lb")

    val cand = index.join(probe,
        index("_ed_i") === probe("_ed_i") && index("_ed_seg") === probe("_ed_seg") &&
          index("_ed_la") === probe("_ed_lb"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        when(col("doc_a") < col("doc_b"), col("_ed_sa")).otherwise(col("_ed_sb")).as("_ed_x"),
        when(col("doc_a") < col("doc_b"), col("_ed_sb")).otherwise(col("_ed_sa")).as("_ed_y"))
      .dropDuplicates("doc_a", "doc_b")

    cand
      .withColumn("dist", levenshtein(col("_ed_x"), col("_ed_y"), maxDist).cast("bigint"))
      .filter(col("dist") >= 0)
      .select("doc_a", "doc_b", "dist")
      .transform(Presented(_, ordered, "doc_a", "doc_b"))
  }
}
