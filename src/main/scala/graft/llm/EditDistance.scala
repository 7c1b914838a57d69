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
 * Spark shape: the index side is a codegen'd k-segment explode; the
 * probe side is a typed per-partition pass (its O(maxDist²) windowed
 * substring enumeration as one expression tree overflows janino's
 * method limit — the JVM loop emits identical rows and dedups
 * (i, seg, L) per document in-row, replacing a dropDuplicates
 * shuffle). ONE shuffle joins on (segment_index, segment,
 * indexed_length), and `levenshtein(..., threshold)` verifies
 * candidates with early exit BEFORE the pair distinct. Never
 * all-pairs; candidate volume is
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
    // window. A TYPED stage, not an exploded struct array: the
    // (i, delta, shift) cross product is O(maxDist²) ~27 branch-heavy
    // expressions whose single generated consume method blows janino's
    // 64 KB limit and drops the whole stage to interpreted execution —
    // the JVM loop emits the same rows, deduplicates (i, seg, L) per
    // document in-row (replacing a dropDuplicates SHUFFLE), and keeps
    // the stage compiled.
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      base.schema("_ed_id").copy(name = "doc_b"),
      org.apache.spark.sql.types.StructField("_ed_sb",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_ed_i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("_ed_seg",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_ed_lb",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val shifts: Array[Array[Int]] = Array.tabulate(2 * maxDist + 1) { di =>
      val delta = di - maxDist
      (-maxDist to maxDist)
        .filter(s => math.abs(s) + math.abs(s - delta) <= maxDist).toArray
    }
    val probe = base.select(col("_ed_id"), col("_ed_s"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.get(0)
          val s = r.getString(1)
          val lt = s.length
          val seen = new java.util.HashSet[(Int, String, Int)]()
          val out = Seq.newBuilder[org.apache.spark.sql.Row]
          var delta = -maxDist
          while (delta <= maxDist) {
            val cl = lt - delta // candidate indexed length L
            if (cl >= 0) {
              val b = cl / k
              val rem = cl - b * k
              var i = 0
              while (i < k) {
                val start = i * b + math.max(0, i - (k - rem))
                val sl = b + (if (i >= k - rem) 1 else 0)
                for (shift <- shifts(delta + maxDist)) {
                  val pos = start + shift
                  if (pos >= 0 && pos + sl <= lt) {
                    val seg = s.substring(pos, pos + sl)
                    if (seen.add((i, seg, cl)))
                      out += org.apache.spark.sql.Row(id, s, i, seg, cl)
                  }
                }
                i += 1
              }
            }
            delta += 1
          }
          out.result()
        }
      }(org.apache.spark.sql.Encoders.row(probeSchema))

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
