package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The pq16b sketch-percentile contract, pinned against the exact form
 * at fixture scale:
 *
 *  - MEMBERSHIP: percentile_approx returns an actual data value of its
 *    group (a GK summary keeps real samples; interpolation would
 *    invent values).
 *  - RANK ERROR: the returned value's rank in the group is within
 *    n/accuracy of the target rank — the documented GK guarantee, the
 *    number a user trades state for. At accuracy 10000 and fixture
 *    group sizes (n << accuracy) the window is under one rank, i.e.
 *    effectively exact.
 *
 * The exact percentile() buffers O(rows) per group; the sketch holds
 * O(accuracy) — at 100 TB the sketch is the only viable plan, and this
 * law is what "approx" costs.
 */
class ApproxPercentileSpec extends AnyFunSuite {
  import TestSpark.spark

  private val accuracy = 10000
  private val ps = Seq(0.5, 0.9, 0.99)

  test("percentile_approx: group membership and the n/accuracy rank-error bound, per source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val approx = docs.groupBy("source")
      .agg(percentile_approx(col("n_chars"), array(ps.map(lit): _*),
        lit(accuracy)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val groups = docs.select("source", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (s, rs) =>
        s -> rs.map(_.getLong(1)).sorted
      }
    assert(approx.keySet == groups.keySet)
    for ((source, vals) <- groups; (p, i) <- ps.zipWithIndex) {
      val v = approx(source)(i)
      val n = vals.length
      assert(vals.contains(v), s"$source p$p: $v is not a data value")
      val below = vals.count(_ < v) // v's rank window is (below, atOrBelow]
      val atOrBelow = vals.count(_ <= v)
      val eps = n.toDouble / accuracy
      val target = p * n
      assert(below <= target + eps && atOrBelow >= target - eps,
        s"$source p$p: value $v has rank window ($below, $atOrBelow] " +
          s"outside target $target +- $eps over n=$n")
    }
  }

  test("percentile_approx: partitioning-invariant at fixture scale (merge path == single-partition path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("source")
      .agg(percentile_approx(col("n_chars"), array(ps.map(lit): _*),
        lit(accuracy)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
  }
}
