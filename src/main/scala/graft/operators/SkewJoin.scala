package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Salted equi-join for skewed keys (SURVEY.md §7 risks: "salt skewed
 * embed keys"). A hot key funnels its entire partition through one task
 * in a plain shuffle join; salting splits each left-side key into
 * `saltBuckets` sub-keys and replicates the right side once per bucket,
 * so a hot key's rows spread over `saltBuckets` tasks.
 *
 * Use when AQE's skew-join handling isn't available or the skew is
 * extreme and known in advance (AQE splits oversized partitions after
 * the fact; salting prevents them). Results are identical to the plain
 * join — pinned by the spec.
 *
 * Cost model: right side is replicated `saltBuckets`x — choose the
 * smaller side as `right`, and keep `saltBuckets` near the ratio of the
 * hottest key's row count to a healthy partition size.
 */
object SkewJoin {

  /** Join types whose results are unchanged by replicating the right
   *  side: inner/left/semi. Right/full outer would emit one null-padded
   *  row PER SALT COPY for an unmatched right row. */
  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi")

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi joins, got '$joinType' " +
        "(the replicated right side would duplicate unmatched right rows)")
    val salted = left.withColumn("_salt", (rand(seed = 7) * saltBuckets).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated, keys :+ "_salt", joinType)
      .drop("_salt")
  }
}
