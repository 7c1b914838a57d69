package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005) over an item column
 * — the fixed-size frequency summary for when the exact `groupBy(item)`
 * is itself corpus-shaped (billions of distinct n-grams at 100 TB):
 * depth × width counters answer point frequency queries with one-sided
 * error (estimate >= truth, over-count bounded by ~2N/width w.h.p. per
 * row, min over depth rows tightens it).
 *
 * Spark shape: each input row explodes to `depth` (row, bucket) pairs
 * — a codegen'd projection — and ONE map-side-combined aggregate
 * produces the depth*width-bounded sketch. Nothing else shuffles; the
 * sketch is broadcastable downstream. Hashing is the portable
 * `u32(md5(salt ':' j ':' item)) % width` (the [[Packing]]/[[Dsir]]
 * discipline), so the sketch itself is oracle-checkable in exact
 * integers (pq57) and mergeable across corpora by plain addition
 * (counter-wise `+` — pinned in the spec).
 */
object CountMin {

  private def bucket(item: Column, j: Int, width: Int, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:$j:"), item.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long") % width

  /** Build the sketch: one (row, bucket, cnt) output row per non-empty
    * counter (absent counters are zero — the SQL GROUP BY shape). Null
    * items are skipped. */
  def build(df: DataFrame, itemCol: String, depth: Int = 4, width: Int = 1024,
      salt: String = "cms", ordered: Boolean = true): DataFrame = {
    require(depth >= 1 && width >= 1, s"build: need depth, width >= 1; got $depth, $width")
    val pairs = (0 until depth).map(j =>
      struct(lit(j.toLong).as("row"), bucket(col(itemCol), j, width, salt).as("bucket")))
    df.filter(col(itemCol).isNotNull)
      .select(explode(array(pairs: _*)).as("_p"))
      .select(col("_p.row"), col("_p.bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
      .transform(Presented(_, ordered, "row", "bucket"))
  }

  /** Driver-side point-query view of a collected sketch. */
  final case class Sketch(depth: Int, width: Int, salt: String,
      counters: Map[(Long, Long), Long]) {
    /** Estimated frequency: min over rows — always >= the true count. */
    def estimate(item: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until depth).map { j =>
        val b = java.lang.Long.parseLong(
          TextOps.md5HexJvm(md, s"$salt:$j:$item").substring(0, 8), 16) % width
        counters.getOrElse((j.toLong, b), 0L)
      }.min
    }
  }

  /** Collect a built sketch (depth*width-bounded by construction). */
  def collect(sketch: DataFrame, depth: Int, width: Int, salt: String): Sketch =
    Sketch(depth, width, salt,
      sketch.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap)

  /** Merge two sketches built with identical (depth, width, salt):
    * counter-wise addition — the stream/shard-merge property that makes
    * the sketch usable incrementally. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
}
