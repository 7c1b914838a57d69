package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Z-order layout laws (the z-value arithmetic is oracle-pinned in
 * pq55):
 *
 *  - the expression tree matches a reference JVM bit-interleave
 *    exhaustively on a grid, and is injective there;
 *  - boundedCell clamps, hits both endpoints, and is monotone;
 *  - THE POINT: clusterBy partitions carry tighter per-partition
 *    bounding boxes than a one-dimensional sort of the same data —
 *    the min/max-pruning win, measured;
 *  - clusterBy is a pure re-layout: same rows, helper column dropped.
 */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark.spark

  private def interleaveRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("zValue == reference interleave on the full 16x16 grid; injective there") {
    val rows = for (x <- 0 until 16; y <- 0 until 16) yield Row(x.toLong, y.toLong)
    val df = TestSpark.df("x bigint, y bigint", rows)
    val got = df.select(col("x"), col("y"),
      ZOrder.zValue(Seq(col("x"), col("y")), bitsPerDim = 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(got((x, y)) == interleaveRef(x, y, 4), s"($x,$y)")
    }
    assert(got.values.toSet.size == rows.size, "z-values must be injective on the grid")
  }

  test("boundedCell: clamps, endpoints exact, monotone") {
    val df = TestSpark.df("v double", Seq(-5.0, 0.0, 2.5, 10.0, 99.0).map(Row(_)))
    val cells = df.select(col("v"),
      ZOrder.boundedCell(col("v"), min = 0.0, max = 10.0, bits = 4).as("c"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(cells(-5.0) == 0L && cells(99.0) == 15L) // clamped
    assert(cells(0.0) == 0L && cells(10.0) == 15L)  // endpoints
    assert(cells(2.5) > cells(0.0) && cells(2.5) < cells(10.0))
  }

  test("clusterBy prunes predicates on the non-leading dimension; one-dim sort cannot") {
    // uniform 64x64 grid. The pruning question is: given min/max footers
    // per partition (file), how many partitions does a predicate on Y
    // overlap? Sorting by X gives slabs spanning all of Y — every file
    // overlaps every Y predicate. Z-order gives near-squares — only the
    // files whose Y range intersects survive.
    val rows = for (x <- 0 until 64; y <- 0 until 64) yield Row(x.toLong, y.toLong)
    val df = TestSpark.df("x bigint, y bigint", rows).repartition(8)
    def bounds(layout: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      layout.withColumn("_p", spark_partition_id())
        .groupBy("_p").agg(min("y").as("lo"), max("y").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    def overlapping(bs: Array[(Long, Long)], lo: Long, hi: Long): Int =
      bs.count { case (l, h) => h >= lo && l <= hi }
    val zBounds = bounds(ZOrder.clusterBy(df,
      Seq(col("x"), col("y")), partitions = 16, bitsPerDim = 6))
    val slabBounds = bounds(df.withColumn("_s", col("x"))
      .repartitionByRange(16, col("_s")).sortWithinPartitions("_s").drop("_s"))
    // predicate: y in [0, 7] — an eighth of the domain
    val (zHit, slabHit) = (overlapping(zBounds, 0, 7), overlapping(slabBounds, 0, 7))
    info(s"partitions overlapping y in [0,7]: z-order $zHit/16 vs x-sort $slabHit/16")
    assert(slabHit == slabBounds.length, "x-slabs all span Y — nothing prunes")
    assert(zHit * 2 <= slabHit,
      s"z-order must prune at least half the files: $zHit vs $slabHit")
  }

  test("clusterBy is a pure re-layout: same rows, no helper column") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val out = ZOrder.clusterBy(o, Seq(
      ZOrder.modCell(col("o_custkey"), 8),
      ZOrder.boundedCell(col("o_totalprice"), 0, 600000, 8)), partitions = 4, bitsPerDim = 8)
    assert(out.columns.toSeq == o.columns.toSeq)
    assert(out.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq ==
      o.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
