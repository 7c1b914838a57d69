package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Z-order (Morton curve) clustering — multi-dimensional data layout
 * for scan pruning, the technique behind Delta/Iceberg `OPTIMIZE
 * ZORDER BY`: interleave the bits of several dimension cells into one
 * sort key, so rows close in EVERY dimension land close in the flat
 * order. Files (range partitions) written in z-order then carry tight
 * min/max ranges on ALL clustered columns at once, and a predicate on
 * any of them prunes most of the corpus at the parquet footer — the
 * single biggest lever for selective scans at 100 TB.
 *
 * Everything here is pure Catalyst bit arithmetic (shift/and/or,
 * codegen'd, no UDFs) over explicit integer cells, so z-values are
 * deterministic, engine-portable (oracle-pinned, pq55) and cheap. The
 * layout op is ONE range exchange + per-partition sort — exactly the
 * cost of any global sort, buying multi-column locality instead of
 * one-column.
 */
object ZOrder {

  /** Bit-interleaved z-value of `cells` (each an integer cell id in
    * [0, 2^bitsPerDim)): bit b of cell i lands at position
    * b * nDims + i. Unrolled into a codegen'd expression tree —
    * nDims * bitsPerDim shift/mask terms OR'd together. Cells out of
    * range fold in by their low bits (callers produce bounded cells
    * via [[boundedCell]] / [[modCell]]). */
  def zValue(cells: Seq[Column], bitsPerDim: Int = 21): Column = {
    require(cells.nonEmpty, "zValue: need at least one cell column")
    require(bitsPerDim >= 1 && cells.size * bitsPerDim <= 63,
      s"zValue: ${cells.size} dims * $bitsPerDim bits must fit 63 bits")
    val n = cells.size
    val terms = for {
      b <- 0 until bitsPerDim
      (c, i) <- cells.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear cell id for a value in a caller-known [min, max] range:
    * floor((v - min) / (max - min) * (2^bits - 1)), clamped into range
    * (values outside the stated bounds saturate rather than wrap).
    * Bounds are explicit parameters — no extra pass over the data. */
  def boundedCell(v: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, s"boundedCell: need max > min; got [$min, $max]")
    require(bits >= 1 && bits <= 31, s"boundedCell: bits in [1, 31]; got $bits")
    val cells = (1L << bits) - 1
    val raw = floor((v.cast("double") - lit(min)) / lit(max - min) * lit(cells.toDouble))
    least(greatest(raw, lit(0L)), lit(cells)).cast("long")
  }

  /** Cheap cell id for already-integer keys with no meaningful bounds:
    * the non-negative low bits (pmod, so negatives don't go negative). */
  def modCell(v: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"modCell: bits in [1, 31]; got $bits")
    pmod(v.cast("long"), lit(1L << bits))
  }

  /**
   * Lay `df` out in z-order over `cells`: one range exchange on the
   * z-value into `partitions` splits, sorted within each — every
   * partition (→ output file) then spans a compact z-range, i.e. a
   * tight hyper-rectangle in all clustered dimensions. Write the
   * result partition-preserving (parquet does) and min/max footers do
   * the pruning. The helper column is dropped on the way out.
   */
  def clusterBy(df: DataFrame, cells: Seq[Column], partitions: Int,
      bitsPerDim: Int = 21): DataFrame = {
    require(partitions >= 1, s"clusterBy: need partitions >= 1; got $partitions")
    df.withColumn("_z", zValue(cells, bitsPerDim))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
