package graft.streaming

import graft.llm.{Hll, TextOps}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Streaming corpus statistics — the [[graft.llm.CorpusReport]] numbers
 * maintained INCREMENTALLY over a document stream, without ever
 * rescanning history: each micro-batch contributes exact counter
 * deltas (docs, nulls, empties, tokens) that SUM, and an HLL register
 * table for distinct contents that merges by register-wise MAX
 * ([[graft.llm.Hll.merge]]'s semilattice law — merge(sketch(A),
 * sketch(B)) EQUALS sketch(A ∪ B) exactly, which is what makes a
 * cumulative distinct count possible at all without storing history).
 *
 * State is one tiny catalog table of (metric, register, value) rows —
 * 5 counters + m registers + a batch watermark + the stamped register
 * count m (drift in m fails fast instead of merging incompatible
 * register sets) — read, merged
 * DRIVER-side (it is model-sized; a distributed merge would also hit
 * Spark's cannot-overwrite-what-you-read rule), and written back per
 * batch. Only the BATCH aggregation is a Spark job, and it is one
 * map-side-combined pass over the batch.
 *
 * REPLAY-IDEMPOTENT: foreachBatch re-delivers a batch after failures.
 * The HLL rows would absorb a replay (MAX is idempotent) but the
 * counters would double-count, so the state carries the last applied
 * batch id and a re-delivered batch is skipped whole — the standard
 * foreachBatch exactly-once discipline.
 */
object StreamingCorpusStats {

  private val Schema = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("register", LongType, nullable = true),
    StructField("value", LongType, nullable = false)))

  private val Counters = Seq(
    "n_docs", "n_null_text", "n_empty_text", "n_tokens", "n_text_docs")
  private val BatchKey = "_last_batch_id"
  // the register count is STATE, not a free parameter: registers from
  // sketches of different m are incompatible (merging or estimating
  // across them is silent garbage — the rhos-fit guard only catches a
  // SHRINKING m), so m is stamped as a state row on first write and
  // every later applyBatch/snapshot must pass the same value — the
  // same fail-fast discipline as IndexStore's TBLPROPERTIES stamps
  private val MKey = "_hll_m"

  private def requireSameM(stored: Option[Long], m: Int, tableName: String): Unit =
    stored.foreach(s => require(s == m.toLong,
      s"$tableName was built with m=$s HLL registers, but this call passes " +
        s"m=$m — register sets of different m are incompatible; pass the " +
        "table's m or rebuild the stats table"))

  /** The maintaining sink: aggregate each micro-batch, merge into the
    * stats table, skip already-applied batch ids. Caller sets
    * checkpointLocation and `.start()`s. */
  def sink(stream: DataFrame, idCol: String, textCol: String,
      tableName: String, m: Int = 1024): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, textCol, tableName, m)
      ()
    }

  /** One batch application — exposed for batch-mode backfill and
    * tests: aggregates `batch`, merges into `tableName` (creating it
    * when absent), returns false iff the batch id was already applied
    * (replay skipped). */
  def applyBatch(batch: DataFrame, batchId: Long, textCol: String,
      tableName: String, m: Int = 1024): Boolean = {
    val spark = batch.sparkSession
    val existing: Map[(String, Option[Long]), Long] =
      if (!spark.catalog.tableExists(tableName)) Map.empty
      else spark.table(tableName).collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))) -> r.getLong(2))
        .toMap
    requireSameM(existing.get((MKey, None)), m, tableName)
    val lastApplied = existing.getOrElse((BatchKey, None), -1L)
    if (batchId <= lastApplied) return false

    val toks = filter(TextOps.tokens(col(textCol)), w => w =!= "")
    val t = col(textCol).cast("string")
    val counters = batch.agg(
      count(lit(1)).as("n_docs"),
      count(when(t.isNull, lit(1))).as("n_null_text"),
      count(when(t.isNotNull && size(toks) === 0, lit(1))).as("n_empty_text"),
      coalesce(sum(when(t.isNull, lit(null).cast("long"))
        .otherwise(size(toks).cast("long"))), lit(0L)).as("n_tokens"),
      count(when(t.isNotNull, lit(1))).as("n_text_docs")).head()
    val regs = Hll.sketch(
      batch.filter(t.isNotNull).select(TextOps.md5Hex(t).as("_h")),
      "_h", m, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val merged: Seq[((String, Option[Long]), Long)] =
      Counters.zipWithIndex.map { case (name, i) =>
        ((name, None: Option[Long]),
          existing.getOrElse((name, None), 0L) + counters.getLong(i))
      } ++
        // register-wise MAX union of the stored and batch sketches
        (existing.keysIterator.collect { case ("hll", Some(r)) => r }.toSet ++
          regs.keySet).toSeq.sorted.map { r =>
          (("hll", Some(r): Option[Long]),
            math.max(existing.getOrElse(("hll", Some(r)), Long.MinValue),
              regs.getOrElse(r, Long.MinValue)))
        } :+ (((BatchKey, None: Option[Long])), batchId) :+
        (((MKey, None: Option[Long])), m.toLong)

    val rows: java.util.List[Row] = java.util.Arrays.asList(
      merged.map { case ((metric, reg), v) =>
        Row(metric, reg.map(Long.box).orNull, v)
      }: _*)
    // tiny overwrite (5 + m + 2 rows); driver-merged, so no
    // read-overwrite conflict. One file is plenty.
    spark.createDataFrame(rows, Schema).coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(tableName)
    true
  }

  /** The dashboard view of a stats table: (metric, value double) —
    * the cumulative counters, the HLL estimate of distinct contents
    * (the [[graft.llm.Hll]] estimator over the stored registers), and
    * the derived approx duplication rate. */
  def snapshot(spark: SparkSession, tableName: String, m: Int = 1024): DataFrame = {
    val st = spark.table(tableName).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))) -> r.getLong(2))
      .toMap
    requireSameM(st.get((MKey, None)), m, tableName)
    val counters = Counters.map(n => n -> st.getOrElse((n, None), 0L).toDouble)
    val regRows = st.collect { case (("hll", Some(r)), v) => Row(r, v) }.toSeq
    val distinct =
      if (regRows.isEmpty) 0.0
      else Hll.estimate(
        spark.createDataFrame(java.util.Arrays.asList(regRows: _*),
          StructType(Seq(StructField("register", LongType, nullable = false),
            StructField("max_rho", LongType, nullable = false)))), m)
    val nText = st.getOrElse(("n_text_docs", None), 0L).toDouble
    val dupRate =
      if (nText == 0) 0.0
      else math.max(0.0, 1.0 - distinct / nText)
    val out = counters ++ Seq(
      "approx_distinct_contents" -> distinct,
      "approx_dup_rate" -> dupRate)
    spark.createDataFrame(
      java.util.Arrays.asList(out.map { case (k, v) => Row(k, v) }: _*),
      StructType(Seq(StructField("metric", StringType, nullable = false),
        StructField("value", org.apache.spark.sql.types.DoubleType, nullable = false))))
      .orderBy("metric")
  }
}
