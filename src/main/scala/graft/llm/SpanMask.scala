package graft.llm

import graft.Presented
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Deterministic span-corruption mask generation — the T5 denoising
 * objective's data side (Raffel et al. 2020 §3.1.4: corrupt ~15% of
 * tokens in contiguous spans of mean length ~3): decide which token
 * spans each document masks, reproducibly, so every epoch/worker/rerun
 * derives the identical corruption from (salt, doc_id) alone — no RNG
 * state to ship, no coordination.
 *
 * Construction (closed-form, so both engines compute it exactly):
 * tokens group into fixed blocks of `blockLen`; block b of doc d masks
 * iff `u32(md5(salt ':' d ':' b)) % 10000 < rate * 10000`; adjacent
 * masked blocks MERGE into one span (gaps-and-islands), which is what
 * makes realized span length geometric-tailed with mean >= blockLen —
 * the T5 shape — while keeping the expected masked-token fraction
 * exactly `rate`.
 *
 * Spark shape: pure Catalyst — sequence/explode for blocks, the
 * portable md5 hash for the mask, and two DOC-keyed windows for the
 * island merge and span numbering (documents bound the partitions,
 * never a corpus-wide key). One shuffle on doc_id. Output:
 * (idCol, span_id (1-based per doc), tok_start (0-based, inclusive),
 * tok_end (exclusive, clamped to the doc's token count)).
 */
object SpanMask {

  def spans(df: DataFrame, idCol: String, textCol: String,
      rate: Double = 0.15, blockLen: Int = 3, salt: String = "t5",
      ordered: Boolean = true): DataFrame = {
    require(rate > 0 && rate <= 1, s"spans: rate in (0, 1]; got $rate")
    require(blockLen >= 1, s"spans: blockLen >= 1; got $blockLen")
    val threshold = math.round(rate * 10000).toInt
    val toks = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), size(TextOps.tokens(col(textCol))).cast("long").as("_n"))
      .filter(col("_n") >= 1)
    val blocks = toks
      .select(col(idCol), col("_n"),
        explode(sequence(lit(0L), ceil(col("_n") / blockLen).cast("long") - 1)).as("_b"))
    val masked = blocks.filter(
      conv(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"),
        lit(":"), col("_b").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long") % 10000 < threshold)
    // gaps and islands: consecutive masked blocks share (_b - rn)
    val wOrd = Window.partitionBy(idCol).orderBy("_b")
    val islands = masked
      .withColumn("_grp", col("_b") - row_number().over(wOrd))
      .groupBy(col(idCol), col("_grp"))
      .agg(min("_b").as("_b0"), max("_b").as("_b1"), first("_n").as("_n"))
    val wSpan = Window.partitionBy(idCol).orderBy("_b0")
    islands
      .select(col(idCol),
        row_number().over(wSpan).cast("long").as("span_id"),
        (col("_b0") * blockLen).as("tok_start"),
        least((col("_b1") + 1) * blockLen, col("_n")).as("tok_end"))
      .transform(Presented(_, ordered, idCol, "span_id"))
  }
}
