package graft.llm

import graft.Presented

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Line-level dedup (the C4 discipline): remove every later occurrence of
 * a line that repeats anywhere in the corpus — boilerplate navigation,
 * license headers, repeated footers — while keeping its globally first
 * occurrence and reassembling each document. The middle granularity
 * tier: document-level ([[ExactDedup]]) catches full copies,
 * [[SubstringDedup]] catches arbitrary repeated regions; line dedup is
 * the cheap, structure-aware form real crawl pipelines run first.
 *
 * Only lines with at least `minTokens` tokens participate — short lines
 * ("yes", list bullets, blank lines) repeat naturally and carry no
 * duplication signal, so they always pass through (the C4 three-sentence
 * convention at token resolution).
 *
 * Scale shape — pure Catalyst, not one window anywhere:
 *  - split + posexplode is a projection (lines stay in their doc's
 *    partition);
 *  - duplicate detection is a map-side-combined aggregate on
 *    `xxhash64(line)` (8-byte shuffle key; a hash collision merges two
 *    lines — the [[TextOps.fnv64Jvm]] trade, Spark-internal only since
 *    the oracle compares OUTPUTS, not keys), with the count > 1 filter
 *    BEFORE the join back so the build side is duplicated lines only;
 *  - the per-line "globally first" is the packed `min(doc_id·2^32+pos)`
 *    (the [[SubstringDedup.removeDuplicated]] policy — no Zipfian
 *    line-keyed window), requiring integral doc ids < 2^31;
 *  - reassembly is one doc-keyed aggregate: collect kept (pos, line)
 *    structs, `array_sort` (struct order = field order, pos first),
 *    re-join — per-doc arrays bounded by document size.
 *
 * `sep` is a LITERAL separator (quoted before the split regex, and used
 * verbatim to re-join). NULL-text rows are excluded (the pq35
 * contract). Output: (doc_id, n_lines, n_removed, cleaned_text).
 */
object LineDedup {

  /** Distinct eligible line hashes of a corpus — the persisted history
    * index [[dedupLinesIncremental]] classifies against. One column
    * (`line_hash` = xxhash64 of the raw line), O(distinct lines) rows:
    * the index never stores line text, the same O(sketch)-not-O(data)
    * trade as [[IncrementalDedup]]'s content-hash index. Store it
    * bucketed by `line_hash` (the [[IndexStore]] discipline) and the
    * every-batch history join plans with no exchange on the index side. */
  def lineIndex(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minTokens: Int = 5): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val quoted = java.util.regex.Pattern.quote(sep)
    df.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol).cast("string"), quoted, -1)).as("_line"))
      .filter(size(split(trim(col("_line")), "\\s+")) >= minTokens)
      .select(xxhash64(col("_line")).as("line_hash"))
      .distinct()
  }

  /**
   * Incremental [[dedupLines]]: clean an arriving BATCH against the
   * accumulated corpus without rescanning history. An eligible batch
   * line whose hash is in the history index is cut unconditionally
   * (its keeper already shipped in an earlier batch); eligible lines
   * NEW to the corpus dedup keep-first within the batch, exactly as
   * [[dedupLines]] would. Union the batch's kept new hashes
   * ([[lineIndex]] of the cleaned output, or equivalently the kept
   * lines) back into the index for the next batch — O(batch) index
   * maintenance, the [[IncrementalDedup.mergeIndex]] contract.
   *
   * Plan shape: the [[dedupLines]] pipeline plus ONE extra equi-join
   * against the index (8-byte keys; bucketed index storage makes it
   * exchange-free on the index side). Output adds the provenance
   * split: (doc_id, n_lines, n_removed_history, n_removed_batch,
   * cleaned_text).
   */
  def dedupLinesIncremental(batch: DataFrame, idCol: String, textCol: String,
      history: DataFrame, sep: String = "\n", minTokens: Int = 5,
      ordered: Boolean = true): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    require(sep.nonEmpty, "sep must be non-empty")
    val quoted = java.util.regex.Pattern.quote(sep)
    val lines = batch.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol).cast("string"), quoted, -1)).as(Seq("_p0", "_line")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("_pos"), col("_line"),
        (size(split(trim(col("_line")), "\\s+")) >= minTokens).as("_elig"))
    val packed = col("doc_id").cast("long") * lit(1L << 32) + col("_pos")
    val hist = history.select(col("line_hash").as("_h")).distinct()
      .withColumn("_inhist", lit(1))
    val withHist = lines
      .join(hist, xxhash64(col("_line")) === col("_h") && col("_elig"), "left")
      .select(col("doc_id"), col("_pos"), col("_line"), col("_elig"),
        col("_inhist").isNotNull.as("_hit"))
    val dup = withHist.filter(col("_elig") && !col("_hit"))
      .groupBy(xxhash64(col("_line")).as("_h2"))
      .agg(count(lit(1)).as("_cnt"), min(packed).as("_keep"))
      .filter(col("_cnt") > 1)
    withHist
      .join(dup, xxhash64(col("_line")) === dup("_h2") && col("_elig") && !col("_hit"), "left")
      .select(col("doc_id"), col("_pos"), col("_line"), col("_hit"),
        (col("_hit") || (col("_cnt").isNotNull && packed =!= col("_keep"))).as("_cut"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_removed_history"),
        sum(when(col("_cut") && !col("_hit"), 1L).otherwise(0L)).as("n_removed_batch"),
        array_join(transform(
          array_sort(collect_list(when(!col("_cut"),
            struct(col("_pos"), col("_line"))))),
          s => s("_line")), sep).as("cleaned_text"))
      .transform(Presented(_, ordered, "doc_id"))
  }

  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minTokens: Int = 5,
      ordered: Boolean = true): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    require(sep.nonEmpty, "sep must be non-empty")
    val quoted = java.util.regex.Pattern.quote(sep)
    val lines = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol).cast("string"), quoted, -1)).as(Seq("_p0", "_line")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("_pos"), col("_line"),
        (size(split(trim(col("_line")), "\\s+")) >= minTokens).as("_elig"))
    val packed = col("doc_id").cast("long") * lit(1L << 32) + col("_pos")
    val dup = lines.filter(col("_elig"))
      .groupBy(xxhash64(col("_line")).as("_h"))
      .agg(count(lit(1)).as("_cnt"), min(packed).as("_keep"))
      .filter(col("_cnt") > 1)
    lines
      .join(dup, xxhash64(col("_line")) === dup("_h") && col("_elig"), "left")
      .select(col("doc_id"), col("_pos"), col("_line"),
        (col("_cnt").isNotNull && packed =!= col("_keep")).as("_cut"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_cut"), 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(!col("_cut"),
            struct(col("_pos"), col("_line"))))),
          s => s("_line")), sep).as("cleaned_text"))
      .transform(Presented(_, ordered, "doc_id"))
  }
}
