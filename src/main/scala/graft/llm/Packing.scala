package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-order primitives: deterministic corpus reshuffling and
 * fixed-token sequence packing — the two layout passes between a
 * cleaned corpus and a training run.
 *
 * Both are pure functions of (salt, id), so a re-run reproduces the
 * exact order and packing (training reproducibility), and both avoid a
 * GLOBAL total order: at corpus scale `orderBy(hash)` is one range
 * exchange through a single sort; sharding first bounds every ordered
 * window by the shard-size contract the training job already imposes
 * (a shard must fit its consumer).
 */
object Packing {

  /** Portable 32-bit hash: the first 8 md5 hex chars of salt||key as a
    * long — the integer twin of [[Sampling]]'s hex-compare trick
    * (DuckDB: CAST('0x' || substr(md5(..), 1, 8) AS BIGINT)). */
  private def hash32(key: org.apache.spark.sql.Column, salt: String) =
    conv(substring(
      md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 8),
      16, 10).cast("long")

  /** The shard a key lands in — EXACTLY [[shardShuffle]]/
    * [[packSequences]]'s assignment hash, exposed so callers that
    * stratify state BY SHARD (e.g. [[IncrementalPipeline]]'s
    * maintaining sample table) provably agree with the packer's
    * assignment instead of re-deriving it. */
  def shardOf(key: org.apache.spark.sql.Column, shards: Int,
      salt: String = "graft"): org.apache.spark.sql.Column = {
    require(shards > 0, s"shards must be positive, got $shards")
    pmod(hash32(key, salt + ":s"), lit(shards))
  }

  /**
   * Deterministic reshuffle: each row lands in shard
   * `hash(salt:s, id) % shards` at position `rank of hash(salt:o, id)`
   * within the shard — a reproducible global permutation delivered as
   * (shard, pos) instead of one totally-ordered stream. ONE shuffle
   * (the shard partition); each shard sorts in one task, so pick
   * `shards` to make a shard task-sized — the same sizing the training
   * reader needs anyway. Two INDEPENDENT hashes: with a single hash the
   * within-shard order would be a function of the shard assignment
   * (every shard ordered by the same residue-classed value), coupling
   * the permutation to the shard count.
   *
   * Null ids have no stable identity and are dropped, as in
   * [[Sampling]]. Ids must be UNIQUE: duplicate ids share both sort
   * keys, making their relative positions nondeterministic — dedup
   * upstream (same precondition as [[AsOfJoin]]'s right side).
   * Output: input columns + (shard, pos), pos 1-based.
   */
  def shardShuffle(df: DataFrame, idCol: String, shards: Int,
      salt: String = "graft"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(!df.columns.contains("shard") && !df.columns.contains("pos") &&
      !df.columns.contains("_h2"),
      "columns shard/pos/_h2 collide with the operator's output — alias them away")
    val w = Window.partitionBy("shard").orderBy(col("_h2"), col(idCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("shard", pmod(hash32(col(idCol), salt + ":s"), lit(shards)))
      .withColumn("_h2", hash32(col(idCol), salt + ":o"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h2")
  }

  /**
   * Curriculum-ordered shard shuffle: the [[shardShuffle]] plan — same
   * hash-assigned shards, same ONE shuffle — but within each shard rows
   * order by (`scoreCol` ASC, order-hash, id): easy examples first,
   * with the hash still breaking score ties so equal-difficulty runs
   * stay shuffled. Readers consuming shards in pos order get a
   * per-shard difficulty ramp whose interleaving across shards is the
   * usual curriculum-learning layout. Null scores order LAST (Spark's
   * asc null ordering is nulls-first; unscored docs should not lead the
   * curriculum), null ids drop as in [[shardShuffle]].
   */
  def curriculumShardShuffle(df: DataFrame, idCol: String, scoreCol: String,
      shards: Int, salt: String = "graft"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(!df.columns.contains("shard") && !df.columns.contains("pos") &&
      !df.columns.contains("_h2"),
      "columns shard/pos/_h2 collide with the operator's output — alias them away")
    val w = Window.partitionBy("shard")
      .orderBy(col(scoreCol).asc_nulls_last, col("_h2"), col(idCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("shard", pmod(hash32(col(idCol), salt + ":s"), lit(shards)))
      .withColumn("_h2", hash32(col(idCol), salt + ":o"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h2")
  }

  /**
   * Fixed-token sequence packing over the [[shardShuffle]] order: lay
   * documents end to end within each shard and cut every
   * `targetTokens`, emitting one row per (document, training sequence
   * it occupies) — documents straddle sequence boundaries (the
   * standard pack-and-mask layout, not bin packing: greedy/FFD bin
   * packing is order-dependent across the whole shard and saves
   * nothing once attention masking handles the splits).
   *
   * Output per span: (shard, seq_id, doc_id, tok_start, tok_end) —
   * tok_start/tok_end are the document-local token slice [start, end)
   * for that sequence; every sequence except a shard's last carries
   * exactly `targetTokens` tokens across its spans.
   *
   * Scale shape: one shuffle (shard), ONE per-shard ordered window for
   * the running offset — the shard/order hashes are computed inline
   * rather than via [[shardShuffle]], whose rank column this operator
   * never emits and whose pos-ordered window would force a second
   * identical per-shard sort Catalyst cannot elide — then a pure
   * projection + explode of ceil(n/target)+1 spans max per doc. The
   * token count here is whitespace `size(tokens)`;
   * [[packSequencesCounted]] takes a precomputed tokenizer-count
   * column through the identical plan.
   *
   * Same preconditions as [[shardShuffle]] (non-null unique ids);
   * null-TEXT docs carry no tokens and are excluded explicitly (an
   * empty string still packs: it tokenizes to one empty token).
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      targetTokens: Int, shards: Int, salt: String = "graft"): DataFrame =
    packCounted(df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(TextOps.tokens(col(textCol).cast("string"))).cast("long").as("_n")),
      targetTokens, shards, salt)

  /**
   * [[packSequences]] RESUMED from per-shard token cursors — the
   * incremental form: each shard's running offset starts at that
   * shard's `base` (tokens already packed by earlier batches) instead
   * of 0, so a batch's spans continue exactly where the previous
   * batch's emission stopped — including CONTINUING a partial final
   * sequence (seq_id = base / targetTokens with its in-sequence offset
   * already consumed), the pack-and-mask layout across batch
   * boundaries. With an empty/zero `bases` this IS [[packSequences]]
   * (the law the spec pins); concatenating per-batch emissions equals
   * one packing of the union ordered by (arrival batch, order-hash,
   * id) within each shard — [[IncrementalPipeline]]'s oracle shape.
   *
   * `bases`: (shard, base) with base = Σ tokens previously packed into
   * that shard; shards absent from it start at 0. Shards-sized by
   * contract, so the join broadcasts — the plan stays [[packSequences]]
   * plus one broadcast hash join.
   */
  def packSequencesFrom(df: DataFrame, idCol: String, textCol: String,
      targetTokens: Int, shards: Int, bases: DataFrame,
      salt: String = "graft"): DataFrame =
    packCounted(df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(TextOps.tokens(col(textCol).cast("string"))).cast("long").as("_n")),
      targetTokens, shards, salt,
      Some(bases.select(col("shard").cast("long").as("shard"),
        col("base").cast("long").as("base"))))

  /**
   * [[packSequences]] with a PRECOMPUTED token-count column — the
   * production form: a real tokenizer (BPE etc.) counts upstream, this
   * operator only lays out. The plan from the count on is IDENTICAL to
   * the whitespace variant (both feed the same shard/offset/span
   * pipeline; the whitespace form merely computes its count inline), so
   * swapping tokenizers changes no shuffle, window, or explode shape.
   *
   * Counts must be non-negative (a negative count would corrupt every
   * later running offset in its shard, so it raises inline rather than
   * packing garbage); null-count docs are excluded, mirroring the
   * null-text contract of [[packSequences]]. Zero-count docs still pack
   * one empty span — same as empty text there.
   */
  def packSequencesCounted(df: DataFrame, idCol: String, countCol: String,
      targetTokens: Int, shards: Int, salt: String = "graft"): DataFrame =
    packCounted(df
      .filter(col(idCol).isNotNull && col(countCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        when(col(countCol) >= 0, col(countCol).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"packSequencesCounted: negative token count in '$countCol': "),
            col(countCol).cast("string")))).as("_n")),
      targetTokens, shards, salt)

  /**
   * No-straddle ("greedy next-fit") sequence packing — the layout for
   * trainers WITHOUT cross-document attention masking, where a document
   * must never straddle a sequence boundary: walk the shard in
   * [[shardShuffle]] order keeping a running fill; a doc joins the open
   * sequence iff it fits (fill + n <= targetTokens), otherwise the
   * sequence closes and the doc opens the next one. A doc with
   * n >= targetTokens can never share: it occupies a sequence alone,
   * emitted at full length (the consumer truncates — splitting would
   * reintroduce the straddle this layout exists to avoid). Next-fit
   * rather than best-fit/FFD: the fit decision is a pure function of
   * the walk prefix, so the packing reproduces from (salt, ids) alone,
   * while best-fit's open-bin search couples every placement to global
   * mutable state with no distributed equivalent.
   *
   * Scale shape: one shuffle (repartition by shard — each shard lands
   * whole in one partition), then one sequential per-partition pass
   * (`sortWithinPartitions` + mapPartitions with O(1) state, reset at
   * shard boundaries since a partition may host several shards). The
   * sequential walk is the honest cost of the no-straddle contract:
   * unlike [[packSequences]] the cut points are NOT a closed form of
   * the running token sum, so no window can express them — the oracle
   * needs a recursive CTE for the same reason.
   *
   * Output: (shard, seq_id, doc_id, tok_offset, n_tokens) — seq_id
   * 0-based consecutive per shard, tok_offset = the doc's first token
   * position inside its sequence. Same preconditions as
   * [[packSequences]]: non-null unique ids, null-text docs excluded,
   * empty text packs as one (empty) token.
   */
  def packGreedy(df: DataFrame, idCol: String, textCol: String,
      targetTokens: Int, shards: Int, salt: String = "graft"): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    val counted = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(TextOps.tokens(col(textCol).cast("string"))).cast("long").as("_n"))
      .withColumn("shard", pmod(hash32(col("doc_id"), salt + ":s"), lit(shards)))
      .withColumn("_h2", hash32(col("doc_id"), salt + ":o"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seq_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      counted.schema(counted.schema.fieldIndex("doc_id")),
      org.apache.spark.sql.types.StructField("tok_offset",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false)))
    counted
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("_h2"), col("doc_id"))
      .mapPartitions { rows =>
        var curShard = -1L
        var seq = -1L
        var fill = 0L
        rows.map { r =>
          val sh = r.getLong(2)
          val n = r.getLong(1)
          if (sh != curShard) { curShard = sh; seq = -1L }
          if (seq < 0 || fill + n > targetTokens) { seq += 1; fill = 0L }
          val off = fill
          fill += n
          org.apache.spark.sql.Row(sh, seq, r.get(0), off, n)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** The shared layout pipeline over (doc_id, _n): shard/order hashes,
    * per-shard running offset, span projection + explode. */
  private def packCounted(counted: DataFrame, targetTokens: Int,
      shards: Int, salt: String,
      cursorBases: Option[DataFrame] = None): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    val sharded = counted
      .withColumn("shard", pmod(hash32(col("doc_id"), salt + ":s"), lit(shards)))
      .withColumn("_h2", hash32(col("doc_id"), salt + ":o"))
    val base = cursorBases match {
      case Some(b) => sharded // shards-sized by contract: broadcast
        .join(broadcast(b.select(col("shard"), col("base").as("_base"))),
          Seq("shard"), "left")
        .withColumn("_base", coalesce(col("_base"), lit(0L)))
      case None => sharded.withColumn("_base", lit(0L))
    }
    val w = Window.partitionBy("shard").orderBy(col("_h2"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = base
      .withColumn("_cb", // tokens before this doc (incl. cursor base)
        col("_base") + sum(col("_n")).over(w) - col("_n"))
      .withColumn("seq_id",
        explode(sequence(floor(col("_cb") / targetTokens),
          floor((col("_cb") + greatest(col("_n"), lit(1L)) - 1) / targetTokens))))
    spans.select(
      col("shard"), col("seq_id").cast("long").as("seq_id"), col("doc_id"),
      greatest(col("seq_id") * targetTokens - col("_cb"), lit(0L)).as("tok_start"),
      least((col("seq_id") + 1) * targetTokens - col("_cb"), col("_n")).as("tok_end"))
  }

}
