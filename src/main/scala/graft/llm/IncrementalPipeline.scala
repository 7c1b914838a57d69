package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The MAINTAINING training-set builder — [[Pipeline.buildTrainingSet]]
 * re-expressed for a corpus that arrives in batches: clean batch N
 * against ALL persisted state, append only batch N's contribution to
 * that state, and emit only batch N's packed sequences. Nothing ever
 * rescans an earlier batch (the reference's orchestration exists for
 * exactly this — ref: wstlr/play.py:79-117 recomputes only what
 * changed; this operator is that idea applied to the flagship chain).
 *
 * Per-batch stages, each O(batch) against eval-/model-sized state:
 *
 *   1-4. NFC normalize → optional HTML strip → heuristic gate →
 *        learned gate: per-doc decisions, shared VERBATIM with the
 *        one-shot builder ([[Pipeline.cleanStage]]/
 *        [[Pipeline.gateStage]]) so the two builders cannot drift;
 *   5.   decontamination against the PERSISTED eval-shingle index
 *        ([[Decontamination.containmentAgainstIndex]]) — a doc's
 *        containment in a fixed eval set depends on nothing but the
 *        doc, so the stage is batch-decomposable by construction; the
 *        bucketed index never re-shingles;
 *   6.   exact dedup against the PERSISTED keeper index
 *        ([[IncrementalDedup.classify]] + in-batch keeper): a batch
 *        doc duplicating ANY earlier batch's keeper drops
 *        (first-arrival-wins across batches, min-id within a batch);
 *        accepted keepers append O(batch)
 *        ([[IndexStore.appendExactKeepers]]);
 *   7.   deterministic hash sample ([[Sampling.hashSample]] — pure
 *        per-doc predicate, trivially incremental);
 *   8.   packing RESUMED from per-shard token cursors
 *        ([[Packing.packSequencesFrom]]): batch N's sequences continue
 *        exactly where batch N-1's stopped, including continuing a
 *        partial final sequence — concatenating the per-batch
 *        emissions equals ONE packing of all emitted docs ordered by
 *        (arrival batch, order-hash, id) within each shard.
 *
 * Two maintained side artifacts per batch, both model-sized:
 *   - the per-shard MIN-K INSPECTION SAMPLE of everything emitted
 *     ([[graft.streaming.StreamingSample.mergeBatch]], stratum =
 *     packing shard via [[Packing.shardOf]] so the sample stratifies
 *     exactly as the training layout does) — after batches B1..Bn it
 *     equals the one-shot sampler over all emitted docs (the
 *     semilattice law);
 *   - the eval contamination ledger
 *     ([[Decontamination.auditBatch]] over the EMITTED docs):
 *     [[Decontamination.containmentState]] reports the residual
 *     sub-threshold eval overlap the training set has accumulated so
 *     far, with no corpus rescan ever.
 *
 * REPLAY: a re-delivered batch finds every one of its contents in the
 * keeper index, classifies them dup_of_history, and emits NOTHING —
 * all five state tables converge to their first-delivery contents
 * (the foreachBatch contract: state converges, downstream sinks that
 * must not observe an empty re-emission dedup on their own ids).
 *
 * ORDERING DISCIPLINE: the emission is eagerly materialized
 * (localCheckpoint) BEFORE any state append, because the append
 * targets are the very tables the emission's plan reads (keeper
 * index, cursors) — the appendExactKeepers discipline.
 *
 * 100 TB shape: every join against state is keyed; the eval index and
 * keeper index are bucketed on their join keys (only batch-derived
 * rows shuffle); the cursor/bases join broadcasts (shards-sized); the
 * only data-scale shuffles are the chain's own (the batch's gate
 * aggregates, shingle projection, dedup keeper aggregate, packing
 * shard exchange) — identical per-byte cost to the one-shot builder
 * over the same bytes, paid once per byte ever.
 */
object IncrementalPipeline {

  private val SaltKey = "graft.pipeline.salt"
  private val TargetKey = "graft.pipeline.targetTokens"
  private val ShardsKey = "graft.pipeline.shards"

  /** The five state locations, derived from one (name, path) root:
    * keeper index, eval-shingle index, matched-shingle ledger,
    * inspection sample, packing cursors. */
  final case class State(baseName: String, basePath: String) {
    def dedupTable: String = baseName + "_dedup"
    def dedupPath: String = basePath + "/dedup"
    def evalTable: String = baseName + "_eval"
    def evalPath: String = basePath + "/eval"
    def matchedTable: String = baseName + "_matched"
    def matchedPath: String = basePath + "/matched"
    def sampleTable: String = baseName + "_sample"
    def samplePath: String = basePath + "/sample"
    def cursorTable: String = baseName + "_cursors"
    def cursorPath: String = basePath + "/cursors"
    def allTables: Seq[String] =
      Seq(dedupTable, evalTable, matchedTable, sampleTable, cursorTable)
  }

  /** Persist the eval set's shingle index for stage 5, cleaned through
    * the SAME stages the corpus goes through (shingle hashes are
    * spelling-sensitive; eval content differing only in normalization
    * or markup would otherwise escape the drop — the one-shot
    * builder's rule, [[Pipeline.buildTrainingSet]]). Overwrites. */
  def saveEvalIndex(eval: DataFrame, idCol: String, textCol: String,
      cfg: Pipeline.Config, st: State, buckets: Int = 32): Unit =
    Decontamination.saveEvalShingleIndex(
      Pipeline.cleanStage(eval, idCol, textCol, cfg), idCol, "text",
      st.evalTable, st.evalPath, cfg.decontamShingleN, buckets)

  /** Drop all five state tables and delete `basePath` — a fresh chain.
    * For fixtures and tests; production state is the point of the
    * operator and outlives every batch. */
  def reset(spark: SparkSession, st: State): Unit = {
    st.allTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(st.basePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /**
   * Process ONE corpus batch through the full chain. Returns batch N's
   * packed sequences — (shard, seq_id, doc_id, tok_start, tok_end),
   * [[Packing.packSequences]]'s schema — eagerly materialized; state
   * tables are updated as a side effect (created under `st` on first
   * use). With a single batch and fresh state this is EXACTLY
   * [[Pipeline.buildTrainingSet]] (the law the spec pins).
   *
   * @param decontaminate stage 5 on/off; when on, the eval index must
   *                      have been saved via [[saveEvalIndex]] (a
   *                      missing index fails fast — silently skipping
   *                      decontamination would ship eval content)
   * @param sampleK       per-shard size of the maintained inspection
   *                      sample (0 disables the side artifact)
   * @param audit         maintain the eval contamination ledger over
   *                      emitted docs (requires the eval index)
   * @param graceMs       swap-retention grace for the cursor and
   *                      sample tables ([[SwapTable]])
   */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      cfg: Pipeline.Config, st: State, decontaminate: Boolean = true,
      sampleK: Int = 16, audit: Boolean = true, buckets: Int = 32,
      graceMs: Long = 0L): DataFrame = {
    val spark = batch.sparkSession
    val gated = Pipeline.gateStage(
      Pipeline.cleanStage(batch, idCol, textCol, cfg), idCol, cfg)
    val decontaminated =
      if (decontaminate) {
        require(spark.catalog.tableExists(st.evalTable),
          s"decontaminate=true but ${st.evalTable} does not exist — " +
            "save it via saveEvalIndex first (skipping silently would " +
            "ship eval content)")
        val dropIds = Decontamination.containmentAgainstIndex(
            gated, idCol, "text", st.evalTable, ordered = false)
          .filter(col("containment") >= cfg.decontamThreshold)
          .select(col("doc_id").as(idCol))
        gated.join(dropIds, Seq(idCol), "left_anti")
      } else gated
    // stage 6: classify against the persisted keeper index; the
    // classified frame is checkpointed because the keeper append below
    // mutates the very table the classify join reads
    val dedupExists = spark.catalog.tableExists(st.dedupTable)
    val classified = (
      if (dedupExists)
        IncrementalDedup.classify(decontaminated,
          IndexStore.exactIndex(spark, st.dedupTable), idCol, "text")
      else
        IncrementalDedup.classify(decontaminated,
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("content_hash",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("keep_id",
                org.apache.spark.sql.types.LongType)))),
          idCol, "text")
      ).localCheckpoint(true)
    val kept = decontaminated.join(
      classified.filter(col("status") === "new")
        .select(col("doc_id").as(idCol)),
      idCol)
    // the emission set is consumed by THREE multi-action consumers
    // (packing, the audit, the sample merge) — checkpoint it once so
    // the gate/containment/classify chain is computed once, not once
    // per downstream action (measured 19 → 8 s at sf0.1 without it;
    // released below once the state appends are done)
    val sampled = Sampling.hashSample(kept, idCol, cfg.sampleRate, cfg.salt)
      .localCheckpoint(true)
    // stage 8: pack from the persisted cursors (zeros on first batch)
    val cursorExists = spark.catalog.tableExists(st.cursorTable)
    val bases =
      if (cursorExists) {
        SwapTable.requireStamps(spark, st.cursorTable, cursorStamps(cfg),
          "IncrementalPipeline cursor")
        spark.table(st.cursorTable)
      } else
        spark.range(0).select(col("id").as("shard"), col("id").as("base"))
    val spans = Packing.packSequencesFrom(sampled, idCol, "text",
        cfg.targetTokens, cfg.shards, bases, cfg.salt)
      .localCheckpoint(true) // materialize BEFORE any state append
    // ---- state appends, all O(batch) ----
    // Ordering: the keeper append goes LAST, because it is the COMMIT
    // POINT — once the batch's hashes are in the index, a replay
    // classifies everything dup_of_history and emits nothing. A crash
    // between the earlier appends and the keeper append therefore
    // replays the WHOLE batch: audit and sample re-converge (their
    // merge laws are idempotent), and the cursor re-advance leaves an
    // unused gap in the packed sequence space (the re-emission starts
    // at the advanced cursor) — benign. The reverse order would
    // instead make that crash window SILENTLY DROP the batch's docs
    // from the training set (keepers known, nothing ever emitted).
    if (audit) {
      require(spark.catalog.tableExists(st.evalTable),
        s"audit=true but ${st.evalTable} does not exist — " +
          "save it via saveEvalIndex first")
      Decontamination.auditBatch(sampled, idCol, "text",
        st.evalTable, st.matchedTable, st.matchedPath)
      ()
    }
    if (sampleK > 0) {
      graft.streaming.StreamingSample.mergeBatch(
        sampled.select(col(idCol),
          Packing.shardOf(col(idCol), cfg.shards, cfg.salt).as("shard")),
        idCol, "shard", sampleK, cfg.salt, st.sampleTable, st.samplePath,
        graceMs)
      ()
    }
    // cursor advance: per-shard token mass of THIS emission (each
    // doc's spans slice [tok_start, tok_end) partition its tokens, so
    // the span sum per shard IS the batch's packed token count there)
    val batchSums = spans.groupBy("shard")
      .agg(sum(col("tok_end") - col("tok_start")).as("_adv"))
    val newBases = bases.join(batchSums, Seq("shard"), "full_outer")
      .select(col("shard").cast("long").as("shard"),
        (coalesce(col("base"), lit(0L)) + coalesce(col("_adv"), lit(0L)))
          .as("base"))
      .localCheckpoint(true) // the upsert swaps the table this plan reads
    SwapTable.upsert(newBases, st.cursorTable, st.cursorPath,
      stamps = cursorStamps(cfg), graceMs = graceMs)
    // the commit point (see ordering note above)
    if (dedupExists) IndexStore.appendExactKeepers(classified, st.dedupTable)
    else IndexStore.saveExact(
      classified.filter(col("status") === "new")
        .select(col("content_hash"), col("doc_id").as("keep_id")),
      st.dedupTable, st.dedupPath, buckets)
    // release the per-batch checkpoints (spans — the returned frame —
    // keeps its own); a long batch loop must not pin one batch-sized
    // RDD pair per call in the block manager
    Seq(sampled, classified)
      .flatMap(graft.CacheScope.checkpointRdd)
      .foreach(_.unpersist(blocking = false))
    spans
  }

  private def cursorStamps(cfg: Pipeline.Config): Seq[(String, String)] = Seq(
    SaltKey -> cfg.salt, TargetKey -> cfg.targetTokens.toString,
    ShardsKey -> cfg.shards.toString)
}
