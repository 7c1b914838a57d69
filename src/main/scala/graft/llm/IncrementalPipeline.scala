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

  /** Release the block-manager storage behind a [[processBatch]]
    * emission once it has been consumed. The returned frame is a
    * localCheckpoint materialized before return (its batch-sized
    * blocks stay pinned in the block manager until released); a loop feeding thousands of
    * batches through one session must call this per batch after
    * writing/collecting the spans — or route everything through one
    * [[graft.CacheScope]] — or storage grows by one emission per call.
    * (Bench/Verify inherit the session scope and are cleaned between
    * queries; a library user looping batches owns this call.) Safe to
    * call twice; after release the frame recomputes from nothing — do
    * not read it again. */
  def releaseEmission(spans: DataFrame): Unit =
    graft.CacheScope.checkpointRdd(spans)
      .foreach(_.unpersist(blocking = false))

  /** The state locations, derived from one (name, path) root:
    * keeper index, eval-shingle index, matched-shingle ledger,
    * inspection sample, packing cursors, plus the two OPTIONAL-stage
    * tables — the MinHash band index (stage 6b) and the eval-embedding
    * index (stage 5b); the optional tables exist only when their
    * stages are used. */
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
    def fuzzyTable: String = baseName + "_fuzzy"
    def fuzzyPath: String = basePath + "/fuzzy"
    def semanticTable: String = baseName + "_semantic"
    def semanticPath: String = basePath + "/semantic"
    def allTables: Seq[String] =
      Seq(dedupTable, evalTable, matchedTable, sampleTable, cursorTable,
        fuzzyTable, semanticTable)
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

  /** Persist the eval set's EMBEDDING index for the semantic gate
    * (stage 5b) — [[Decontamination.saveEvalEmbeddingIndex]] under the
    * state root. Overwrites. `bucketBits` > 0 is the sign-bucket LSH
    * arm; the stamp makes a drifted reader refuse. */
  def saveEvalEmbeddings(eval: DataFrame, idCol: String, vecCol: String,
      st: State, bucketBits: Int = 0, graceMs: Long = 0L): Long =
    Decontamination.saveEvalEmbeddingIndex(eval, idCol, vecCol,
      st.semanticTable, st.semanticPath, bucketBits, graceMs)

  /** Drop all state tables and delete `basePath` — a fresh chain.
    * For fixtures and tests; production state is the point of the
    * operator and outlives every batch. */
  def reset(spark: SparkSession, st: State): Unit = {
    st.allTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(st.basePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Drop only the CORPUS-derived state (keeper index, matched ledger,
    * sample, cursors, fuzzy band index) and keep the eval-derived
    * tables (shingle index, embedding index) — a fresh corpus run
    * against the same benchmark set. The eval artifacts are pure
    * functions of the eval fixture, so re-runs (and bench
    * re-executions) skip their rebuild. */
  def resetCorpusState(spark: SparkSession, st: State): Unit = {
    val corpus = Seq(
      st.dedupTable -> st.dedupPath, st.matchedTable -> st.matchedPath,
      st.sampleTable -> st.samplePath, st.cursorTable -> st.cursorPath,
      st.fuzzyTable -> st.fuzzyPath)
    val hadoopConf = spark.sessionState.newHadoopConf()
    corpus.foreach { case (t, path) =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(hadoopConf)
      if (fs.exists(p)) { fs.delete(p, true); () }
      // swap generations live beside the base path (path-v<n>)
      val parent = p.getParent
      if (parent != null && fs.exists(parent)) {
        fs.globStatus(new org.apache.hadoop.fs.Path(path + "-v*"))
          .foreach(g => fs.delete(g.getPath, true))
      }
    }
  }

  /**
   * Process ONE corpus batch through the full chain. Returns batch N's
   * packed sequences — (shard, seq_id, doc_id, tok_start, tok_end),
   * [[Packing.packSequences]]'s schema — eagerly materialized; state
   * tables are updated as a side effect (created under `st` on first
   * use). With a single batch and fresh state this is EXACTLY
   * [[Pipeline.buildTrainingSet]] (the law the spec pins).
   *
   * PRECONDITION: ids are unique WITHIN the batch (the same contract
   * [[Packing]] imposes on everything it packs — duplicate ids have no
   * stable pack order, and the fuzzy tier's internal joins assume one
   * row per id). Cross-batch reuse of an id is handled (exact dups
   * drop; near-dup text under a reused id drops at the fuzzy tier).
   *
   * The returned frame's checkpoint storage belongs to the CALLER:
   * consume it, then [[releaseEmission]] — a long-running batch loop
   * that never releases pins one emission-sized block set per call
   * (the per-batch INTERNAL checkpoints are always released before
   * returning; only the emission outlives the call, by design).
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
   * @param batchEmbeddings stage 5b — SEMANTIC decontamination: this
   *                      batch's per-doc embeddings (idCol + `vecCol`);
   *                      docs whose argmax cosine against the PERSISTED
   *                      eval-embedding index ([[saveEvalEmbeddings]])
   *                      reaches `cfg.semanticTau` drop before dedup.
   *                      A doc with no embedding row passes (no
   *                      evidence). Like stage 5, the gate is a pure
   *                      per-doc function of the fixed index — batch-
   *                      decomposable by construction. None skips the
   *                      stage (bit-identical to the pre-stage chain).
   *
   * `cfg.fuzzyDedup` enables stage 6b — MinHash near-dup dedup against
   * the PERSISTED band index (created under `st` on first use): an
   * exact-new doc near-duplicating ANY earlier accepted doc (or a
   * smaller-id doc in this batch) drops; accepted docs' banded
   * sketches append O(batch). A `dup_of_history` hit whose keeper is
   * the doc ITSELF is accepted (self-matches only arise when a crash
   * between the fuzzy append and the exact commit point replays the
   * batch — treating them as dups would silently drop the whole
   * replayed batch; a genuinely-new doc can never self-match because
   * its sketch enters the index only on acceptance). Off ≡ today's
   * chain bit-for-bit.
   */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      cfg: Pipeline.Config, st: State, decontaminate: Boolean = true,
      sampleK: Int = 16, audit: Boolean = true, buckets: Int = 32,
      graceMs: Long = 0L, batchEmbeddings: Option[DataFrame] = None,
      vecCol: String = "embedding"): DataFrame = {
    val spark = batch.sparkSession
    // the gated batch feeds THREE plan branches inside the
    // decontamination checkpoint below (the containment aggregate, its
    // per-doc spine, and the anti-join spine) and physical plans
    // re-execute shared subtrees per branch — persist so the per-doc
    // text work (NFC, tokenize, classifier fold) runs once per batch;
    // released as soon as the checkpoint materializes (try/finally: a
    // failure before then — a missing state table, a job abort — must
    // not leak the cached batch into the block manager, or a caller's
    // replay-the-batch retry loop grows storage per failure)
    val gated = Pipeline.gateStage(
      Pipeline.cleanStage(batch, idCol, textCol, cfg), idCol, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try processBatchFrom(gated, batch.sparkSession, idCol, cfg, st,
      decontaminate, sampleK, audit, buckets, graceMs, batchEmbeddings,
      vecCol)
    finally gated.unpersist(blocking = false)
  }

  private def processBatchFrom(gated: DataFrame,
      spark0: SparkSession, idCol: String,
      cfg: Pipeline.Config, st: State, decontaminate: Boolean,
      sampleK: Int, audit: Boolean, buckets: Int,
      graceMs: Long, batchEmbeddings: Option[DataFrame],
      vecCol: String): DataFrame = {
    val spark = spark0
    val shingleDecontaminated =
      if (decontaminate) {
        require(spark.catalog.tableExists(st.evalTable),
          s"decontaminate=true but ${st.evalTable} does not exist — " +
            "save it via saveEvalIndex first (skipping silently would " +
            "ship eval content)")
        // broadcast-filter drop when the threshold can never catch a
        // shingle-less doc (threshold > 0): the eval index's distinct
        // shingle KEYS are eval-sized by contract, so they collect once
        // per batch (one bucketed-scan job) and the drop runs as a pure
        // map-side filter — no batch-shingle exchange, no per-doc
        // aggregate, no id anti-join (guide §2.4/§3.1; decisions
        // bit-identical — see containmentFilterWithKeys). The
        // threshold-0 edge keeps the full per-doc form.
        if (cfg.decontamThreshold > 0)
          Decontamination.containmentFilterAgainstIndex(
            gated, "text", st.evalTable, cfg.decontamThreshold)
        else {
          val dropIds = Decontamination.containmentAgainstIndex(
              gated, idCol, "text", st.evalTable, ordered = false)
            .filter(col("containment") >= cfg.decontamThreshold)
            .select(col("doc_id").as(idCol))
          gated.join(dropIds, Seq(idCol), "left_anti")
        }
      } else gated
    // stage 5b: semantic gate against the persisted eval-embedding
    // index — zero shuffle (broadcast argmax) + one id anti-join
    val decontaminatedLazy = batchEmbeddings match {
      case Some(embs) =>
        require(spark.catalog.tableExists(st.semanticTable),
          s"batchEmbeddings passed but ${st.semanticTable} does not exist " +
            "— save it via saveEvalEmbeddings first (skipping silently " +
            "would ship paraphrased eval content)")
        val dropIds = Decontamination.semanticFlagsAgainstIndex(
            embs, idCol, vecCol, st.semanticTable, cfg.semanticTau,
            ordered = false)
          .select(col(idCol))
        shingleDecontaminated.join(dropIds, Seq(idCol), "left_anti")
      case None => shingleDecontaminated
    }
    // stage 6: classify against the persisted keeper index, with the
    // text CARRIED THROUGH the classification — ONE checkpoint then
    // serves as the gate/containment materialization, the keeper-append
    // input, and (as a pure filter, no join) the kept set. The old
    // shape paid two sequential full-batch materializations here
    // (decontaminated, then classified) plus a kept-join per consumer.
    // Checkpointed because the keeper append below mutates the very
    // table the classify join reads.
    val dedupExists = spark.catalog.tableExists(st.dedupTable)
    val classified = (
      if (dedupExists)
        IncrementalDedup.classifyWithText(decontaminatedLazy,
          IndexStore.exactIndex(spark, st.dedupTable), idCol, "text")
      else
        // LocalRelation-backed empty index: provably empty, so the
        // optimizer deletes the history left-join from the first
        // batch's plan (nulls projected directly)
        IncrementalDedup.classifyWithText(decontaminatedLazy,
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("content_hash",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("keep_id",
                org.apache.spark.sql.types.LongType)))),
          idCol, "text")
      ).transform(c => labeled(spark, "classify ckpt")(c.localCheckpoint(true)))
    gated.unpersist(blocking = false) // checkpoint holds the data now
    // kept = a FILTER over the classify checkpoint (no join): its
    // consumers (the fuzzy sketch pass, the emission chain) re-run only
    // the filter against materialized storage
    val kept = classified.filter(col("status") === "new")
      .select(col("doc_id").as(idCol), col("text"))
    // stage 6b: fuzzy (MinHash) tier against the persisted band index;
    // the SKETCHED classification carries each doc's (sig, bands), so
    // the ACCEPTED join (status + sketch riding along) is the one frame
    // both the sketch append and the emission chain need — checkpoint
    // THAT, not the raw classification: one materialization serves the
    // append (which mutates the very band table the classify plan
    // reads) and the packing chain, with no separate classification
    // checkpoint and no second kept-join.
    // Self-match acceptance (see the crash-replay note above) is
    // tightened to SIGNATURE-IDENTICAL matches: a replayed batch
    // re-sketches the same text, so all components equal; a REUSED id
    // carrying merely near-dup text matches fewer than all components
    // and is dropped like any other near-dup (the unique-id contract
    // no longer load-bearing for correctness).
    val fuzzyState: Option[(DataFrame, Boolean)] =
      if (!cfg.fuzzyDedup) None
      else {
        val fuzzyExists = spark.catalog.tableExists(st.fuzzyTable)
        val banded =
          if (fuzzyExists) IndexStore.minhashIndex(spark, st.fuzzyTable,
            cfg.fuzzyShingleN, cfg.fuzzyNumHashes, cfg.fuzzyBands)
          else IncrementalMinHash.emptyBandedIndex(spark)
        val fuzzyScope = new graft.CacheScope
        val fk = try labeled(spark, "fuzzy kept ckpt") {
          // the sketched classification carries (id, text) through
          // (the classifyWithText fold applied to the fuzzy tier), so
          // the accepted set is a pure FILTER over it — the old shape
          // re-joined `kept` on the id to re-attach text, one full id
          // exchange pair per batch. The isNotNull guard mirrors the
          // old join's null-id semantics exactly (null ids never
          // joined; cleanStage drops them anyway).
          val cls = IncrementalMinHash.classifyBandedSketched(kept, banded,
            idCol, "text", cfg.fuzzyShingleN, cfg.fuzzyNumHashes,
            cfg.fuzzyBands, cfg.fuzzyMinMatch, scope = fuzzyScope)
          cls.filter(col("doc_id").isNotNull && (col("status") === "new" ||
            (col("status") === "dup_of_history" &&
              col("dup_of") === col("doc_id") && col("_self_exact") === 1)))
            .select(col("doc_id").as(idCol), col("text"), col("status"),
              col("_sig"), col("_bands"))
            .localCheckpoint(true)
        } finally fuzzyScope.release() // sketch cache dies with the ckpt
        Some((fk, fuzzyExists))
      }
    val fuzzyKept = fuzzyState match {
      case Some((fk, _)) => fk.select(col(idCol), col("text"))
      case None => kept
    }
    if (audit) require(spark.catalog.tableExists(st.evalTable),
      s"audit=true but ${st.evalTable} does not exist — " +
        "save it via saveEvalIndex first")
    // the emission set is consumed by packing plus, when enabled, the
    // audit and the sample merge — multi-action consumers. It is
    // checkpointed ONLY when the audit/sample side artifacts will read
    // it (otherwise packing is its sole consumer and the spans
    // checkpoint below materializes the chain once); the LAZY
    // checkpoint + count fold materializes it and answers the
    // empty-emission probe in ONE job (the auditBatch discipline),
    // where an eager checkpoint + isEmpty paid two.
    val needSampled = audit || sampleK > 0
    val sampledLazy = Sampling.hashSample(fuzzyKept, idCol, cfg.sampleRate, cfg.salt)
    val sampled =
      if (needSampled) sampledLazy.localCheckpoint(false) else sampledLazy
    val emptySample =
      if (needSampled) labeled(spark, "sampled ckpt+count")(sampled.count()) == 0L
      else false
    // stage 8: pack from the persisted cursors (zeros on first batch)
    val cursorExists = spark.catalog.tableExists(st.cursorTable)
    val bases =
      if (cursorExists) {
        SwapTable.requireStamps(spark, st.cursorTable, cursorStamps(cfg),
          "IncrementalPipeline cursor")
        spark.table(st.cursorTable)
      } else
        spark.range(0).select(col("id").as("shard"), col("id").as("base"))
    // lazy checkpoint + count: materializes BEFORE any state append
    // (the ordering discipline) and folds the empty-emission probe into
    // the materializing job
    val spans = Packing.packSequencesFrom(sampled, idCol, "text",
        cfg.targetTokens, cfg.shards, bases, cfg.salt)
      .localCheckpoint(false)
    val emptyEmission =
      labeled(spark, "spans ckpt+count")(spans.count()) == 0L
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
    // an empty emission contributes nothing to the ledger or the
    // sample — skip their jobs and catalog round-trips (the replay
    // path: every table already converged). The sample table is still
    // CREATED on a first empty batch so later readers find a stamped
    // table; the matched ledger is created lazily by design (first hit).
    // The side-state updates below touch DISJOINT tables and read only
    // materialized checkpoints, so they run CONCURRENTLY on the
    // dedicated [[stateEc]] pool (Spark schedules jobs from separate
    // threads freely; each maintainer stays single-writer on ITS
    // table). All of them join before the keeper append — the commit
    // point stays last. The concurrency buys back the per-action
    // scheduling latency that dominates these model-sized updates
    // (~1.5 s/batch at sf0.1).
    import scala.concurrent.Await
    val auditF = stateUpdate(labeled(spark, "audit") {
      if (audit && !emptySample) {
        Decontamination.auditBatch(sampled, idCol, "text",
          st.evalTable, st.matchedTable, st.matchedPath)
        ()
      }
    })
    val mergeF = stateUpdate(labeled(spark, "sample merge") {
      if (sampleK > 0 &&
          (!emptySample || !spark.catalog.tableExists(st.sampleTable))) {
        graft.streaming.StreamingSample.mergeBatch(
          sampled.select(col(idCol),
            Packing.shardOf(col(idCol), cfg.shards, cfg.salt).as("shard")),
          idCol, "shard", sampleK, cfg.salt, st.sampleTable, st.samplePath,
          graceMs)
        ()
      }
    })
    // cursor advance: per-shard token mass of THIS emission (each
    // doc's spans slice [tok_start, tok_end) partition its tokens, so
    // the span sum per shard IS the batch's packed token count there).
    // An EMPTY emission advances nothing — skip the full_outer action
    // and the swap entirely (the replay path then costs zero cursor
    // jobs), except on the very first batch, which must still CREATE
    // the stamped table for the drift guard.
    val cursorF = stateUpdate(labeled(spark, "cursor advance") {
      if (!emptyEmission || !cursorExists) {
        val batchSums = spans.groupBy("shard")
          .agg(sum(col("tok_end") - col("tok_start")).as("_adv"))
        val newBases = bases.join(batchSums, Seq("shard"), "full_outer")
          .select(col("shard").cast("long").as("shard"),
            (coalesce(col("base"), lit(0L)) + coalesce(col("_adv"), lit(0L)))
              .as("base"))
        // no checkpoint: the upsert writes the new generation to a
        // fresh sibling BEFORE the swap, so this plan's read of the
        // current cursor table stays valid through the write (the
        // SwapTable contract) — the former eager ckpt was one extra
        // shards-sized job per batch
        SwapTable.upsert(newBases, st.cursorTable, st.cursorPath,
          stamps = cursorStamps(cfg), graceMs = graceMs)
        ()
      }
    })
    // fuzzy sketch append BEFORE the exact commit point: a crash in
    // between replays the batch, whose accepted docs then self-match
    // (accepted — see the stage-6b note); the reverse order would let
    // a crash skip the sketches forever (exact index says
    // dup_of_history, fuzzy stage never sees the docs again). Joins
    // the same pre-commit barrier as the other three (disjoint table,
    // checkpointed inputs).
    val fuzzyF = stateUpdate(labeled(spark, "fuzzy sketch append") {
      fuzzyState.foreach { case (fk, existed) =>
        // the checkpointed accepted frame carries each doc's
        // (status, sig, bands), so both arms write sketches directly —
        // no second tokenize/hash pass over the accepted docs' text
        val cls = fk.select(col(idCol).as("doc_id"), col("status"),
          col("_sig"), col("_bands"))
        if (existed)
          IndexStore.appendMinhashSketched(cls, st.fuzzyTable,
            cfg.fuzzyShingleN, cfg.fuzzyNumHashes, cfg.fuzzyBands)
        else
          IndexStore.saveMinhash(
            cls.filter(col("status") === "new" && col("_sig").isNotNull)
              .select(col("doc_id").as("keep_id"), col("_sig").as("sig"),
                col("_bands").as("bands")),
            st.fuzzyTable, st.fuzzyPath, buckets, cfg.fuzzyShingleN,
            cfg.fuzzyNumHashes, cfg.fuzzyBands)
      }
    })
    // join ALL four before propagating any failure: rethrowing on the
    // first failed future would leave the others still mutating their
    // tables in the background while the caller already retries the
    // batch — two concurrent upserts on one cursor table is exactly
    // the corruption the single-writer contract exists to prevent.
    // Each await is bounded purely defensively: stateUpdate completes
    // its promise on EVERY Throwable (fatal included), so a wedged
    // await would require a hang inside Spark itself.
    val joined = Seq("audit" -> auditF, "sample" -> mergeF,
      "cursor" -> cursorF, "fuzzy" -> fuzzyF).map { case (what, f) =>
        what -> scala.util.Try(Await.result(f,
          scala.concurrent.duration.Duration(1, "day")))
      }
    joined.collectFirst { case (what, scala.util.Failure(e)) =>
      throw new RuntimeException(
        s"processBatch: the $what state update failed (all state " +
          "updates have been joined; replay the batch — state " +
          "converges by the merge laws)", e)
    }
    // the commit point (see ordering note above)
    labeled(spark, "keeper append (commit)") {
      if (dedupExists) IndexStore.appendExactKeepers(classified, st.dedupTable)
      else IndexStore.saveExact(
        classified.filter(col("status") === "new")
          .select(col("content_hash"), col("doc_id").as("keep_id")),
        st.dedupTable, st.dedupPath, buckets)
    }
    // release the per-batch checkpoints (spans — the returned frame —
    // keeps its own); a long batch loop must not pin one batch-sized
    // RDD pair per call in the block manager
    ((if (needSampled) Seq(sampled) else Nil) ++
        Seq(classified) ++
        fuzzyState.toSeq.map { case (fk, _) => fk })
      .flatMap(graft.CacheScope.checkpointRdd)
      .foreach(_.unpersist(blocking = false))
    spans
  }

  /** Dedicated pool for [[processBatch]]'s concurrent side-state
    * updates: four daemon threads (the maximum in flight per call), so
    * a caller saturating the global ExecutionContext with its own work
    * cannot serialize the "concurrent" updates — and each update runs
    * inside a Promise completed on EVERY Throwable (scala.concurrent's
    * Future only catches NonFatal, so a fatal error — an executor OOM
    * surfacing on the await — would otherwise never complete the
    * promise and stall the join for its full bound). */
  private lazy val stateEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r,
              s"graft-pipeline-state-${n.incrementAndGet()}")
            t.setDaemon(true)
            t
          }
        }))

  /** Thread-local job label around an action (guide §1.5) — restores
    * the previous description so the caller's labeling survives. */
  private def labeled[T](spark: org.apache.spark.sql.SparkSession,
      what: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"pipeline: $what")
    try body finally sc.setJobDescription(prev)
  }

  private def stateUpdate(body: => Unit): scala.concurrent.Future[Unit] = {
    val p = scala.concurrent.Promise[Unit]()
    stateEc.execute(() => p.complete(
      try { body; scala.util.Success(()) }
      catch { case t: Throwable => scala.util.Failure(t) }))
    p.future
  }

  private def cursorStamps(cfg: Pipeline.Config): Seq[(String, String)] = Seq(
    SaltKey -> cfg.salt, TargetKey -> cfg.targetTokens.toString,
    ShardsKey -> cfg.shards.toString)
}
