package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Incremental exact dedup: classify a NEW batch of documents against a
 * persisted content-hash index of everything already accepted, without
 * rescanning the historical corpus — the shape a 100 TB training-data
 * pipeline actually runs (history is petabytes on disk; the index is one
 * ~24-byte row per distinct content).
 *
 * Statuses, in precedence order:
 *  - `dup_of_history` — content already in the index (`dup_of` = the
 *    historical keeper's id); "seen once, dropped forever".
 *  - `dup_in_batch`   — unseen content, but another batch row with a
 *    smaller id carries it (`dup_of` = that row's id).
 *  - `new`            — the batch's keeper for an unseen content.
 *
 * Scale shape: the batch's (id, hash) rows cross the wire ONCE — the
 * keeper aggregate sees only map-side-combined distinct hashes, and the
 * keeper join's output keeps the content_hash partitioning the history
 * sort-merge join needs (co-partitioned, AQE-skew-eligible); the index
 * is never broadcast and never rescans the corpus it summarizes.
 * [[mergeIndex]] folds the accepted `new` rows back in for the next
 * run — the same last-wins union-groupBy as the initial build.
 */
object IncrementalDedup {

  /** Null-content sentinel: null texts hash to null, and a null key
    * never survives a plain equi-join — but the dedup contract wants
    * null-text docs treated as ONE content ("no content"), in-batch and
    * across batches. Normalizing null to a non-hex sentinel (md5 hex is
    * 32 lowercase hex chars, so "-" cannot collide) keeps every join a
    * plain equi-join — a null-SAFE join (<=>) would instead normalize
    * the join keys and re-shuffle the batch for the history join,
    * breaking the one-shuffle co-partitioning below. */
  private val NullHash = "-"
  private def contentHash(text: org.apache.spark.sql.Column) =
    coalesce(TextOps.md5Hex(text), lit(NullHash))

  /** The persisted index: (content_hash, keep_id) — exactly
    * [[ExactDedup]]'s output minus the copy count, with null-text
    * contents normalized to the [[NullHash]] sentinel. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ExactDedup(df, idCol, textCol)
      .select(coalesce(col("content_hash"), lit(NullHash)).as("content_hash"),
        col("keep_id"))

  /**
   * Classify `batch` against `index`. Output
   * (doc_id, content_hash, status, dup_of), dup_of null for `new` rows.
   *
   * The in-batch keeper is a KEYED aggregate equi-joined back, never a
   * window over the content_hash partition: a crawl batch can carry
   * millions of copies of one boilerplate document, and a window
   * partition is one task with no map-side combine — the same Zipfian
   * straggler the tf-idf df computation guards against. The aggregate
   * collapses hot hashes before its shuffle and both joins are
   * AQE-skew-eligible.
   *
   * The index must be sentinel-normalized (no null content_hash rows) —
   * every builder in this object emits it that way ([[buildIndex]],
   * [[mergeIndex]], the [[IndexStore]] writers). The history join reads
   * the index column RAW rather than re-coalescing defensively: a
   * normalizing projection is not an alias, so it would discard the
   * hash partitioning a bucketed index scan provides and re-shuffle the
   * terabyte-scale index side every batch — the exact cost the bucketed
   * store exists to remove.
   */
  def classify(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String): DataFrame =
    classifyCore(batch, index, idCol, textCol, keepText = false)

  /** [[classify]] with the batch's text column CARRIED THROUGH — the
    * [[IncrementalPipeline]] fold: the pipeline previously checkpointed
    * the gate/containment chain once for classify and AGAIN for the
    * kept-join that re-attached text; with text on the classified rows
    * one checkpoint serves both (kept = filter status = new, no join).
    * Output (doc_id, text, content_hash, status, dup_of). Same keyed
    * shapes as [[classify]]: the keeper aggregate still shuffles only
    * (hash, id) — Catalyst prunes text below the exchange — and text
    * crosses the wire once in the keeper join, exactly the once the
    * old kept-join paid. */
  private[llm] def classifyWithText(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String): DataFrame =
    classifyCore(batch, index, idCol, textCol, keepText = true)

  /** The shared classify plan (the classifyBandedCore discipline: one
    * core, a flag for the variant — the keeper/status logic must never
    * fork between the public API and the pipeline twin). */
  private def classifyCore(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String, keepText: Boolean): DataFrame = {
    val hashed = batch.select(
      Seq(col(idCol).as("doc_id")) ++
      (if (keepText) Seq(col(textCol).as("text")) else Nil) :+
      // sentinel-normalized (see NullHash): null-text rows keep the
      // one-output-row-per-input-row contract and dedup as one content,
      // in-batch and across batches, through plain equi-joins
      contentHash(col(textCol)).as("content_hash"): _*)
    val keepers = hashed.groupBy("content_hash")
      .agg(min(col("doc_id")).as("_batch_keep"))
    hashed
      .join(keepers, Seq("content_hash"))
      .join(index.select(col("content_hash"), col("keep_id").as("_hist")),
        Seq("content_hash"), "left")
      .select(
        Seq(col("doc_id")) ++
        (if (keepText) Seq(col("text")) else Nil) ++
        Seq(
          col("content_hash"),
          when(col("_hist").isNotNull, lit("dup_of_history"))
            .when(col("doc_id") =!= col("_batch_keep"), lit("dup_in_batch"))
            .otherwise(lit("new")).as("status"),
          when(col("_hist").isNotNull, col("_hist"))
            .when(col("doc_id") =!= col("_batch_keep"), col("_batch_keep"))
            .as("dup_of")): _*)
  }

  /** The next run's index: history plus the batch's accepted keepers.
    * First-wins on the hash — a content already indexed keeps its
    * original keeper id (classified rows for it were dup_of_history,
    * so nothing downstream references the batch id). */
  def mergeIndex(index: DataFrame, classified: DataFrame): DataFrame =
    index.select( // normalize pre-sentinel persisted indexes on the way in
        coalesce(col("content_hash"), lit(NullHash)).as("content_hash"),
        col("keep_id"))
      .unionByName(
        classified.filter(col("status") === "new")
          .select(col("content_hash"), col("doc_id").as("keep_id")))
      .groupBy("content_hash")
      .agg(min(col("keep_id")).as("keep_id"))
}

/**
 * Incremental FUZZY dedup: classify a new batch against a persisted
 * MinHash band/signature index of everything already accepted — the
 * fuzzy sibling of [[IncrementalDedup]], closing the incremental tier
 * of the dedup ladder (exact -> normalized -> fuzzy, each batch vs
 * index). History is never rescanned: the index carries, per accepted
 * doc, its LSH band keys (candidate generation) and its `numHashes`
 * minhash components (verification) — a few hundred bytes per doc
 * regardless of document size, exactly what production near-dup
 * pipelines persist (shingle sets would be corpus-sized; signatures
 * are the sketch).
 *
 * Candidates come from band-key equality (same banding construction as
 * [[MinHashNearDup]]); verification is the standard MinHash ESTIMATE —
 * the count of equal signature components (E[matches/numHashes] =
 * Jaccard), compared against `minMatch`. Exact-Jaccard verification is
 * impossible against an index by design (no shingle sets), which is
 * the honest production trade: the estimate's variance is the price of
 * an O(sketch)-sized history.
 *
 * Statuses and precedence mirror [[IncrementalDedup.classify]]:
 * `dup_of_history` (min matching indexed id), else `dup_in_batch`
 * (min matching smaller batch id), else `new`; `dup_of` = -1 for new
 * rows. Batch docs too short to shingle are `new` by construction.
 *
 * Scale shape: one typed signature pass over the BATCH only; band
 * explode joins are bucket-equality on (band index, band key) — the
 * index side shuffles its band rows, not history text; estimate
 * verification joins signatures for candidate pairs only. One persist
 * of the batch sketch feeds the four plan branches (same discipline as
 * MinHashNearDup's shingle cache).
 */
object IncrementalMinHash {

  /** Typed sketch pass: (_id, _sig, _bands) for rows with >= shingleN
    * tokens; ids cast to long. */
  private def sketch(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("_sig",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true), nullable = true),
      org.apache.spark.sql.types.StructField("_bands",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true), nullable = true)))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
          else {
            val toks = TextOps.tokensJvm(r.getString(1))
            if (toks.length < shingleN) Iterator.empty
            else {
              val shingles = TextOps.shinglesJvm(toks, shingleN)
              val sig = TextOps.minhashSignatureJvm(md, shingles, numHashes)
              org.apache.spark.sql.Row(r.getLong(0), sig,
                TextOps.bandKeysJvm(md, sig, bands, rowsPerBand)) :: Nil
            }
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** The persisted index: (keep_id, sig, bands) per accepted doc. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 9, bands: Int = 3): DataFrame = {
    require(numHashes % bands == 0, s"numHashes ($numHashes) must divide into bands ($bands)")
    sketch(df, idCol, textCol, shingleN, numHashes, bands)
      .select(col("_id").as("keep_id"), col("_sig").as("sig"), col("_bands").as("bands"))
  }

  /** Count of equal signature components — the MinHash Jaccard
    * estimator's numerator. */
  private def matchCount(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  /** Per-row guard that `arr` is exactly `expected` wide: a mismatched
    * index (built with different sketch parameters) would otherwise
    * flow through `zip_with`, which pads the shorter side with nulls and
    * silently under-counts matches — dups would classify as `new`.
    * Evaluates inline in the projection (codegen'd, no extra job). */
  private def widthChecked(arr: Column, expected: Int, what: String): Column =
    when(size(arr) === expected, arr).otherwise(raise_error(concat(
      lit(s"IncrementalMinHash.classify: index $what width "),
      size(arr).cast("string"),
      lit(s" != expected $expected — the index was built with different " +
        "sketch parameters (shingleN/numHashes/bands) than this call; " +
        "rebuild it or pass the parameters it was built with"))))

  /**
   * Classify `batch` against `index`. Output (doc_id, status, dup_of),
   * dup_of = -1 for `new` rows.
   *
   * The index must have been built with the SAME `numHashes`/`bands`
   * as this call: every index row's sketch widths are guarded inline
   * and a mismatch raises rather than silently under-counting matches.
   *
   * `dup_of` for a `dup_in_batch` row is a BATCH-LOCAL reference: the
   * min matching smaller batch id, which may itself be classified
   * `dup_of_history` (or `dup_in_batch` of a yet-smaller row) and then
   * never enters the merged index — MinHash similarity is not
   * transitive, so the row need not also match that row's own keeper.
   * Callers that need every `dup_of` to resolve into the merged index
   * apply [[resolveKeepers]] to the classified batch (opt-in: the
   * chain hops cost extra joins the raw classification doesn't).
   *
   * The batch sketch is cached for the duration of the (lazy) returned
   * plan — it feeds four plan branches. Same contract as
   * [[MinHashNearDup]]'s shingle cache: release between batches via the
   * `scope` handle (or [[graft.CacheScope.releaseSession]]).
   *
   * @param minMatch minimum equal signature components out of
   *                 `numHashes` (estimated Jaccard >= minMatch/numHashes)
   */
  def classify(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 9,
      bands: Int = 3, minMatch: Int = 5,
      scope: graft.CacheScope = graft.CacheScope.session): DataFrame = {
    require(numHashes % bands == 0, s"numHashes ($numHashes) must divide into bands ($bands)")
    classifyBanded(batch,
      bandedIndex(index.select(col("keep_id"),
        widthChecked(col("bands"), bands, "bands").as("bands"), col("sig"))),
      idCol, textCol, shingleN, numHashes, bands, minMatch, scope)
  }

  /** An empty band-exploded index — [[classifyBanded]] against it is
    * pure in-batch near-dup semantics (the one-shot builder's stage
    * 6b, and the maintaining builder's first batch). */
  def emptyBandedIndex(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    // LocalRelation-backed (not emptyRDD): the optimizer can PROVE this
    // empty, so PropagateEmptyRelation deletes the whole history-join
    // arm from the first-batch/one-shot plan instead of scheduling its
    // stages against zero rows
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("band_idx", IntegerType),
        StructField("band_key", StringType),
        StructField("keep_id", LongType),
        StructField("sig", ArrayType(StringType)))))
  }

  /** The band-exploded index shape the bucketed [[IndexStore]] persists:
    * one row per (band position, band key) per accepted doc, with the
    * doc's full signature inline — sig is duplicated `bands`x (a few
    * hundred bytes per doc), the price for verifying candidates without
    * a second index join that would re-shuffle the index by keep_id. */
  def bandedIndex(index: DataFrame): DataFrame =
    index.select(col("keep_id"), col("sig"),
        posexplode(col("bands")).as(Seq("_b", "_bk")))
      .select(col("_b").as("band_idx"), col("_bk").as("band_key"),
        col("keep_id"), col("sig"))

  /**
   * [[classify]] against a band-exploded index
   * (band_idx, band_key, keep_id, sig) — the saved-index fast path.
   * When `banded` is an [[IndexStore]] table bucketed on
   * (band_idx, band_key), the candidate join consumes the scan's own
   * hash partitioning and the terabyte-scale index side runs with ZERO
   * exchange — only batch-derived sides shuffle (pinned in
   * PlanAssertionsSpec). The join keys are plain ALIASES of the bucket
   * columns; the parameter guards run as a partitioning-preserving
   * filter (assert_true) and a non-key projection (sig width), so the
   * scan's partitioning survives to the join.
   *
   * A candidate pair matched by k bands is verified k times (k <=
   * `bands`) instead of paying a distinct shuffle first; the min
   * aggregate dedups.
   */
  def classifyBanded(batch: DataFrame, banded: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 9,
      bands: Int = 3, minMatch: Int = 5,
      scope: graft.CacheScope = graft.CacheScope.session): DataFrame =
    classifyBandedCore(batch, banded, idCol, textCol, shingleN, numHashes,
      bands, minMatch, scope, withSketch = false)

  /**
   * [[classifyBanded]] with the batch's own sketch AND TEXT carried on
   * the output — (doc_id, status, dup_of, <textCol>, _sig, _bands,
   * _self_exact), where doc_id keeps the batch id column's ORIGINAL
   * type, _sig/_bands are null for docs too short to shingle and
   * _self_exact is 1 iff the doc's HISTORY match on its own id was
   * signature-identical (all `numHashes` components equal). Carrying
   * text through (the [[IncrementalDedup.classifyWithText]] fold
   * applied to the fuzzy tier) lets [[IncrementalPipeline]] checkpoint
   * the ACCEPTED rows directly — the old shape re-joined the kept set
   * on the id to re-attach text, one full id exchange pair per batch —
   * and still lets the maintainer append accepted sketches without
   * re-tokenizing. The crash-replay self-match acceptance demands an
   * IDENTICAL signature — a reused id carrying merely near-dup text
   * never slips through as its own keeper.
   */
  private[llm] def classifyBandedSketched(batch: DataFrame, banded: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 9,
      bands: Int = 3, minMatch: Int = 5,
      scope: graft.CacheScope = graft.CacheScope.session): DataFrame =
    classifyBandedCore(batch, banded, idCol, textCol, shingleN, numHashes,
      bands, minMatch, scope, withSketch = true)

  /** TOTAL sketch pass for the sketched (pipeline) variant: one output
    * row PER INPUT ROW — (_oid originally-typed id, _id long,
    * <textCol>, _sig, _bands), with _sig/_bands null when the row
    * cannot sketch (null id, null text, or fewer than shingleN
    * tokens). Carrying the id and text through makes this frame BOTH
    * the classification spine and the text source, deleting the
    * kept-rejoin the caller used to pay. */
  private def sketchTotal(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      df.schema(df.schema.fieldIndex(idCol)).copy(name = "_oid"),
      StructField("_id", LongType, nullable = true),
      StructField(textCol, StringType, nullable = true),
      StructField("_sig", ArrayType(StringType, containsNull = true),
        nullable = true),
      StructField("_bands", ArrayType(StringType, containsNull = true),
        nullable = true)))
    df.select(col(idCol), col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val oid = r.get(0)
          val lid: java.lang.Long =
            if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
          val text = if (r.isNullAt(2)) null else r.getString(2)
          if (lid == null || text == null)
            org.apache.spark.sql.Row(oid, lid, text, null, null)
          else {
            val toks = TextOps.tokensJvm(text)
            if (toks.length < shingleN)
              org.apache.spark.sql.Row(oid, lid, text, null, null)
            else {
              val shingles = TextOps.shinglesJvm(toks, shingleN)
              val sig = TextOps.minhashSignatureJvm(md, shingles, numHashes)
              org.apache.spark.sql.Row(oid, lid, text, sig,
                TextOps.bandKeysJvm(md, sig, bands, rowsPerBand))
            }
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  private def classifyBandedCore(batch: DataFrame, banded: DataFrame,
      idCol: String, textCol: String, shingleN: Int, numHashes: Int,
      bands: Int, minMatch: Int,
      scope: graft.CacheScope, withSketch: Boolean): DataFrame = {
    require(numHashes % bands == 0, s"numHashes ($numHashes) must divide into bands ($bands)")
    // public path: the batch sketch (rows that CAN sketch only) plus a
    // distinct id spine for the one-row-per-id contract. Sketched
    // (pipeline) path: ONE total pass carries (id, text, sketch) per
    // input row — the frame is its own spine, so neither the distinct
    // nor the sketch re-join nor the caller's kept re-join exist.
    val bs = scope.track(
      (if (withSketch)
        sketchTotal(batch, idCol, textCol, shingleN, numHashes, bands)
      else sketch(batch, idCol, textCol, shingleN, numHashes, bands))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the batch band rows carry the signature INLINE (duplicated bands×
    // — the same sketch-sized trade the persisted index makes), so
    // candidate verification needs no signature re-join: the old shape
    // paid a pair distinct plus TWO extra shuffles joining bs back per
    // side; verifying a pair once per matching band instead is free
    // under the min/max aggregates. (posexplode drops null-_bands rows,
    // so the total sketch's unsketchable rows generate no candidates —
    // the same rows the public sketch never emits.)
    val bBand = bs.select(col("_id"), col("_sig"),
      posexplode(col("_bands")).as(Seq("_b", "_bk")))
    val hBand = banded
      // an index built with MORE bands than this call would surface as
      // band positions this batch never probes — matches silently lost;
      // raise instead. assert_true keeps this a Filter (partitioning
      // survives); fewer-bands mismatches are caught by the sig width
      // guard below (numHashes/bands always change together here)
      .filter(assert_true(col("band_idx") < bands,
        lit(s"IncrementalMinHash.classifyBanded: index band_idx >= expected " +
          s"bands ($bands) — the index was built with different sketch " +
          "parameters than this call; rebuild it or pass the parameters " +
          "it was built with")).isNull)
      .select(col("band_idx").as("_b"), col("band_key").as("_bk"),
        col("keep_id"),
        widthChecked(col("sig"), numHashes, "signature").as("sig"))

    // history matches and in-batch matches UNION into ONE keyed
    // aggregate (the old shape paid two groupBy exchanges and two
    // spine joins for what is a single per-doc reduction)
    val histPairs = bBand.join(hBand, Seq("_b", "_bk"))
      .withColumn("_mc", matchCount(col("_sig"), col("sig")))
      .filter(col("_mc") >= minMatch)
      .select(col("_id"), col("keep_id"), col("_mc"),
        lit(true).as("_fromHist"))
    // in-batch pairs from ONE exchange (guide §2.4): the old self-join
    // on (_b,_bk) shuffled the batch band rows TWICE (once per side)
    // and verified candidates through the interpreted HOF matchCount;
    // hash-repartitioning the band rows once and generating verified
    // pairs in-partition keeps the same skew posture (a hot band key
    // lands in one task either way) while the verification runs as a
    // typed JVM loop. Pair semantics identical: every unordered pair
    // of DISTINCT ids sharing a (band position, band key), emitted
    // once per matching band (the min/max aggregates dedup), kept when
    // >= minMatch signature components are equal (null components
    // never count — the zip_with twin); null band keys never join, so
    // they generate nothing here either.
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("keep_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("_mc",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("_fromHist",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    val mm = minMatch
    val batchPairs = bBand
      .repartition(col("_b"), col("_bk"))
      .sortWithinPartitions(col("_b"), col("_bk"))
      .mapPartitions { rows =>
        val it = rows.buffered
        new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
          private var out: Iterator[org.apache.spark.sql.Row] = Iterator.empty
          private def fill(): Unit = {
            while (!out.hasNext && it.hasNext) {
              // skip null band keys (an equi-join key: never matches)
              if (it.head.isNullAt(3)) { it.next(); () }
              else {
                val b = it.head.getInt(2)
                val bk = it.head.getString(3)
                val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
                val sigs = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
                while (it.hasNext && !it.head.isNullAt(3) &&
                    it.head.getInt(2) == b && it.head.getString(3) == bk) {
                  val r = it.next()
                  ids += r.getLong(0)
                  sigs += (if (r.isNullAt(1)) null
                    else r.getSeq[String](1).toArray)
                }
                val buf = scala.collection.mutable.ArrayBuffer
                  .empty[org.apache.spark.sql.Row]
                var i = 0
                while (i < ids.length) {
                  var j = i + 1
                  while (j < ids.length) {
                    val ia = ids(i); val ib = ids(j)
                    if (ia != ib) {
                      val sa = sigs(i); val sb = sigs(j)
                      if (sa != null && sb != null) {
                        var m = 0
                        var p = 0
                        val n = math.min(sa.length, sb.length)
                        while (p < n) {
                          val x = sa(p); val y = sb(p)
                          if (x != null && x == y) m += 1
                          p += 1
                        }
                        if (m >= mm)
                          buf += org.apache.spark.sql.Row(
                            math.max(ia, ib), math.min(ia, ib), 0,
                            false)
                      }
                    }
                    j += 1
                  }
                  i += 1
                }
                out = buf.iterator
              }
            }
          }
          def hasNext: Boolean = { fill(); out.hasNext }
          def next(): org.apache.spark.sql.Row = {
            fill(); out.next()
          }
        }
      }(org.apache.spark.sql.Encoders.row(pairSchema))
    val dups = histPairs.unionByName(batchPairs)
      .groupBy(col("_id"))
      .agg(
        min(when(col("_fromHist"), col("keep_id"))).as("_hist"),
        min(when(!col("_fromHist"), col("keep_id"))).as("_prev"),
        max(when(col("_fromHist") && col("keep_id") === col("_id") &&
          col("_mc") === numHashes, 1).otherwise(0)).as("_selfx"))

    def statusCols(id: Column) = Seq(
      id,
      when(col("_hist").isNotNull, lit("dup_of_history"))
        .when(col("_prev").isNotNull, lit("dup_in_batch"))
        .otherwise(lit("new")).as("status"),
      coalesce(col("_hist"), col("_prev"), lit(-1L)).as("dup_of"))
    if (!withSketch) {
      val spine = batch.select(col(idCol).cast("long").as("doc_id")).distinct()
      spine.join(dups, spine("doc_id") === dups("_id"), "left")
        .select(statusCols(spine("doc_id")): _*)
    } else {
      // the total sketch IS the spine (one row per input row, id and
      // text aboard): one left join against the per-doc match
      // aggregate replaces the old spine join + sketch re-join +
      // the caller's kept re-join
      val d = dups.select(col("_id").as("_did"), col("_hist"),
        col("_prev"), col("_selfx"))
      bs.join(d, bs("_id") === col("_did"), "left")
        .select(statusCols(col("_oid").as("doc_id")) ++ Seq(
          col(textCol), col("_sig"), col("_bands"),
          coalesce(col("_selfx"), lit(0)).as("_self_exact")): _*)
    }
  }

  /**
   * Opt-in totality pass over [[classify]]'s output: rewrite every
   * `dup_of` so it references an id that survives the run — a member of
   * (merged index ∪ batch keepers). A `dup_in_batch` row's batch-local
   * target may itself be `dup_of_history` (then this row's `dup_of`
   * becomes that row's HISTORY keeper) or `dup_in_batch` of a smaller
   * row (then the chain is followed). Statuses are untouched — only
   * the reference is rewritten.
   *
   * Chains strictly decrease the id at every hop (a `dup_in_batch`
   * target is always a smaller batch id), so the loop terminates in at
   * most the longest chain's length; each round is one equi-join of the
   * batch against its own (id -> status, dup_of) map plus an O(1)-row
   * convergence count, with a lazy localCheckpoint cutting plan growth
   * (the [[DupClusters]] discipline). Each round's checkpoint is
   * released as soon as the next round's materializes — a deep chain
   * holds at most TWO batch-sized copies, not rounds x; the final
   * round's (which backs the returned DataFrame) is registered with
   * `scope`. History keeper ids are final by construction, and a
   * `_resolved` flag pins them so a history id that collides with a
   * batch id is never re-chased.
   *
   * @param maxRounds hard cap on chain hops; exceeding it throws
   *                  rather than returning partially resolved refs
   */
  def resolveKeepers(classified: DataFrame, maxRounds: Int = 20,
      scope: graft.CacheScope = graft.CacheScope.session): DataFrame = {
    val targets = classified.select(
      col("doc_id").as("_tid"), col("status").as("_tstatus"),
      col("dup_of").as("_tdup"))
    var cur = classified
      .withColumn("_resolved", col("status") =!= "dup_in_batch")
    // the storage behind cur's checkpoint, once cur IS a checkpoint —
    // never the caller's own plan (round 0 tracks None)
    var curCk: Option[org.apache.spark.rdd.RDD[_]] = None
    var round = 0
    var done = false
    while (!done) {
      val hopped = cur
        .join(targets, col("dup_of") === col("_tid") && !col("_resolved"), "left")
        .select(
          col("doc_id"), col("status"),
          when(!col("_resolved") &&
              col("_tstatus").isin("dup_in_batch", "dup_of_history"),
            col("_tdup")).otherwise(col("dup_of")).as("dup_of"),
          // still unresolved only when the hop landed on another
          // dup_in_batch row: its dup_of is again batch-local
          (col("_resolved") || col("_tstatus").isNull ||
            col("_tstatus") =!= "dup_in_batch").as("_resolved"))
        .localCheckpoint(false)
      val hoppedCk = graft.CacheScope.checkpointRdd(hopped)
      // the convergence probe materializes hopped's checkpoint (the lazy
      // checkpoint completes its missing partitions at job end), after
      // which the PREVIOUS round's storage is unreachable — release it
      val unresolved = hopped.filter(!col("_resolved")).limit(1).count()
      curCk.foreach(_.unpersist(blocking = false))
      curCk = hoppedCk
      cur = hopped
      done = unresolved == 0L
      round += 1
      if (!done && round >= maxRounds) {
        curCk.foreach(_.unpersist(blocking = false))
        sys.error(s"resolveKeepers did not converge in $maxRounds rounds " +
          "— chain longer than the cap; raise maxRounds")
      }
    }
    curCk.foreach(scope.track)
    cur.drop("_resolved")
  }

  /** The next run's index: history plus the sketches of the batch's
    * accepted `new` rows (recomputed on that small subset — the full
    * batch sketch cache is released by then). */
  def mergeIndex(index: DataFrame, batch: DataFrame, classified: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 9,
      bands: Int = 3): DataFrame = {
    // fresh alias for the id: `classified.doc_id` would collide with a
    // batch whose idCol is already named doc_id
    val accepted = batch.join(
      classified.filter(col("status") === "new")
        .select(col("doc_id").as("_accepted_id")),
      batch(idCol).cast("long") === col("_accepted_id")).drop("_accepted_id")
    index.unionByName(buildIndex(accepted, idCol, textCol, shingleN, numHashes, bands))
  }
}
