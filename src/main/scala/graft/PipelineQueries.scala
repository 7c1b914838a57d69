package graft

import graft.llm._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * LLM-training-data pipeline verification queries over the `documents`
 * (doc_id, text, lang, source, n_chars) and `embeddings` (vec_id,
 * embedding float[], label) tables. Each entry routes through the
 * operators in [[graft.llm]]; each has a DuckDB oracle computing the
 * bit-identical result (md5-based hashing and integer-quantized vector
 * math are engine-portable by construction — see TextOps/Similarity
 * scaladoc).
 */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  /** The perturbed embedding corpus shared by pq12 (near-dup pairs) and
   *  pq31 (semantic-dedup clusters) — ONE definition, mirroring the
   *  shared [[EmbNearDupCtes]] oracle string, so the cluster query
   *  provably runs over the exact pair input the pair query pins. */
  private def perturbedEmbCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select("vec_id", "embedding")
    e.unionByName(e.filter(col("vec_id") < 10).select(
      (col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), x => (x.cast("double") * 1.01).cast("float"))
        .as("embedding")))
  }

  private def q(fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame = fn

  /** pq24/pq33's shared fixture: a batch of near-copies of history
    * (one appended token -> dup_of_history), synthetic disjoint texts
    * (-> new) and their second copies (-> dup_in_batch), classified
    * against the full-corpus MinHash index. */
  private def minhashFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docs(s, dir).select("doc_id", "text")
    val index = IncrementalMinHash.buildIndex(d, "doc_id", "text")
    val idstr = col("doc_id").cast("string")
    val freshText = concat(lit("n"), idstr, lit("a n"), idstr,
      lit("b n"), idstr, lit("c n"), idstr, lit("d"))
    val fresh = d.filter(col("doc_id") >= 30 && col("doc_id") < 40)
    val batch = d.filter(col("doc_id") < 30)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" xtra")).as("text"))
      .unionByName(fresh.select((col("doc_id") + 20000).as("doc_id"),
        freshText.as("text")))
      .unionByName(fresh.select((col("doc_id") + 30000).as("doc_id"),
        freshText.as("text")))
    (batch, index)
  }

  /** pq25/pq39's shared (train, eval) fixture: the corpus as training
    * data; an eval set synthesizing all three containment classes from
    * it — full copies (1.0), synthetic disjoint texts (0.0), and copies
    * with novel tokens appended (strictly between). ONE definition so
    * the bloom-prefiltered variant provably answers the exact question
    * the plain variant pins (they share the oracle SQL verbatim). */
  private def decontamFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docs(s, dir).select("doc_id", "text")
    val idstr = col("doc_id").cast("string")
    val freshText = concat(lit("n"), idstr, lit("a n"), idstr, lit("b n"),
      idstr, lit("c n"), idstr, lit("d n"), idstr, lit("e"))
    val eval = d.filter(col("doc_id") < 10)
      .select((col("doc_id") + 50000).as("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") >= 30 && col("doc_id") < 40)
        .select((col("doc_id") + 60000).as("doc_id"), freshText.as("text")))
      .unionByName(d.filter(col("doc_id") >= 10 && col("doc_id") < 20)
        .select((col("doc_id") + 70000).as("doc_id"),
          concat(col("text"), lit(" q"), idstr, lit("a q"), idstr,
            lit("b q"), idstr, lit("c")).as("text")))
    (d, eval)
  }

  /** pq37/pq38's shared fixture: the non-null-text corpus plus injected
    * duplication in both shapes — a 12-token boilerplate tail appended
    * to copies of doc_id < 15 (a cross-doc repeated region) and
    * doc_id in [15, 25) rebuilt as their own first-20-token prefix
    * repeated twice (within-doc repetition). */
  private def substringFixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text").filter(col("text").isNotNull)
    val prefix = array_join(slice(TextOps.tokens(col("text")), 1, 20), " ")
    d.unionByName(d.filter(col("doc_id") < 15).select(
        (col("doc_id") + 80000).as("doc_id"),
        concat(col("text"),
          lit(" b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11")).as("text")))
      .unionByName(d.filter(col("doc_id") >= 15 && col("doc_id") < 25).select(
        (col("doc_id") + 90000).as("doc_id"),
        concat(prefix, lit(" "), prefix).as("text")))
  }

  /** pq40's fixture: multi-line docs (every " a " becomes a newline —
    * the corpus's most frequent word, so line lengths spread across the
    * minTokens boundary) plus injected line duplication: a shared
    * 6-token boilerplate line on copies of doc_id < 12 (cross-doc; the
    * copies also duplicate every eligible line of their base doc) and a
    * 5-token line repeated twice within copies of doc_id in [12, 20). */
  private def lineFixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), replace(col("text"), lit(" a "), lit("\n")).as("text"))
    d.unionByName(d.filter(col("doc_id") < 12).select(
        (col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit("\ndl1 dl2 dl3 dl4 dl5 dl6")).as("text")))
      .unionByName(d.filter(col("doc_id") >= 12 && col("doc_id") < 20).select(
        (col("doc_id") + 110000).as("doc_id"),
        concat(col("text"),
          lit("\nsl1 sl2 sl3 sl4 sl5\nsl1 sl2 sl3 sl4 sl5")).as("text")))
  }

  /** Unique memory-sink names so repeated runs (bench best-of-N sweeps,
   *  verify + bench in one session) never collide on an active query. */
  private val SinkId = new java.util.concurrent.atomic.AtomicLong(0)

  /** The rows that measure Structured Streaming replay (micro-batch
   *  machinery + state store), not batch query execution. Bench splits
   *  the total by this set so the artifact carries comparable
   *  denominators — their oracles are instantaneous batch SQL. */
  val StreamingQueryNames: Set[String] = Set(
    "pq17_streaming_dedup", "pq18_streaming_sessionize", "pq20_streaming_window",
    "pq32_streaming_incremental")

  /** Micro-batch count of each streaming row's LAST run — bench
   *  attribution so the replay floor (micro-batch machinery per batch)
   *  is separable from state-logic time in bench_details: a state-logic
   *  regression shows as seconds moving with batch counts flat. */
  val StreamingBatchCounts =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Drain the replay, record its micro-batch count, always stop.
    * lastProgress.batchId is exact — recentProgress would clamp at
    * numRecentProgressUpdates (100) and silently flatten the count a
    * regression diagnosis depends on. */
  private def drainStream(name: String,
      query: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try {
      query.processAllAvailable()
      StreamingBatchCounts.put(name,
        Option(query.lastProgress).map(_.batchId + 1L).getOrElse(0L))
    } finally query.stop()

  /** A sibling session whose shuffle-partition count right-sizes the
   *  STATE sharding for a keyed streaming query: state partitions are
   *  fixed at query start from `spark.sql.shuffle.partitions`, and each
   *  partition pays per-micro-batch store overhead whether or not it
   *  holds keys — for a stream with a bounded key set (150 users, one
   *  distinct-hash set) 32 shards are mostly empty overhead. Sizing
   *  state shards to key cardinality is the production norm; the batch
   *  queries keep the session default. Two shards suffice for every
   *  replay row here (max ~5k tiny keys, one micro-batch of data work
   *  each) — measured faster than 1, 4, or 8 at sf0.1 because the
   *  per-shard per-batch store overhead, not the keyed data work, is
   *  the binding cost at replay scale. newSession shares the
   *  SparkContext but owns its catalog, so the memory sink also dies
   *  with the throwaway session instead of accreting in the main one. */
  private def streamSession(s: SparkSession, statePartitions: Int): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    s2
  }

  /** Sentinel event-time horizon past max(ts): far enough that the
    * watermark provably passes every session's `end + gap` timeout
    * (gap = 1800 s in pq18) AND every tumbling window's end (1 h in
    * pq20), so ONE replay directory serves every streaming row. */
  private val ReplayHorizonSec = 7200L

  /** Replay directories are immutable once built and identical for every
    * caller on the same input dir (the sentinel horizon is the shared
    * constant above), so they are built once per JVM and reused across
    * queries, bench sweeps, and sessions — the build costs two Spark
    * jobs (max(ts) agg + sentinel write) plus temp-dir IO, which
    * previously recurred per streaming query per sweep. Deleted by a
    * shutdown hook; the files are read-only after build. */
  private val replayDirs = new java.util.concurrent.ConcurrentHashMap[
    String, (java.nio.file.Path, org.apache.spark.sql.types.StructType)]()

  /**
   * Replay of the events table for the streaming rows: the real events
   * file plus one far-future sentinel row [[ReplayHorizonSec]] past
   * max(ts), ingested in ONE micro-batch. The watermark advances at
   * END of batch (from the batch's max event time — the sentinel), so
   * the engine's no-data batch then fires every keyed-state timeout and
   * closes every real window: two total micro-batches instead of the
   * earlier three (maxFilesPerTrigger=1 separated the files into
   * consecutive batches, paying a full extra batch of machinery for
   * watermark semantics the end-of-batch update already provides; the
   * merge is output-identical — measured A/B below the per-query floor
   * work, ~0.5 s/query at sf0.1). The sentinel carries
   * user_id = event_id = -1 and nulls elsewhere, matched to the raw
   * schema BY FIELD NAME. Returns the stream with `ts` already
   * converted nanos -> timestamp (the batch reader's exact conversion,
   * Tables:20).
   */
  private def eventReplay(s: SparkSession, s2: SparkSession, dir: String): DataFrame = {
    val (replay, rawSchema) =
      replayDirs.computeIfAbsent(dir, d => buildReplayDir(s, d))
    // runtime confs don't carry into newSession — the raw file needs the
    // same nanos-as-long read the batch path uses
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s2.readStream.schema(rawSchema).parquet(s"$replay/*.parquet")
    // same type dispatch as the batch reader (Tables:19), plus one
    // streaming-only step: watermarks demand TIMESTAMP (not NTZ), so
    // NTZ files reinterpret in the UTC session zone — value-identical
    // wall-clock times, same instants the batch oracle sees
    rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  private def buildReplayDir(s: SparkSession, dir: String)
      : (java.nio.file.Path, org.apache.spark.sql.types.StructType) = {
    val events = Tables(s, dir, "events") // sets nanosAsLong for raw reads
    // the converted ts surfaces as Timestamp (legacy/with-tz files) or
    // LocalDateTime (TIMESTAMP_NTZ files) — normalize to epoch micros
    val maxTsMicros = events.agg(max(col("ts"))).head().get(0) match {
      case t: java.sql.Timestamp => Math.multiplyExact(t.getTime, 1000L)
      case i: java.time.Instant =>
        Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L
      case l: java.time.LocalDateTime =>
        val i = l.toInstant(java.time.ZoneOffset.UTC)
        Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L
      case other => sys.error(s"unexpected max(ts) value: $other")
    }
    val sentinelMicros = maxTsMicros + ReplayHorizonSec * 1000000L
    // the stream reads the RAW file, so the sentinel file must carry a
    // ts of the raw column's exact type for a uniform stream schema:
    // INT64-nanos long for legacy files, LocalDateTime for NTZ,
    // Timestamp for with-tz
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
    val sentinelTs: Any = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => sentinelMicros * 1000L
      case org.apache.spark.sql.types.TimestampNTZType =>
        java.time.LocalDateTime.ofEpochSecond(sentinelMicros / 1000000L,
          ((sentinelMicros % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case _ => new java.sql.Timestamp(sentinelMicros / 1000L)
    }
    val replay = java.nio.file.Files.createTempDirectory("graft_replay")
    val eventsCopy = replay.resolve("0-events.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "events.parquet"), eventsCopy)
    val sentinelRow = org.apache.spark.sql.Row.fromSeq(rawSchema.fields.map(_.name match {
      case "ts" => sentinelTs
      case "user_id" | "event_id" => -1L
      case _ => null
    }).toSeq)
    val sentDir = replay.resolve("_sentinel")
    s.createDataFrame(java.util.Arrays.asList(sentinelRow), rawSchema)
      .coalesce(1).write.parquet(sentDir.toString)
    val sentList = java.nio.file.Files.list(sentDir)
    val sentPart = try sentList.filter(
      p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      finally sentList.close()
    val sentinelCopy = replay.resolve("1-sentinel.parquet")
    java.nio.file.Files.move(sentPart, sentinelCopy)
    // no mtime staging: both files deliberately land in the same initial
    // micro-batch (see eventReplay) — file order carries no semantics
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(replay).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }))
    (replay, rawSchema)
  }

  /** pq24's full classification SQL — also the `classified` CTE of
    * pq33's recursive chain resolution. */
  private val IncMinhashClassifySql: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
        |batch AS (
        |  SELECT doc_id + 10000 AS doc_id, text || ' xtra' AS text FROM d WHERE doc_id < 30
        |  UNION ALL SELECT doc_id + 20000, 'n' || doc_id || 'a n' || doc_id || 'b n' || doc_id || 'c n' || doc_id || 'd' FROM d WHERE doc_id >= 30 AND doc_id < 40
        |  UNION ALL SELECT doc_id + 30000, 'n' || doc_id || 'a n' || doc_id || 'b n' || doc_id || 'c n' || doc_id || 'd' FROM d WHERE doc_id >= 30 AND doc_id < 40),
        |alld AS (SELECT doc_id, text, 0 AS is_b FROM d UNION ALL SELECT doc_id, text, 1 FROM batch),
        |toks AS (SELECT doc_id, is_b, string_split_regex(trim(text), '\s+') AS t FROM alld),
        |sh AS (SELECT doc_id, is_b, list_distinct(list_transform(range(1, len(t)-1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles FROM toks WHERE len(t) >= 3),
        |sig AS (SELECT doc_id, is_b, list_transform(range(0, 9),
        |          k -> list_min(list_transform(shingles, x -> md5(k::VARCHAR || ':' || x)))) AS mh FROM sh),
        |bands AS (SELECT doc_id, is_b, b, md5(mh[3*b+1] || mh[3*b+2] || mh[3*b+3]) AS band_key
        |          FROM sig, unnest([0, 1, 2]) AS u(b)),
        |hc AS (SELECT DISTINCT b.doc_id AS bid, h.doc_id AS hid
        |       FROM bands b JOIN bands h ON b.band_key = h.band_key AND b.b = h.b
        |        AND b.is_b = 1 AND h.is_b = 0),
        |hv AS (SELECT bid, MIN(hid) AS hist_dup
        |       FROM hc JOIN sig sb ON sb.doc_id = bid AND sb.is_b = 1
        |               JOIN sig s2 ON s2.doc_id = hid AND s2.is_b = 0
        |       WHERE len(list_filter(range(1, 10), i -> sb.mh[i] = s2.mh[i])) >= 5
        |       GROUP BY bid),
        |bc AS (SELECT DISTINCT a.doc_id AS aid, b.doc_id AS bid
        |       FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.b = b.b
        |        AND a.is_b = 1 AND b.is_b = 1 AND a.doc_id < b.doc_id),
        |bv AS (SELECT bid, MIN(aid) AS batch_dup
        |       FROM bc JOIN sig sa ON sa.doc_id = aid AND sa.is_b = 1
        |               JOIN sig sb ON sb.doc_id = bid AND sb.is_b = 1
        |       WHERE len(list_filter(range(1, 10), i -> sa.mh[i] = sb.mh[i])) >= 5
        |       GROUP BY bid)
        |SELECT batch.doc_id,
        |       CASE WHEN hv.hist_dup IS NOT NULL THEN 'dup_of_history'
        |            WHEN bv.batch_dup IS NOT NULL THEN 'dup_in_batch' ELSE 'new' END AS status,
        |       CAST(COALESCE(hv.hist_dup, bv.batch_dup, -1) AS BIGINT) AS dup_of
        |FROM batch LEFT JOIN hv ON hv.bid = batch.doc_id LEFT JOIN bv ON bv.bid = batch.doc_id""".stripMargin

  /** The SimHash signature->banded-candidates->Hamming CTE chain — the
   *  oracle for BOTH pq7b (near-dup pairs) and pq23 (pair clustering):
   *  one string, so the cluster oracle provably builds on the exact
   *  pair set the pair oracle pins. */
  private val SimHashPairCtes: String =
    """toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
      |h AS (SELECT doc_id, md5(w) AS hx FROM toks),
      |wb AS (SELECT doc_id, b,
      |        CASE WHEN ((strpos('0123456789abcdef', substr(hx, 1 + b // 4, 1)) - 1)
      |                   >> (3 - (b % 4))) & 1 = 1 THEN 1 ELSE -1 END AS v
      |       FROM h, unnest(range(0, 64)) AS u(b)),
      |bits AS (SELECT doc_id, b, CASE WHEN SUM(v) > 0 THEN 1 ELSE 0 END AS bit FROM wb GROUP BY doc_id, b),
      |nibs AS (SELECT doc_id, b // 4 AS nib, SUM(bit << (3 - (b % 4))) AS nv FROM bits GROUP BY doc_id, b // 4),
      |sig AS (SELECT doc_id, string_agg(substr('0123456789abcdef', (nv + 1)::INT, 1), '' ORDER BY nib) AS s FROM nibs GROUP BY doc_id),
      |bands AS (SELECT doc_id, i, substr(s, 1 + 4*i, 4) AS chunk, s FROM sig, unnest(range(0, 4)) AS u(i)),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
      |         FROM bands a JOIN bands b ON a.i = b.i AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
      |ham AS (SELECT doc_a, doc_b, CAST(list_sum(list_transform(range(1, 17),
      |          p -> bit_count(xor(strpos('0123456789abcdef', substr(sa, p, 1)) - 1,
      |                             strpos('0123456789abcdef', substr(sb, p, 1)) - 1)))) AS BIGINT) AS hamming
      |        FROM cand)""".stripMargin

  /** The perturbed-corpus bucket/cosine pair CTE chain — the oracle for
   *  BOTH pq12 (near-dup pairs) and pq31 (semantic-dedup clusters): one
   *  string, so the cluster oracle provably builds on the exact pair
   *  set the pair oracle pins. */
  private val EmbNearDupCtes: String =
    """corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.01 AS FLOAT))
      |  FROM embeddings WHERE vec_id < 10),
      |qv AS (SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v FROM corpus),
      |nrm AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2,
      |          array_to_string(list_transform([1, 2, 3, 4], i -> CASE WHEN v[i] > 0 THEN '1' ELSE '0' END), '') AS bkt
      |        FROM qv),
      |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |        list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) AS cos
      |      FROM nrm a JOIN nrm b ON a.bkt = b.bkt AND a.vec_id < b.vec_id)""".stripMargin

  /** Shared containment oracle for pq25 AND pq39 — the bloom variant is
   *  exact by construction, so one string pins both. String shingles
   *  stand in for the operator's fnv64 keys (the pq15 contract). */
  private val DecontamSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |ev AS (
      |  SELECT doc_id + 50000 AS doc_id, text FROM d WHERE doc_id < 10
      |  UNION ALL SELECT doc_id + 60000, 'n'||doc_id||'a n'||doc_id||'b n'||doc_id||'c n'||doc_id||'d n'||doc_id||'e' FROM d WHERE doc_id >= 30 AND doc_id < 40
      |  UNION ALL SELECT doc_id + 70000, text || ' q'||doc_id||'a q'||doc_id||'b q'||doc_id||'c' FROM d WHERE doc_id >= 10 AND doc_id < 20),
      |tt AS (SELECT string_split_regex(trim(text), '\s+') AS t FROM d),
      |tsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(t)-1),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |        FROM tt WHERE len(t) >= 3),
      |et AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM ev),
      |esh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |        FROM et WHERE len(t) >= 3),
      |m AS (SELECT e.doc_id, COUNT(*) AS n_shingles,
      |        CAST(SUM(CASE WHEN t.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      |      FROM esh e LEFT JOIN tsh t USING (s) GROUP BY e.doc_id)
      |SELECT ids.doc_id, COALESCE(n_shingles, 0) AS n_shingles,
      |       COALESCE(n_matched, 0) AS n_matched,
      |       COALESCE(ROUND(n_matched::DOUBLE / n_shingles, 3), 0.0) AS containment
      |FROM (SELECT DISTINCT doc_id FROM ev) ids LEFT JOIN m USING (doc_id)""".stripMargin

  /** pq37/pq38's shared fixture + gram-occurrence CTEs: the injected-
   *  duplication corpus ([[substringFixture]] verbatim), its token
   *  arrays, and one (doc_id, pos, gram) row per 8-gram OCCURRENCE —
   *  1-based start positions, end-exclusive spans downstream. */
  private val SubstringCtes: String =
    """WITH d0 AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |d AS (
      |  SELECT doc_id, text FROM d0
      |  UNION ALL SELECT doc_id + 80000, text || ' b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11' FROM d0 WHERE doc_id < 15
      |  UNION ALL SELECT doc_id + 90000,
      |    array_to_string(string_split_regex(trim(text), '\s+')[1:20], ' ') || ' ' ||
      |    array_to_string(string_split_regex(trim(text), '\s+')[1:20], ' ')
      |  FROM d0 WHERE doc_id >= 15 AND doc_id < 25),
      |tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM d),
      |occ AS (SELECT doc_id, unnest(range(1, len(t) - 6)) AS pos, t FROM tok WHERE len(t) >= 8),
      |g AS (SELECT doc_id, pos,
      |       t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] || ' ' || t[pos+3] || ' ' ||
      |       t[pos+4] || ' ' || t[pos+5] || ' ' || t[pos+6] || ' ' || t[pos+7] AS gram
      |      FROM occ)""".stripMargin

  /** Exact cosine top-5 for queries vec_id < 20 — the oracle for BOTH
   *  pq8 (brute force) and pq19 (full-probe IVF): one string, so the
   *  "IVF with nprobe == nlist equals brute force" pin cannot drift. */
  private val ExactTop5OracleSql: String =
    """WITH qv AS (SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |            FROM embeddings),
      |nrm AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM qv),
      |pairs AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
      |            list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS dot, a.n2 AS na, b.n2 AS nb
      |          FROM nrm a JOIN nrm b ON a.vec_id < 20 AND a.vec_id <> b.vec_id),
      |scored AS (SELECT qid, cid, dot / sqrt(na::DOUBLE * nb::DOUBLE) AS cos,
      |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot / sqrt(na::DOUBLE * nb::DOUBLE) DESC, cid) AS rnk
      |           FROM pairs)
      |SELECT qid, rnk, cid, ROUND(cos, 4) AS cos FROM scored WHERE rnk <= 5""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on content md5 (one shuffle on the hash)
    "pq1_exact_dedup" -> q((s, dir) =>
      ExactDedup(docs(s, dir), "doc_id", "text")),

    // Corpus stats per language: one hash aggregation
    "pq2_text_stats" -> q((s, dir) =>
      TextAnalysis.corpusStats(docs(s, dir), "lang", "n_chars", "text",
        ordered = false)),

    // Per-doc quality metrics: projection only
    "pq3_quality" -> q((s, dir) =>
      TextAnalysis.qualityMetrics(docs(s, dir), "doc_id", "text",
        ordered = false)),

    // Stopword-profile language ID + distribution
    "pq4_langid" -> q((s, dir) =>
      TextAnalysis.langDistribution(docs(s, dir), "text", ordered = false)),

    // Language ID over a corpus with synthetic multi-language rows so the
    // es/de/fr branches and the >=-tie-break are all oracle-exercised
    // (the test corpus alone is single-language).
    "pq4b_langid_multi" -> q((s, dir) => {
      val synth = s.createDataFrame(
        java.util.Arrays.asList(SynthLangRows.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType, nullable = true))))
      TextAnalysis.langDistribution(
        docs(s, dir).select("text").unionByName(synth), "text", ordered = false)
    }),

    // Bottom-4 minwise fingerprint over word bigrams
    "pq5_fingerprint" -> q((s, dir) =>
      TextAnalysis.fingerprints(docs(s, dir), "doc_id", "text",
        ordered = false)),

    // Near-dup pairs: 3-gram shingles -> 9 minhashes -> 3 bands -> bucket
    // join -> exact-Jaccard >= 0.8. Never all-pairs.
    "pq6_minhash_lsh" -> q((s, dir) =>
      MinHashNearDup(docs(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 9, bands = 3, threshold = 0.8,
        ordered = false)),

    // 64-bit SimHash signature per document (projection)
    "pq7_simhash" -> q((s, dir) =>
      SimHashSignatures(docs(s, dir), "doc_id", "text", ordered = false)),

    // SimHash near-dup pairs: banded Hamming join over signature chunks
    // (pigeonhole: distance <= 3 shares one of 4 exact 16-bit chunks)
    "pq7b_simhash_neardup" -> q((s, dir) =>
      SimHashNearDup(docs(s, dir), "doc_id", "text", maxHamming = 3,
        ordered = false)),

    // Pair -> cluster resolution over the pq7b pair set: connected
    // components by min-label propagation, canonical keeper = min id
    // (the oracle computes the same closure with a recursive CTE over
    // the identical pair CTEs)
    "pq23_dup_clusters" -> q((s, dir) =>
      DupClusters(SimHashNearDup(docs(s, dir), "doc_id", "text", maxHamming = 3,
          ordered = false),
        "doc_a", "doc_b")),

    // Brute-force cosine top-5 for queries vec_id < 20 (broadcast queries)
    "pq8_cosine_topk" -> q((s, dir) => {
      val e = embs(s, dir)
      Similarity.cosineTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, ordered = false)
    }),

    // Sign-bucketed ANN top-3 for queries vec_id < 50 (bucket-equality join)
    "pq9_ann_bucketed" -> q((s, dir) => {
      val e = embs(s, dir)
      Similarity.bucketedTopK(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 3, bucketBits = 4, ordered = false)
    }),

    // IVF (learned k-means coarse quantizer) ANN. nprobe == nlist probes
    // every cell, which provably equals brute force — so the pq8-style
    // exact oracle pins the ENTIRE train/assign/probe/join/rank path
    // (any centroid or assignment drift loses candidates and breaks the
    // hash). The recall-vs-nprobe trade is pinned in LlmSpec.
    "pq19_ivf_topk" -> q((s, dir) => {
      val e = embs(s, dir)
      Ivf.topK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 16, ordered = false)
    }),

    // Multimodal metadata path: binary payload size/tag + stub-decode dims
    "pq10_multimodal_meta" -> q((s, dir) =>
      Multimodal.metaColumns(docs(s, dir), "doc_id", "text", ordered = false)),

    // Embedding-cosine near-dup: the corpus plus deterministically
    // perturbed copies of vec_id < 10 (scaled 1.01 in double — cosine
    // ~1.0 survives quantization); the bucket join finds exactly those
    // pairs at threshold 0.99
    "pq12_embedding_neardup" -> q((s, dir) =>
      Similarity.nearDupPairs(perturbedEmbCorpus(s, dir), "vec_id", "embedding",
        threshold = 0.99, bucketBits = 4, ordered = false)),

    // Semantic dedup (SemDeDup-style): the pq12 embedding near-dup
    // pairs resolved to connected components with the min-id keeper —
    // each perturbed copy clusters onto its original; everything else
    // is a singleton and emits no row.
    "pq31_semantic_dedup" -> q((s, dir) =>
      DupClusters(
        Similarity.nearDupPairs(perturbedEmbCorpus(s, dir), "vec_id", "embedding",
          threshold = 0.99, bucketBits = 4, ordered = false),
        "id_a", "id_b")),

    // BPE-ish token-class counts (letters / digits / punctuation)
    "pq13_token_classes" -> q((s, dir) =>
      TextAnalysis.tokenClassCounts(docs(s, dir), "doc_id", "text",
        ordered = false)),

    // MOD-sampled (winnowing-style) rolling fingerprint over bigrams
    "pq14_winnow_fingerprint" -> q((s, dir) =>
      TextAnalysis.winnowFingerprints(docs(s, dir), "doc_id", "text",
        ordered = false)),

    // Exact n-gram Jaccard near-dup via the rare-shingle inverted index
    // (deterministic sibling of pq6's MinHash approximation)
    "pq15_ngram_jaccard" -> q((s, dir) =>
      NgramJaccard(docs(s, dir), "doc_id", "text",
        shingleN = 3, threshold = 0.6, maxDf = 100, ordered = false)),

    // Per-source length-distribution profiling: exact interpolated
    // percentiles (one partial+final agg; at sketch scale swap
    // percentile() for percentile_approx — same plan shape)
    "pq16_percentiles" -> q((s, dir) =>
      docs(s, dir).groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(percentile(col("n_chars"), lit(0.5)), 2).as("p50"),
          round(percentile(col("n_chars"), lit(0.9)), 2).as("p90"),
          round(percentile(col("n_chars"), lit(0.99)), 2).as("p99"))),

    // Multimodal frame sampling: one row per (doc, frame) with the
    // frame's byte-slice md5 — the sampler plumbing over the binary
    // payload (docs are pure ASCII, so the oracle slices the text)
    "pq10b_frame_sample" -> q((s, dir) =>
      Multimodal.frameSample(
        Multimodal.asBinaryPayload(docs(s, dir), "doc_id", "text"),
        "doc_id", "content", ordered = false)),

    // Multimodal resize: deterministic stride downsample of the payload
    // to a 16x16 budget, tagged for post-resize dedup (docs are ASCII so
    // the oracle samples the text characters)
    "pq10c_resize" -> q((s, dir) =>
      Multimodal.resize(
        Multimodal.asBinaryPayload(docs(s, dir), "doc_id", "text"),
        "doc_id", "content", targetW = 16, targetH = 16)),

    // Streaming exact dedup promoted to a driver-visible row: the
    // documents table replayed through the file stream source, deduped
    // with keyed state (flatMapGroupsWithState), drained into a memory
    // sink, returned as a batch DataFrame. Semantics match batch
    // ExactDedup by construction (min id per content hash, see
    // StreamingDedup scaladoc); the single parquet file arrives in one
    // micro-batch, so the oracle's global MIN(doc_id) applies.
    "pq17_streaming_dedup" -> q((s, dir) => {
      val schema = docs(s, dir).schema
      val s2 = streamSession(s, statePartitions = 2) // ~5k distinct hashes
      val stream = s2.readStream.schema(schema)
        // partition-inference wants a directory basePath, and the file
        // source force-overrides it with the path unless the path is a
        // glob — so glob the single file and root inference at the dir
        .option("basePath", dir)
        .parquet(s"$dir/documents.parque[t]")
      val sink = s"pq17_sink_${SinkId.incrementAndGet()}"
      val query = graft.streaming.StreamingDedup(stream, "doc_id", "text")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drainStream("pq17_streaming_dedup", query)
      s2.table(sink)
        .select(col("content_hash"), col("keep_id").cast("bigint").as("keep_id"))
    }),

    // Streaming sessionization promoted to a driver-visible row, paired
    // with the batch vq22 oracle. The events table replays through the
    // file stream source with one far-future sentinel row whose event
    // time pushes the end-of-batch watermark past every real session's
    // `end + gap` timeout, so the engine's no-data batch flushes all
    // open per-user state into the memory sink. ts is truncated to seconds at ingestion: the batch
    // query compares `unix_timestamp` (floor-to-second) diffs, so the
    // streaming millis arithmetic matches it exactly only on truncated
    // times; same-second orderings can't shift session boundaries
    // (diff 0 <= gap). Session ids are re-derived as the per-user rank
    // by session start — the batch query's cumulative numbering.
    "pq18_streaming_sessionize" -> q((s, dir) => {
      val gapSec = 1800L
      val s2 = streamSession(s, statePartitions = 2) // ~150 active users
      // second truncation — see the semantics note above
      val stream = eventReplay(s, s2, dir).select(
        col("user_id"), date_trunc("second", col("ts")).as("ts"))
      val sink = s"pq18_sink_${SinkId.incrementAndGet()}"
      val query = graft.streaming.StreamingSessionize(stream, "user_id", "ts",
        gapSeconds = gapSec, watermark = "0 seconds")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drainStream("pq18_streaming_sessionize", query)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("session_start")
      s2.table(sink).filter(col("user_id") >= 0) // drop the sentinel user
        .withColumn("session_id", row_number().over(w).cast("bigint"))
        .select(col("user_id"), col("session_id"),
          col("n_events"),
          (unix_timestamp(col("session_end")) -
            unix_timestamp(col("session_start"))).as("duration_sec"))
    }),

    // The third streaming member driver-visible: watermarked tumbling-
    // window counts (StreamingExtract.windowedEventCounts) over the
    // same sentinel replay. Append mode emits a window only when the
    // watermark passes its end; the sentinel pushes the watermark past
    // every real window, and its own (far-future, null-typed) window
    // never closes, so exactly the batch GROUP BY comes out. Spark's
    // epoch-aligned 1-hour windows equal date_trunc('hour') buckets.
    "pq20_streaming_window" -> q((s, dir) => {
      val s2 = streamSession(s, statePartitions = 2) // ~5 window keys/batch
      val sink = s"pq20_sink_${SinkId.incrementAndGet()}"
      val query = graft.streaming.StreamingExtract.windowedEventCounts(
        eventReplay(s, s2, dir).select("ts", "event_type", "value"),
        "ts", "event_type", "value",
        windowLength = "1 hour", watermark = "0 seconds")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drainStream("pq20_streaming_window", query)
      s2.table(sink)
    }),

    // Streaming incremental dedup: the documents file replayed through
    // the file stream source and classified against a STATIC
    // content-hash index of doc_id < 250 via a stream-static join —
    // stateless (history lives in the index relation, not the state
    // store). The fourth streaming mechanism made driver-visible
    // (keyed state x2, watermarked windows, stream-static join).
    "pq32_streaming_incremental" -> q((s, dir) => {
      val schema = docs(s, dir).schema
      val s2 = streamSession(s, statePartitions = 2)
      val d2 = Tables(s2, dir, "documents").select("doc_id", "text")
      val index = IncrementalDedup.buildIndex(
        d2.filter(col("doc_id") < 250), "doc_id", "text")
      val stream = s2.readStream.schema(schema)
        .option("basePath", dir)
        .parquet(s"$dir/documents.parque[t]")
      val sink = s"pq32_sink_${SinkId.incrementAndGet()}"
      val query = graft.streaming.StreamingIncremental
        .classify(stream, index, "doc_id", "text")
        .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drainStream("pq32_streaming_incremental", query)
      s2.table(sink)
    }),

    // Incremental exact dedup: a new batch classified against the
    // persisted content-hash index of the full corpus — history is never
    // rescanned. The batch synthesizes all three classes: re-tagged
    // copies of doc_id < 30 (dup_of_history), fresh contents from
    // doc_id 30-39 (new), and a second copy of each fresh content
    // (dup_in_batch). dup_of uses -1 for `new` rows — a null bigint
    // round-trips as NaN-typed float through both engines' pandas
    // bridges and defeats the row compare.
    "pq21_incremental_dedup" -> q((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val index = IncrementalDedup.buildIndex(d, "doc_id", "text")
      val fresh = d.filter(col("doc_id") >= 30 && col("doc_id") < 40)
      val batch = d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        .unionByName(fresh.select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" fresh")).as("text")))
        .unionByName(fresh.select((col("doc_id") + 30000).as("doc_id"),
          concat(col("text"), lit(" fresh")).as("text")))
      IncrementalDedup.classify(batch, index, "doc_id", "text")
        .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
    }),

    // Incremental FUZZY dedup: a new batch classified against the
    // persisted MinHash band/signature index — near-copies of history
    // (one appended token) land dup_of_history via the Jaccard
    // ESTIMATE (equal signature components), synthetic disjoint texts
    // land new, their second copies dup_in_batch. The md5-based
    // minhash makes every estimate engine-portable, so the oracle
    // computes the identical classification.
    "pq24_incremental_minhash" -> q((s, dir) => {
      val (batch, index) = minhashFixture(s, dir)
      IncrementalMinHash.classify(batch, index, "doc_id", "text")
    }),

    // The totality pass over pq24's classification: every dup_of
    // rewritten to an id that survives the run (batch keeper or history
    // keeper). The oracle follows the same chains with a recursive CTE
    // over the classified rows — engine-portable because the
    // classification itself is (pq24).
    "pq33_resolve_keepers" -> q((s, dir) => {
      val (batch, index) = minhashFixture(s, dir)
      IncrementalMinHash.resolveKeepers(
        IncrementalMinHash.classify(batch, index, "doc_id", "text"))
    }),

    // Normalized-exact dedup: ExactDedup over the dedup-normalized text
    // (lowercase, punctuation stripped, whitespace collapsed), so
    // case/punct/spacing variants — synthesized for doc_id < 25 —
    // collapse onto their originals.
    "pq22_normalized_dedup" -> q((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val variants = d.filter(col("doc_id") < 25).select(
        (col("doc_id") + 5000).as("doc_id"),
        concat(upper(col("text")), lit("  !!")).as("text"))
      val corpus = d.unionByName(variants)
        .select(col("doc_id"), TextAnalysis.normalizeForDedup(col("text")).as("norm_text"))
      ExactDedup(corpus, "doc_id", "norm_text")
    }),

    // Train/eval decontamination: shingle containment of an eval set
    // against the full corpus as training data. The eval set synthesizes
    // all three classes from the corpus itself: full copies of
    // doc_id < 10 (containment 1.0), synthetic disjoint texts
    // (containment 0.0), and copies with novel tokens appended
    // (containment strictly between — original shingles all hit, the
    // boundary + novel shingles miss).
    "pq25_decontaminate" -> q((s, dir) => {
      val (train, eval) = decontamFixture(s, dir)
      Decontamination.containment(train, eval, "doc_id", "text",
        shingleN = 3, ordered = false)
    }),

    // Gopher-style repetition gates: duplicate-bigram fraction and
    // dominant-bigram share per document (the synthetic corpus has a
    // small vocabulary, so both metrics are well-populated).
    "pq26_repetition" -> q((s, dir) =>
      TextAnalysis.repetitionMetrics(docs(s, dir), "doc_id", "text",
        ordered = false)),

    // Deterministic stratified sampling: per-source rates keyed on the
    // doc id — membership is a pure function of (salt, key), so both
    // engines select the identical row set (fixed-length lowercase hex
    // compares like the 32-bit value it spells).
    "pq27_stratified_sample" -> q((s, dir) =>
      Sampling.stratifiedSample(docs(s, dir).select("doc_id", "source"),
        "doc_id", "source", rates = Map("src0" -> 0.8, "src1" -> 0.2),
        defaultRate = 0.5, salt = "r10")),

    // Characteristic terms per doc: tf-idf-family weighting with the
    // rational idf (N/df — bit-identical IEEE arithmetic across
    // engines; production swaps in the log form, same plan), ties on
    // the term string, top-3 per doc.
    "pq28_tfidf" -> q((s, dir) =>
      TextAnalysis.tfIdfTopTerms(docs(s, dir), "doc_id", "text",
        k = 3, ordered = false)),

    // Token-window chunking: 16-token chunks with 4-token overlap
    // (stride 12) — every chunk boundary and the short tail are
    // slice-expressible in both engines.
    "pq29_chunking" -> q((s, dir) =>
      TextAnalysis.chunkDocuments(docs(s, dir), "doc_id", "text",
        chunkTokens = 16, overlapTokens = 4, ordered = false)),

    // Deterministic shard-shuffle: the reproducible training-order
    // permutation as (shard, pos) — two independent md5-derived hashes
    // (shard assignment, within-shard order), no global sort. The
    // oracle parses the same 8 hex chars via CAST('0x'||.. AS BIGINT).
    "pq34_shard_shuffle" -> q((s, dir) =>
      Packing.shardShuffle(docs(s, dir).select("doc_id"), "doc_id", shards = 8)
        .select("doc_id", "shard", "pos")),

    // Fixed-token sequence packing over the shard-shuffle order: one
    // row per (doc, training sequence it occupies), with the
    // document-local token slice — documents straddle sequence cuts
    // (pack-and-mask layout).
    "pq35_pack_sequences" -> q((s, dir) =>
      Packing.packSequences(docs(s, dir), "doc_id", "text",
        targetTokens = 256, shards = 4)),

    // Budget-bounded selection: the maximal prefix of the corpus in
    // (n_chars DESC, doc_id) order whose cumulative weight fits 10k —
    // the distributed-prefix-sum plan, never a global window.
    "pq45_budget_select" -> q((s, dir) =>
      BudgetSelect.takeUntilBudget(docs(s, dir).select("doc_id", "n_chars"),
        "doc_id", "n_chars", "n_chars", budget = 10000L)),

    // Deterministic fixed-count per-stratum sample: exactly min(7, n_s)
    // docs per source, selected by smallest (md5 hash, id) — the
    // two-phase prefilter+window plan whose result is provably the
    // same top-k the oracle's full-stratum window computes.
    "pq43_topk_sample" -> q((s, dir) =>
      Sampling.topKPerStratum(docs(s, dir).select("doc_id", "source"),
        "doc_id", "source", k = 7, salt = "s43")),

    // No-straddle next-fit packing: docs never split across sequences;
    // a doc longer than the target occupies a sequence alone. Target 64
    // (vs pq35's 256) so the corpus's 10..99-token docs exercise both
    // the multi-doc fill and the overlong-singleton path. 128 shards:
    // the oracle's recursion depth is the MAX SHARD SIZE (one row per
    // shard per round), so shard count trades oracle latency against
    // docs-per-shard coverage — 128 keeps both (33 multi-doc sequences
    // at sf0.01, ~4 s oracle at sf0.1).
    "pq42_pack_greedy" -> q((s, dir) =>
      Packing.packGreedy(docs(s, dir), "doc_id", "text",
        targetTokens = 64, shards = 128)),

    // Data-mixing rates: per-source sampling rates hitting a target
    // token mixture under a budget (rate = min(1, budget*share/tokens),
    // capped strata flagged) — the step in front of stratifiedSample.
    // src0 is deliberately over-asked (share 0.85 of a budget larger
    // than its tokens) so the cap path is exercised, and src_absent
    // targets a stratum with no corpus rows so the zero-token contract
    // (n_tokens=0, rate=0, capped=true) is exercised too.
    "pq36_mixture_rates" -> q((s, dir) =>
      Sampling.mixtureRates(docs(s, dir), "source", "n_chars",
        Map("src0" -> 0.85, "src1" -> 0.05, "src2" -> 0.05, "src_absent" -> 0.05),
        budgetTokens = 20000L)),

    // Exact duplicated-substring detection (suffix-array dedup at gram
    // resolution): maximal token spans every length-8 window of which
    // repeats somewhere in the corpus. The fixture injects both
    // duplication shapes — a shared boilerplate tail (cross-doc) and
    // prefix-repeated docs (within-doc); the base corpus's small
    // vocabulary contributes whatever natural 8-gram repeats it has,
    // identically in both engines.
    "pq37_substring_spans" -> q((s, dir) =>
      SubstringDedup.duplicatedSpans(substringFixture(s, dir),
        "doc_id", "text", gramN = 8, ordered = false)),

    // Keep-first substring dedup over the same fixture: every duplicated
    // gram occurrence except its globally first (by (doc_id, pos)) is
    // cut, cut windows merge to spans, covered tokens are removed and
    // the survivors re-join — (doc_id, n_tokens, n_removed,
    // cleaned_text) per non-null-text doc.
    "pq38_substring_dedup" -> q((s, dir) =>
      SubstringDedup.removeDuplicated(substringFixture(s, dir),
        "doc_id", "text", gramN = 8, ordered = false)),

    // Incremental line dedup: a batch cleaned against the corpus line
    // index without rescanning history — copies of history docs lose
    // every eligible line (history always wins), fresh one-line docs
    // injected twice dedup keep-first within the batch.
    "pq44_incremental_line_dedup" -> q((s, dir) => {
      val hb = docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), replace(col("text"), lit(" a "), lit("\n")).as("text"))
      val idx = LineDedup.lineIndex(hb, "doc_id", "text")
      val idstr = col("doc_id").cast("string")
      val fresh = concat(lit("f"), idstr, lit("a f"), idstr, lit("b f"), idstr,
        lit("c f"), idstr, lit("d f"), idstr, lit("e"))
      val batch = hb.filter(col("doc_id") < 10)
        .select((col("doc_id") + 200000).as("doc_id"), col("text"))
        .unionByName(hb.filter(col("doc_id") >= 10 && col("doc_id") < 18)
          .select((col("doc_id") + 210000).as("doc_id"), fresh.as("text")))
        .unionByName(hb.filter(col("doc_id") >= 10 && col("doc_id") < 18)
          .select((col("doc_id") + 220000).as("doc_id"), fresh.as("text")))
      LineDedup.dedupLinesIncremental(batch, "doc_id", "text", idx,
        ordered = false)
    }),

    // Composed quality gate (the C4/Gopher filter step): per-doc
    // boolean gates + their conjunction, thresholds chosen to split the
    // corpus on every gate (probed medians); an injected null-text row
    // exercises the fails-everything contract.
    "pq41_quality_gate" -> q((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
        .unionByName(s.range(1).select(lit(990000L).as("doc_id"),
          lit(null).cast("string").as("text")))
      TextAnalysis.qualityGate(d, "doc_id", "text",
        minTokens = 20, maxTokens = 80, minMeanWlen = 3.8, maxMeanWlen = 4.9,
        minStopRatio = 0.04, minTtr = 0.4,
        maxDupBigramFrac = 0.05, maxTopBigramFrac = 0.06, ordered = false)
    }),

    // C4-style line-level dedup: every later occurrence of a repeated
    // >=5-token line is removed corpus-wide (keep-first), short lines
    // always pass through, docs reassemble in position order.
    "pq40_line_dedup" -> q((s, dir) =>
      LineDedup.dedupLines(lineFixture(s, dir), "doc_id", "text",
        sep = "\n", minTokens = 5, ordered = false)),

    // pq25's containment through the Bloom-prefiltered train side: the
    // eval shingle keys build a bloom sketch, the corpus shingle stream
    // is probed before its DISTINCT shuffle, and the exact left join
    // absorbs the sketch's false positives — bit-identical output
    // (shared oracle SQL), shuffle sized by the eval set instead of the
    // corpus.
    "pq39_bloom_decontaminate" -> q((s, dir) => {
      val (train, eval) = decontamFixture(s, dir)
      Decontamination.containmentBloom(train, eval, "doc_id", "text",
        shingleN = 3, ordered = false,
        expectedEvalShingles = 1L << 16, fpp = 0.01)
    }),

    // PII redaction over a corpus with synthesized contamination for
    // doc_id < 20 (email + phone + IPv4 appended); the rest of the
    // corpus is clean word soup and must pass through untouched with
    // n_redactions = 0.
    "pq30_redact" -> q((s, dir) => {
      val contaminated = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") < 20,
          concat(col("text"),
            lit(" contact bob@example.com or 555-123-4567 at 10.0.0.1")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.redactPii(contaminated, "doc_id", "text", ordered = false)
    }),

    // Multimodal decode path: text -> opaque binary payload -> batched
    // per-partition decode (the stub codec) -> typed metadata rows. This
    // executes asBinaryPayload + decodeBatch + decodeOne end-to-end; the
    // deterministic stub arithmetic makes it oracle-checkable.
    "pq11_multimodal_decode" -> q((s, dir) => {
      import s.implicits._
      val media = Multimodal
        .asBinaryPayload(docs(s, dir), "doc_id", "text")
        .as[Multimodal.MediaRow]
      Multimodal.decodeBatch(media).toDF()
        .select(col("doc_id"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          concat_ws(",", col("frame_offsets").cast("array<string>")).as("frame_offsets"))
    })
  )

  /** Synthetic rows covering every language branch of the lang-ID fold:
   *  es/de/fr winners, an all-ones tie (en wins via >=), and an en-loses
   *  tie (es wins via >=). Mirrored verbatim in the pq4b oracle VALUES. */
  val SynthLangRows: Seq[String] = Seq(
    "el la los el la",
    "der die das der",
    "le les une le",
    "the el der le",
    "el der")

  def oracleSql: Map[String, String] = Map(
    "pq1_exact_dedup" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "pq2_text_stats" ->
      """WITH t AS (SELECT lang, n_chars, len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       ROUND(AVG(n_chars), 2) AS avg_chars, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
        |FROM t GROUP BY lang""".stripMargin,

    "pq3_quality" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_types,
        |       ROUND(len(list_distinct(toks))::DOUBLE / len(toks), 3) AS ttr,
        |       ROUND(len(list_filter(toks, w -> w IN ('the', 'a', 'of', 'and', 'in')))::DOUBLE / len(toks), 3) AS stop_ratio,
        |       ROUND(list_sum(list_transform(toks, w -> len(w)))::DOUBLE / len(toks), 3) AS mean_wlen
        |FROM t""".stripMargin,

    "pq4_langid" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |       len(list_filter(toks, w -> w IN ('the', 'a', 'of'))) AS s_en,
        |       len(list_filter(toks, w -> w IN ('el', 'la', 'los'))) AS s_es,
        |       len(list_filter(toks, w -> w IN ('der', 'die', 'das'))) AS s_de,
        |       len(list_filter(toks, w -> w IN ('le', 'les', 'une'))) AS s_fr
        |      FROM t)
        |SELECT CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
        |            WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
        |            WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS predicted_lang,
        |       COUNT(*) AS n FROM s GROUP BY 1""".stripMargin,

    "pq4b_langid_multi" -> {
      val values = SynthLangRows.map(t => s"('${t}')").mkString(", ")
      s"""WITH corpus AS (SELECT text FROM documents UNION ALL SELECT text FROM (VALUES $values) v(text)),
         |t AS (SELECT string_split_regex(trim(text), '\\s+') AS toks FROM corpus),
         |s AS (SELECT
         |       len(list_filter(toks, w -> w IN ('the', 'a', 'of'))) AS s_en,
         |       len(list_filter(toks, w -> w IN ('el', 'la', 'los'))) AS s_es,
         |       len(list_filter(toks, w -> w IN ('der', 'die', 'das'))) AS s_de,
         |       len(list_filter(toks, w -> w IN ('le', 'les', 'une'))) AS s_fr
         |      FROM t)
         |SELECT CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
         |            WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |            WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS predicted_lang,
         |       COUNT(*) AS n FROM s GROUP BY 1""".stripMargin
    },

    "pq5_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS shingles
        |       FROM t WHERE len(toks) >= 2)
        |SELECT doc_id, array_to_string(list_sort(list_transform(shingles, s -> md5(s)))[1:4], ',') AS fingerprint
        |FROM sh""".stripMargin,

    "pq6_minhash_lsh" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles FROM toks WHERE len(t) >= 3),
        |sig AS (SELECT doc_id, shingles, list_transform(range(0, 9),
        |          k -> list_min(list_transform(shingles, s -> md5(k::VARCHAR || ':' || s)))) AS mh FROM sh),
        |bands AS (SELECT doc_id, b, md5(mh[3*b+1] || mh[3*b+2] || mh[3*b+3]) AS band_key
        |          FROM sig, unnest([0, 1, 2]) AS u(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.b = b.b AND a.doc_id < b.doc_id),
        |j AS (SELECT doc_a, doc_b,
        |        len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
        |        (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jac
        |      FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b)
        |SELECT doc_a, doc_b, ROUND(jac, 3) AS jaccard FROM j WHERE jac >= 0.8""".stripMargin,

    "pq7_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
        |h AS (SELECT doc_id, md5(w) AS hx FROM toks),
        |wb AS (SELECT doc_id, b,
        |        CASE WHEN ((strpos('0123456789abcdef', substr(hx, 1 + b // 4, 1)) - 1)
        |                   >> (3 - (b % 4))) & 1 = 1 THEN 1 ELSE -1 END AS v
        |       FROM h, unnest(range(0, 64)) AS u(b)),
        |bits AS (SELECT doc_id, b, CASE WHEN SUM(v) > 0 THEN 1 ELSE 0 END AS bit FROM wb GROUP BY doc_id, b),
        |nibs AS (SELECT doc_id, b // 4 AS nib, SUM(bit << (3 - (b % 4))) AS nv FROM bits GROUP BY doc_id, b // 4)
        |SELECT doc_id, string_agg(substr('0123456789abcdef', (nv + 1)::INT, 1), '' ORDER BY nib) AS simhash
        |FROM nibs GROUP BY doc_id""".stripMargin,

    "pq7b_simhash_neardup" ->
      s"""WITH $SimHashPairCtes
         |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3""".stripMargin,

    // MATERIALIZED pins the pair set to ONE evaluation: DuckDB inlines
    // CTEs referenced from a recursive term, which re-ran the whole
    // SimHash chain every iteration (13.4 s vs 2.0 s measured at sf0.1)
    // — an artificially slow oracle would flatter the Spark ratio
    "pq23_dup_clusters" ->
      s"""WITH RECURSIVE $SimHashPairCtes,
         |p AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
         |e AS (SELECT doc_a AS s, doc_b AS t FROM p UNION SELECT doc_b, doc_a FROM p),
         |reach AS (SELECT s, t FROM e UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
         |SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster_id FROM reach GROUP BY s""".stripMargin,

    "pq8_cosine_topk" -> ExactTop5OracleSql,

    // full-probe IVF == brute force, so the oracle is pq8's exact top-5
    // over the same query set, SHARED so the pin can't drift — see the
    // pq19 entry comment
    "pq19_ivf_topk" -> ExactTop5OracleSql,

    "pq9_ann_bucketed" ->
      """WITH qv AS (SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |            FROM embeddings),
        |nrm AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2,
        |          array_to_string(list_transform([1, 2, 3, 4], i -> CASE WHEN v[i] > 0 THEN '1' ELSE '0' END), '') AS bucket
        |        FROM qv),
        |pairs AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
        |            list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS dot, a.n2 AS na, b.n2 AS nb
        |          FROM nrm a JOIN nrm b ON a.bucket = b.bucket AND a.vec_id < 50 AND a.vec_id <> b.vec_id),
        |scored AS (SELECT qid, cid, dot / sqrt(na::DOUBLE * nb::DOUBLE) AS cos,
        |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot / sqrt(na::DOUBLE * nb::DOUBLE) DESC, cid) AS rnk
        |           FROM pairs)
        |SELECT qid, rnk, cid, ROUND(cos, 4) AS cos FROM scored WHERE rnk <= 3""".stripMargin,

    "pq12_embedding_neardup" ->
      s"""WITH $EmbNearDupCtes
         |SELECT id_a, id_b, ROUND(cos, 4) AS cos FROM p WHERE cos >= 0.99""".stripMargin,

    // MATERIALIZED for the same reason as pq23: DuckDB inlines CTEs
    // referenced from a recursive term, which would re-run the whole
    // bucket/cosine chain per iteration and inflate the oracle
    "pq31_semantic_dedup" ->
      s"""WITH RECURSIVE $EmbNearDupCtes,
         |pr AS MATERIALIZED (SELECT id_a, id_b FROM p WHERE cos >= 0.99),
         |e AS (SELECT id_a AS s, id_b AS t FROM pr UNION SELECT id_b, id_a FROM pr),
         |reach AS (SELECT s, t FROM e UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
         |SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster_id FROM reach GROUP BY s""".stripMargin,

    "pq13_token_classes" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
        |       len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
        |       len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n]')) AS n_punct,
        |       len(regexp_extract_all(text, '[A-Za-z]+')) + len(regexp_extract_all(text, '[0-9]+'))
        |         + len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n]')) AS n_bpeish
        |FROM documents""".stripMargin,

    "pq14_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS shingles
        |       FROM t WHERE len(toks) >= 2)
        |SELECT doc_id,
        |       COALESCE(array_to_string(list_sort(list_filter(list_transform(shingles, s -> md5(s)), h -> h LIKE '0%')), ','), '') AS fingerprint
        |FROM sh""".stripMargin,

    "pq15_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles FROM toks WHERE len(t) >= 3),
        |inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |dfc AS (SELECT s, COUNT(*) AS df FROM inv GROUP BY s),
        |rare AS (SELECT doc_id, i.s FROM inv i JOIN dfc USING (s) WHERE df <= 100),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |          FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b, inter::DOUBLE / (sa.n + sb.n - inter) AS jac
        |      FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
        |                 JOIN sizes sb ON sb.doc_id = doc_b)
        |SELECT doc_a, doc_b, ROUND(jac, 3) AS jaccard FROM j WHERE jac >= 0.6""".stripMargin,

    "pq17_streaming_dedup" ->
      """SELECT md5(text) AS content_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id
        |FROM documents GROUP BY md5(text)""".stripMargin,

    // the MinHash sketch CTEs mirror pq6's (same md5 minhash + banding);
    // verification is the component-match ESTIMATE, as the operator's
    // index carries signatures, not shingle sets
    "pq24_incremental_minhash" -> IncMinhashClassifySql,

    // resolveKeepers as a recursive chain walk over pq24's classified
    // rows: follow dup_in_batch hops (strictly decreasing ids, so the
    // recursion provably terminates); a dup_of_history target ends the
    // chain by adopting its HISTORY keeper; 'new'/history targets end
    // it in place. Exactly the operator's rewrite contract.
    "pq33_resolve_keepers" ->
      s"""WITH RECURSIVE classified AS (
        |$IncMinhashClassifySql
        |),
        |chain AS (
        |  SELECT doc_id, status, dup_of AS cur, status <> 'dup_in_batch' AS done
        |  FROM classified
        |  UNION ALL
        |  SELECT c.doc_id, c.status,
        |         CASE WHEN t.status IN ('dup_in_batch', 'dup_of_history')
        |              THEN t.dup_of ELSE c.cur END,
        |         t.status <> 'dup_in_batch'
        |  FROM chain c JOIN classified t ON t.doc_id = c.cur AND NOT c.done)
        |SELECT doc_id, status, CAST(cur AS BIGINT) AS dup_of
        |FROM chain WHERE done""".stripMargin,


    "pq32_streaming_incremental" ->
      """WITH hist AS (SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id
        |              FROM documents WHERE doc_id < 250 GROUP BY 1)
        |SELECT d.doc_id, md5(d.text) AS content_hash,
        |       CASE WHEN h.keep_id IS NOT NULL THEN 'dup_of_history' ELSE 'new' END AS status,
        |       CAST(COALESCE(h.keep_id, -1) AS BIGINT) AS dup_of
        |FROM documents d LEFT JOIN hist h ON md5(d.text) = h.content_hash""".stripMargin,

    "pq21_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |hist AS (SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id FROM d GROUP BY 1),
        |batch AS (
        |  SELECT doc_id + 10000 AS doc_id, text FROM d WHERE doc_id < 30
        |  UNION ALL SELECT doc_id + 20000, text || ' fresh' FROM d WHERE doc_id >= 30 AND doc_id < 40
        |  UNION ALL SELECT doc_id + 30000, text || ' fresh' FROM d WHERE doc_id >= 30 AND doc_id < 40),
        |h AS (SELECT doc_id, md5(text) AS content_hash,
        |             MIN(doc_id) OVER (PARTITION BY md5(text)) AS batch_keep FROM batch),
        |j AS (SELECT h.doc_id, h.content_hash, h.batch_keep, hist.keep_id AS hist_keep
        |      FROM h LEFT JOIN hist USING (content_hash))
        |SELECT doc_id, content_hash,
        |       CASE WHEN hist_keep IS NOT NULL THEN 'dup_of_history'
        |            WHEN doc_id <> batch_keep THEN 'dup_in_batch' ELSE 'new' END AS status,
        |       CAST(CASE WHEN hist_keep IS NOT NULL THEN hist_keep
        |                 WHEN doc_id <> batch_keep THEN batch_keep ELSE -1 END AS BIGINT) AS dup_of
        |FROM j""".stripMargin,

    "pq22_normalized_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |corpus AS (SELECT doc_id, text FROM d
        |           UNION ALL SELECT doc_id + 5000, upper(text) || '  !!' FROM d WHERE doc_id < 25),
        |n AS (SELECT doc_id,
        |             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')) AS norm
        |      FROM corpus)
        |SELECT md5(norm) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM n GROUP BY 1""".stripMargin,

    // tumbling 1-hour windows are epoch-aligned in Spark, which for
    // whole hours is exactly date_trunc('hour')
    "pq20_streaming_window" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       event_type, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2) AS total
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin,

    // the batch vq22 sessionization oracle, verbatim: the streaming path
    // must produce the identical session set (date_diff('second')
    // counts second boundaries = the second-truncated streaming input)
    "pq18_streaming_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR date_diff('second',
        |                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       date_diff('second', MIN(ts), MAX(ts)) AS duration_sec
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    // string shingles stand in for the operator's fnv64 keys — pure
    // equality semantics, identical counts absent collisions (the same
    // contract pq15's oracle pins)
    "pq25_decontaminate" -> DecontamSql,

    // the bloom pre-filter is exact-by-construction (false positives die
    // in the exact join), so the bloom variant answers the IDENTICAL
    // question — one shared oracle string, like the pq12/pq31 CTE share
    "pq39_bloom_decontaminate" -> DecontamSql,

    // the index is line STRINGS here (standing in for xxhash64 keys —
    // the pq15 contract); history hits cut unconditionally, batch-only
    // lines replay the pq40 keep-first logic
    "pq44_incremental_line_dedup" ->
      """WITH hb AS (SELECT doc_id, replace(text, ' a ', chr(10)) AS text
        |            FROM documents WHERE text IS NOT NULL),
        |hl AS (SELECT DISTINCT line FROM
        |         (SELECT unnest(string_split(text, chr(10))) AS line FROM hb) t
        |       WHERE len(string_split_regex(trim(line), '\s+')) >= 5),
        |bat AS (
        |  SELECT doc_id + 200000 AS doc_id, text FROM hb WHERE doc_id < 10
        |  UNION ALL SELECT doc_id + 210000, 'f'||doc_id||'a f'||doc_id||'b f'||doc_id||'c f'||doc_id||'d f'||doc_id||'e' FROM hb WHERE doc_id >= 10 AND doc_id < 18
        |  UNION ALL SELECT doc_id + 220000, 'f'||doc_id||'a f'||doc_id||'b f'||doc_id||'c f'||doc_id||'d f'||doc_id||'e' FROM hb WHERE doc_id >= 10 AND doc_id < 18),
        |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos FROM bat),
        |e AS (SELECT doc_id, pos, line,
        |             len(string_split_regex(trim(line), '\s+')) >= 5 AS elig FROM l),
        |x AS (SELECT e.doc_id, e.pos, e.line, e.elig,
        |             (hl.line IS NOT NULL) AS hit
        |      FROM e LEFT JOIN hl ON e.elig AND e.line = hl.line),
        |gs AS (SELECT line, COUNT(*) AS cnt, MIN(doc_id * 4294967296 + pos) AS keep
        |       FROM x WHERE elig AND NOT hit GROUP BY line HAVING COUNT(*) > 1),
        |k AS (SELECT x.doc_id, x.pos, x.line, x.hit,
        |             (x.hit OR (gs.cnt IS NOT NULL AND x.doc_id * 4294967296 + x.pos <> gs.keep)) AS cut
        |      FROM x LEFT JOIN gs ON x.elig AND NOT x.hit AND x.line = gs.line)
        |SELECT doc_id, COUNT(*) AS n_lines,
        |       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_removed_history,
        |       CAST(SUM(CASE WHEN cut AND NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS n_removed_batch,
        |       COALESCE(string_agg(CASE WHEN NOT cut THEN line END, chr(10) ORDER BY pos), '')
        |         AS cleaned_text
        |FROM k GROUP BY doc_id""".stripMargin,

    // flags compare RAW IEEE ratios (exact-integer divisions — bit-
    // identical across engines); Kleene AND makes the null-text row
    // fail every gate in both engines
    "pq41_quality_gate" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           UNION ALL SELECT 990000, NULL),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |      FROM d WHERE text IS NOT NULL),
        |m AS (SELECT doc_id, len(toks) AS n,
        |        list_sum(list_transform(toks, w -> len(w)))::DOUBLE / len(toks) AS mw,
        |        len(list_filter(toks, w -> w IN ('the','a','of','and','in')))::DOUBLE / len(toks) AS sr,
        |        len(list_distinct(toks))::DOUBLE / len(toks) AS ttr
        |      FROM t),
        |b AS (SELECT doc_id, list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bgs
        |      FROM t WHERE len(toks) >= 2),
        |u AS (SELECT doc_id, unnest(bgs) AS bg FROM b),
        |c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM u GROUP BY doc_id, bg),
        |s AS (SELECT doc_id, SUM(cnt) AS ng, COUNT(*) AS nd, MAX(cnt) AS top
        |      FROM c GROUP BY doc_id),
        |j AS (SELECT d.doc_id, m.n, m.mw, m.sr, m.ttr,
        |        CASE WHEN s.ng IS NULL THEN NULL ELSE (s.ng - s.nd)::DOUBLE / s.ng END AS dupf,
        |        CASE WHEN s.ng IS NULL THEN NULL ELSE s.top::DOUBLE / s.ng END AS topf
        |      FROM d LEFT JOIN m ON d.doc_id = m.doc_id LEFT JOIN s ON d.doc_id = s.doc_id),
        |f AS (SELECT doc_id, n,
        |        (n IS NOT NULL AND n >= 20 AND n <= 80) AS len_ok,
        |        (mw IS NOT NULL AND mw >= 3.8 AND mw <= 4.9) AS wlen_ok,
        |        (sr IS NOT NULL AND sr >= 0.04) AS stop_ok,
        |        (ttr IS NOT NULL AND ttr >= 0.4) AS ttr_ok,
        |        (n IS NOT NULL AND (dupf IS NULL OR (dupf <= 0.05 AND topf <= 0.06))) AS rep_ok
        |      FROM j)
        |SELECT doc_id, COALESCE(n, 0) AS n_tokens, len_ok, wlen_ok, stop_ok, ttr_ok, rep_ok,
        |       (len_ok AND wlen_ok AND stop_ok AND ttr_ok AND rep_ok) AS pass
        |FROM f""".stripMargin,

    // line strings stand in for the operator's xxhash64 keys (the pq15
    // contract); string_agg skips the CASE's NULLs so only kept lines
    // re-join, in position order like the operator's array_sort
    "pq40_line_dedup" ->
      """WITH b AS (SELECT doc_id, replace(text, ' a ', chr(10)) AS m
        |           FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, m AS text FROM b
        |  UNION ALL SELECT doc_id + 100000, m || chr(10) || 'dl1 dl2 dl3 dl4 dl5 dl6'
        |    FROM b WHERE doc_id < 12
        |  UNION ALL SELECT doc_id + 110000,
        |    m || chr(10) || 'sl1 sl2 sl3 sl4 sl5' || chr(10) || 'sl1 sl2 sl3 sl4 sl5'
        |    FROM b WHERE doc_id >= 12 AND doc_id < 20),
        |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos FROM d),
        |e AS (SELECT doc_id, pos, line,
        |             len(string_split_regex(trim(line), '\s+')) >= 5 AS elig FROM l),
        |gs AS (SELECT line, COUNT(*) AS cnt, MIN(doc_id * 4294967296 + pos) AS keep
        |       FROM e WHERE elig GROUP BY line HAVING COUNT(*) > 1),
        |k AS (SELECT e.doc_id, e.pos, e.line,
        |             (gs.cnt IS NOT NULL AND e.doc_id * 4294967296 + e.pos <> gs.keep) AS cut
        |      FROM e LEFT JOIN gs ON e.elig AND e.line = gs.line)
        |SELECT doc_id, COUNT(*) AS n_lines,
        |       CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |       COALESCE(string_agg(CASE WHEN NOT cut THEN line END, chr(10) ORDER BY pos), '')
        |         AS cleaned_text
        |FROM k GROUP BY doc_id""".stripMargin,

    // gram strings stand in for the operator's per-occurrence fnv64
    // keys (the pq25 contract); islands merge duplicated windows into
    // maximal spans exactly as the operator's doc-keyed window does
    "pq37_substring_spans" ->
      (SubstringCtes +
        """,
        |gs AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
        |dup AS (SELECT g.doc_id, g.pos FROM g JOIN gs USING (gram)),
        |fl AS (SELECT doc_id, pos,
        |         CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) THEN 1 ELSE 0 END AS ni
        |       FROM dup),
        |isl AS (SELECT doc_id, pos, SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS UNBOUNDED PRECEDING) AS island FROM fl)
        |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end,
        |       MAX(pos) + 8 - MIN(pos) AS n_tokens
        |FROM isl GROUP BY doc_id, island""".stripMargin),

    // keep-first removal: the per-gram first occurrence survives via the
    // same doc*2^32+pos packed MIN the operator uses; coverage expansion
    // replaces the islands pass (identical covered-token set)
    "pq38_substring_dedup" ->
      (SubstringCtes +
        """,
        |gs AS (SELECT gram, COUNT(*) AS cnt, MIN(doc_id * 4294967296 + pos) AS keep
        |       FROM g GROUP BY gram),
        |cut AS (SELECT g.doc_id, g.pos FROM g JOIN gs USING (gram)
        |        WHERE cnt > 1 AND g.doc_id * 4294967296 + g.pos <> keep),
        |cov AS (SELECT DISTINCT doc_id, p
        |        FROM (SELECT doc_id, unnest(range(pos, pos + 8)) AS p FROM cut)),
        |tp AS (SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS p FROM tok),
        |kept AS (SELECT tp.doc_id, tp.tok, tp.p FROM tp LEFT JOIN cov
        |           ON tp.doc_id = cov.doc_id AND tp.p = cov.p
        |         WHERE cov.p IS NULL),
        |ka AS (SELECT doc_id, COUNT(*) AS nk, string_agg(tok, ' ' ORDER BY p) AS ct
        |       FROM kept GROUP BY doc_id)
        |SELECT tok.doc_id, len(tok.t) AS n_tokens,
        |       len(tok.t) - COALESCE(ka.nk, 0) AS n_removed,
        |       COALESCE(ka.ct, '') AS cleaned_text
        |FROM tok LEFT JOIN ka ON tok.doc_id = ka.doc_id""".stripMargin),

    "pq26_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bgs
        |      FROM t WHERE len(toks) >= 2),
        |u AS (SELECT doc_id, unnest(bgs) AS bg FROM b),
        |c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM u GROUP BY doc_id, bg),
        |s AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_ngrams,
        |             COUNT(*) AS n_distinct, MAX(cnt) AS top
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_ngrams,
        |       ROUND((n_ngrams - n_distinct)::DOUBLE / n_ngrams, 3) AS dup_ngram_frac,
        |       ROUND(top::DOUBLE / n_ngrams, 3) AS top_ngram_frac
        |FROM s""".stripMargin,

    "pq28_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tt GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, term, tf::DOUBLE * n_docs::DOUBLE / df::DOUBLE AS weight
        |      FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, weight,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY weight DESC, term) AS rnk
        |      FROM s)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, ROUND(weight, 4) AS weight
        |FROM r WHERE rnk <= 3""".stripMargin,

    "pq36_mixture_rates" ->
      """WITH t AS (SELECT source AS stratum,
        |                  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |tgt AS (SELECT * FROM (VALUES ('src0'), ('src1'), ('src2'), ('src_absent')) AS v(stratum)),
        |u AS (SELECT COALESCE(t.stratum, tgt.stratum) AS stratum,
        |             CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens
        |      FROM t FULL OUTER JOIN tgt ON t.stratum = tgt.stratum),
        |w AS (SELECT stratum, n_tokens,
        |             CAST(CASE stratum WHEN 'src0' THEN 0.85
        |                               WHEN 'src1' THEN 0.05
        |                               WHEN 'src2' THEN 0.05
        |                               WHEN 'src_absent' THEN 0.05
        |                               ELSE 0.0 END * 20000 AS DOUBLE) AS want
        |      FROM u)
        |SELECT stratum, n_tokens,
        |       CAST(CASE WHEN n_tokens > 0 THEN ROUND(least(1.0, want / n_tokens), 6)
        |                 ELSE 0.0 END AS DOUBLE) AS rate,
        |       want > n_tokens AS capped
        |FROM w""".stripMargin,

    "pq34_shard_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5('graft:s' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard,
        |         CAST(('0x' || substr(md5('graft:o' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h2
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id, shard,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h2, doc_id) AS BIGINT) AS pos
        |FROM h""".stripMargin,

    "pq35_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |           FROM documents
        |           WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |h AS (SELECT doc_id, n,
        |        CAST(('0x' || substr(md5('graft:s' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS shard,
        |        CAST(('0x' || substr(md5('graft:o' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h2
        |      FROM t),
        |o AS (SELECT doc_id, n, shard,
        |        CAST(SUM(n) OVER (PARTITION BY shard ORDER BY h2, doc_id
        |                          ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS cb
        |      FROM h),
        |s AS (SELECT doc_id, n, shard, cb,
        |        unnest(range(cb // 256, (cb + greatest(n, 1) - 1) // 256 + 1)) AS seq_id
        |      FROM o)
        |SELECT shard, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |       CAST(greatest(seq_id * 256 - cb, 0) AS BIGINT) AS tok_start,
        |       CAST(least((seq_id + 1) * 256 - cb, n) AS BIGINT) AS tok_end
        |FROM s""".stripMargin,

    "pq29_chunking" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id, i AS chunk_idx,
        |             toks[(1 + i*12)::INT : (i*12 + 16)::INT] AS chunk
        |      FROM t, unnest(range(0, (len(toks) - 1) // 12 + 1)) AS u(i))
        |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tokens,
        |       array_to_string(chunk, ' ') AS chunk_text
        |FROM c""".stripMargin,

    // staged counts: each pattern counted on the text as it stands when
    // that pattern runs, mirroring the operator — a match swallowed by
    // an earlier replacement is not double-counted
    "pq30_redact" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id < 20
        |       THEN text || ' contact bob@example.com or 555-123-4567 at 10.0.0.1'
        |       ELSE text END AS text FROM documents),
        |s1 AS (SELECT doc_id, text,
        |         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |       FROM d),
        |s2 AS (SELECT doc_id, text, t1,
        |         regexp_replace(t1, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS t2
        |       FROM s1)
        |SELECT doc_id,
        |  regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted_text,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |     + len(regexp_extract_all(t1, '\b\d{3}-\d{3}-\d{4}\b'))
        |     + len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
        |    AS BIGINT) AS n_redactions
        |FROM s2""".stripMargin,

    "pq27_stratified_sample" -> {
      def pred(rate: Double): String =
        s"substr(md5('r10' || CAST(doc_id AS VARCHAR)), 1, 8) < '${Sampling.thresholdLiteral(rate)}'"
      s"""SELECT doc_id, source FROM documents
         |WHERE CASE WHEN source = 'src0' THEN ${pred(0.8)}
         |           WHEN source = 'src1' THEN ${pred(0.2)}
         |           ELSE ${pred(0.5)} END""".stripMargin
    },

    // the oracle's single global window IS the semantics; the operator
    // computes the same running sum as a two-pass distributed prefix
    // sum (per-partition totals + broadcast offsets)
    "pq45_budget_select" ->
      """WITH s AS (SELECT doc_id, n_chars,
        |        CAST(SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
        |      FROM documents
        |      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL)
        |SELECT doc_id, n_chars, CAST(n_chars AS BIGINT) AS weight, cum_weight
        |FROM s WHERE cum_weight <= 10000""".stripMargin,

    // the oracle ranks the FULL stratum; the operator's prefilter keeps
    // a prefix of the hash order, so both select the identical row set
    "pq43_topk_sample" ->
      """WITH h AS (SELECT doc_id, source,
        |        substr(md5('s43' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
        |      FROM documents WHERE doc_id IS NOT NULL),
        |r AS (SELECT doc_id, source,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY hx, doc_id) AS rn
        |      FROM h)
        |SELECT doc_id, source FROM r WHERE rn <= 7""".stripMargin,

    // next-fit is inherently sequential (each placement depends on the
    // walk prefix), so the oracle advances one row per shard per
    // recursion round — the honest SQL twin of the operator's
    // per-partition walk
    "pq42_pack_greedy" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |       FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |h AS (SELECT doc_id, n,
        |        CAST(('0x' || substr(md5('graft:s' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 128 AS shard,
        |        CAST(('0x' || substr(md5('graft:o' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h2
        |      FROM t),
        |r AS (SELECT doc_id, n, shard,
        |        ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h2, doc_id) AS rn
        |      FROM h),
        |p AS (
        |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS seq_id,
        |         CAST(0 AS BIGINT) AS tok_offset, n AS fill
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.shard, r.rn, r.doc_id, r.n,
        |         CASE WHEN p.fill + r.n <= 64 THEN p.seq_id ELSE p.seq_id + 1 END,
        |         CASE WHEN p.fill + r.n <= 64 THEN p.fill ELSE CAST(0 AS BIGINT) END,
        |         CASE WHEN p.fill + r.n <= 64 THEN p.fill + r.n ELSE r.n END
        |  FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
        |SELECT shard, seq_id, doc_id, tok_offset, n AS n_tokens FROM p""".stripMargin,

    "pq16_percentiles" ->
      """SELECT source, COUNT(*) AS n_docs,
        |       ROUND(quantile_cont(n_chars, 0.5), 2) AS p50,
        |       ROUND(quantile_cont(n_chars, 0.9), 2) AS p90,
        |       ROUND(quantile_cont(n_chars, 0.99), 2) AS p99
        |FROM documents GROUP BY source""".stripMargin,

    "pq10_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_tag,
        |       16 + (octet_length(encode(text)) % 64) AS fake_width,
        |       16 + ((octet_length(encode(text)) // 64) % 64) AS fake_height,
        |       1 + (octet_length(encode(text)) % 7) AS n_frames
        |FROM documents""".stripMargin,

    "pq10b_frame_sample" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n_bytes FROM documents),
        |m AS (SELECT doc_id, text, n_bytes, 1 + (n_bytes % 7) AS n_frames,
        |             n_bytes // (1 + (n_bytes % 7)) AS frame_size
        |      FROM d)
        |SELECT doc_id, i AS frame_idx, i * frame_size AS frame_offset,
        |       md5(substring(text, (i * frame_size + 1)::INT, frame_size::INT)) AS frame_tag
        |FROM m, unnest(range(0, n_frames)) AS u(i)""".stripMargin,

    "pq10c_resize" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n_bytes FROM documents),
        |m AS (SELECT doc_id, text, n_bytes,
        |             greatest(1, (n_bytes + 255) // 256) AS stride FROM d)
        |SELECT doc_id, n_bytes, stride,
        |       md5(array_to_string(list_transform(range(0, (n_bytes + stride - 1) // stride),
        |         i -> substr(text, (1 + i * stride)::INT, 1)), '')) AS resized_tag
        |FROM m""".stripMargin,

    "pq11_multimodal_decode" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
        |m AS (SELECT doc_id, n_bytes,
        |        CAST(16 + (n_bytes % 64) AS BIGINT) AS width,
        |        CAST(16 + ((n_bytes // 64) % 64) AS BIGINT) AS height,
        |        CAST(1 + (n_bytes % 7) AS BIGINT) AS n_frames
        |      FROM d)
        |SELECT doc_id, n_bytes, width, height, n_frames,
        |       array_to_string(list_transform(range(0, n_frames), i -> (i * (n_bytes // n_frames))::VARCHAR), ',') AS frame_offsets
        |FROM m""".stripMargin
  )
}
