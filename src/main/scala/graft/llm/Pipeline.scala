package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * The end-to-end training-set builder — the library's stages composed
 * in the order a production corpus refresh runs them:
 *
 *   1. Unicode NFC normalization ([[TextNormalize]]) so hashing sees
 *      one spelling;
 *   2. optional HTML strip ([[TextClean]]) for crawled input;
 *   3. C4/Gopher quality gate ([[TextAnalysis.qualityGate]]);
 *   4. exact dedup keep-first ([[ExactDedup]], keeper semi-join);
 *   5. deterministic hash sample at `sampleRate` ([[Sampling]]);
 *   6. fixed-token sequence packing in deterministic shard order
 *      ([[Packing.packSequences]]).
 *
 * Every stage is individually oracle-pinned (pq63/68/41/1/27/34/35);
 * this composition adds NO new semantics — its spec pins the
 * end-to-end laws (provenance: every emitted sequence traces to a doc
 * that passed each stage computed independently; determinism under
 * partitioning). Each hand-off is keyed on the id column, so the
 * composition introduces only the stages' own shuffles — nothing is
 * collected to the driver at any point.
 */
object Pipeline {

  /** Knobs for [[buildTrainingSet]] — gate thresholds mirror
    * [[TextAnalysis.qualityGate]]'s defaults. */
  final case class Config(
      stripHtml: Boolean = false,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minMeanWlen: Double = 3.0,
      maxMeanWlen: Double = 10.0,
      minStopRatio: Double = 0.01,
      minTtr: Double = 0.2,
      maxDupBigramFrac: Double = 0.3,
      maxTopBigramFrac: Double = 0.2,
      sampleRate: Double = 1.0,
      targetTokens: Int = 1024,
      shards: Int = 64,
      salt: String = "graft")

  /** docs(idCol, textCol) → packed training sequences
    * (shard, seq, doc_id, tok_start, tok_end, ...) in deterministic
    * shard order — [[Packing.packSequences]]'s layout over the cleaned,
    * gated, deduplicated, sampled corpus. */
  def buildTrainingSet(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val base = df.select(col(idCol), col(textCol).cast("string"))
      .filter(col(idCol).isNotNull)
    val normalized = TextNormalize.nfc(base, idCol, textCol, ordered = false)
      .select(col(idCol), col("nfc").as("text"))
    val cleaned =
      if (cfg.stripHtml)
        TextClean.stripHtml(normalized.select(col(idCol), col("text").as("html")),
          idCol, "html", ordered = false)
      else normalized
    val gateIds = TextAnalysis.qualityGate(cleaned, idCol, "text",
        minTokens = cfg.minTokens, maxTokens = cfg.maxTokens,
        minMeanWlen = cfg.minMeanWlen, maxMeanWlen = cfg.maxMeanWlen,
        minStopRatio = cfg.minStopRatio, minTtr = cfg.minTtr,
        maxDupBigramFrac = cfg.maxDupBigramFrac,
        maxTopBigramFrac = cfg.maxTopBigramFrac, ordered = false)
      .filter(col("pass")).select(col("doc_id").as(idCol))
    val gated = cleaned.join(gateIds, idCol)
    val keepers = ExactDedup(gated, idCol, "text")
      .select(col("keep_id").as(idCol))
    val deduped = gated.join(keepers, idCol)
    val sampled = Sampling.hashSample(deduped, idCol, cfg.sampleRate, cfg.salt)
    Packing.packSequences(sampled, idCol, "text", cfg.targetTokens, cfg.shards,
      cfg.salt)
  }
}
