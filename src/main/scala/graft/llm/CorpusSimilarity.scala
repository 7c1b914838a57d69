package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Source-to-source corpus similarity via bottom-k sketches (Broder
 * 1997; Cohen & Kaplan 2007) — "how much does crawl A overlap crawl B"
 * without an A×B shingle join: each source keeps only its k smallest
 * distinct shingle hashes, and for any pair the Jaccard of the full
 * shingle sets is estimated from those two k-row sketches alone with
 * ~1/sqrt(k) error. The per-doc [[TextOps.bottomKSketch]] fingerprints
 * one document; this is the corpus-level form.
 *
 * Spark shape: one distinct over (source, md5-hex shingle key) — the
 * 32-char hex key is the engine-portable pinning choice (hex string
 * order == value order, computable verbatim in the oracle); a
 * production corpus whose distinct-shingle count makes the 4× key
 * width matter swaps in [[TextOps.shingleIndex]]'s 8-byte fnv64 keys,
 * same plan — then a bottom-k rank window PARTITIONED BY SOURCE whose
 * per-task sort is bounded by Spark's rank-limit pushdown
 * (`WindowGroupLimit`, the [[TextAnalysis.frequentTerms]] precedent);
 * output is k rows per source. The pairwise estimate runs on the
 * collected sketches — sources·k rows, model-sized by construction
 * (the [[CountMin.collect]] contract), never the corpus.
 *
 * Estimator: for the k smallest hashes of S_A ∪ S_B (computed from the
 * two sketches — exact, because the union's bottom-k is a subset of
 * the sketches' union), J(A, B) ≈ |{h in that bottom-k seen by BOTH
 * sides}| / k. Exact when either source has fewer than k distinct
 * shingles.
 */
object CorpusSimilarity {

  /** (source, h): the k smallest distinct md5-hex shingle keys per
    * source. Null sources form their own group; null texts and docs
    * shorter than shingleN tokens contribute nothing. */
  def sourceSketches(df: DataFrame, sourceCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 256, ordered: Boolean = true): DataFrame = {
    require(k > 0, s"sourceSketches: k must be positive, got $k")
    // typed shingle+md5 pass (one MessageDigest per partition): the
    // Column-tier transform/concat/md5 chain evaluates interpreted
    // (higher-order functions get no codegen) and measured ~8x slower
    // at sf0.1 — the SimHashSignatures/shingleIndex justification
    val in = df.select(col(sourceCol).as("source"), col(textCol).cast("string"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      in.schema("source"),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val hashes = in.mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          if (r.isNullAt(1)) Iterator.empty
          else {
            val toks = TextOps.tokensJvm(r.getString(1))
            if (toks.length < shingleN) Iterator.empty
            else TextOps.shinglesJvm(toks, shingleN).iterator
              .map(g => org.apache.spark.sql.Row(r.get(0), TextOps.md5HexJvm(md, g)))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("h").asc)
    hashes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select("source", "h")
      .transform(Presented(_, ordered, "source", "h"))
  }

  /** Pairwise Jaccard estimates from collected sketches:
    * (source_a, source_b, jaccard_est) for every unordered pair,
    * source_a < source_b (null sources excluded from the report). */
  def similarityReport(sketches: DataFrame, k: Int): Seq[(String, String, Double)] = {
    val bySource = sketches
      .select(col("source").cast("string"), col("h")) // non-string group keys welcome
      .collect()
      .filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val sources = bySource.keys.toSeq.sorted
    for {
      (a, i) <- sources.zipWithIndex
      b <- sources.drop(i + 1)
    } yield {
      val sa = bySource(a)
      val sb = bySource(b)
      val union = (sa ++ sb).distinct.sorted.take(k)
      val inA = sa.toSet
      val inB = sb.toSet
      val both = union.count(h => inA.contains(h) && inB.contains(h))
      (a, b, both.toDouble / union.length)
    }
  }
}
