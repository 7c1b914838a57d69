package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * DSIR-style data selection — importance resampling over hashed n-gram
 * features (Xie et al. 2023, "Data Selection for Language Models via
 * Importance Resampling"): fit bag-of-hashed-ngrams distributions over
 * a TARGET corpus (what you want more of) and the RAW corpus (what you
 * have), weight every raw document by its log-likelihood ratio, and
 * resample with deterministic Gumbel-top-k noise so selection is
 * importance-weighted rather than greedy.
 *
 * Scale shape: features never leave their row — each document's bucket
 * counts are folded locally in one typed pass; the only shuffled rows
 * are per-PARTITION bucket partials (≤ buckets * numPartitions) for the
 * two global distributions, which collect to a `buckets`-bounded driver
 * array and broadcast back as a log-ratio lookup. Weighting is then a
 * second shuffle-free pass. Nothing corpus-sized is cached, collected
 * or joined. Selection's global top-k is a TakeOrdered (per-partition
 * heads + driver merge), never a full sort exchange.
 *
 * Portability: buckets are `u32(md5(salt ':' gram)) % buckets` — the
 * same md5-hex trick as [[Packing]]/[[Sampling]], so DuckDB reproduces
 * them exactly (pq50 pins the distribution in exact integers; pq51
 * pins per-document weights to 4 decimals, the [[Similarity]] float
 * precedent). Grams are word n-grams counted PER OCCURRENCE (DSIR's
 * bag model), not the distinct-shingle sets dedup uses.
 */
object Dsir {

  /** u32 bucket of one gram — JVM twin of the oracle's
    * `CAST('0x' || substr(md5(salt ':' gram), 1, 8) AS BIGINT) % buckets`. */
  private def bucketJvm(md: java.security.MessageDigest, salt: String,
      gram: String, buckets: Int): Int =
    (java.lang.Long.parseLong(
      TextOps.md5HexJvm(md, salt + ":" + gram).substring(0, 8), 16) % buckets).toInt

  /** Fold one document's occurrence n-grams into a local bucket->count
    * map. Docs with fewer than n tokens (or null text) contribute
    * nothing. */
  private def localCounts(md: java.security.MessageDigest, text: String,
      n: Int, buckets: Int, salt: String): java.util.TreeMap[Int, Long] = {
    val out = new java.util.TreeMap[Int, Long]()
    val toks = TextOps.tokensJvm(text)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new StringBuilder(toks(i))
      var o = 1
      while (o < n) { sb.append(' ').append(toks(i + o)); o += 1 }
      val b = bucketJvm(md, salt, sb.toString, buckets)
      out.merge(b, 1L, (a, x) => a + x)
      i += 1
    }
    out
  }

  /** Per-document hashed-ngram feature counts: (idCol, bucket, cnt).
    * One typed pass, no shuffle — each row's grams fold locally. */
  def bucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10000, n: Int = 2, salt: String = "dsir",
      ordered: Boolean = true): DataFrame = {
    require(buckets >= 1 && n >= 1, s"bucketCounts: need buckets, n >= 1; got $buckets, $n")
    val in = df.select(col(idCol), col(textCol).cast("string"))
    val outSchema = StructType(Seq(
      in.schema(in.schema.fieldIndex(idCol)),
      StructField("bucket", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    in.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        if (r.isNullAt(1)) Iterator.empty
        else {
          val m = localCounts(md, r.getString(1), n, buckets, salt)
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala
            .map(e => Row(r.get(0), e.getKey.toLong, e.getValue))
        }
      }
    }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, idCol, "bucket"))
  }

  /** Global per-bucket occurrence counts: (bucket, cnt). Buckets that
    * no gram hits emit no row (the SQL GROUP BY shape); smoothing in
    * [[importanceWeights]] treats them as zero. One map-side-combined
    * aggregate over per-row locals. */
  def bucketDistribution(df: DataFrame, textCol: String,
      buckets: Int = 10000, n: Int = 2, salt: String = "dsir",
      ordered: Boolean = true): DataFrame =
    bucketCounts(df.select(lit(0L).as("_z"), col(textCol)), "_z", textCol,
      buckets, n, salt, ordered = false)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .transform(Presented(_, ordered, "bucket"))

  /** The Laplace-smoothed log-ratio lookup λ[b] =
    * ln((t_b + 1) / (T + B)) − ln((r_b + 1) / (R + B)) as a dense
    * driver array (B-bounded by contract). */
  private def logRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int, n: Int, salt: String): Array[Double] = {
    def dist(df: DataFrame): (Array[Long], Long) = {
      val arr = new Array[Long](buckets)
      var tot = 0L
      bucketDistribution(df, textCol, buckets, n, salt, ordered = false)
        .collect().foreach { r =>
          arr(r.getLong(0).toInt) = r.getLong(1)
          tot += r.getLong(1)
        }
      (arr, tot)
    }
    val (t, tt) = dist(target)
    val (r, rt) = dist(raw)
    Array.tabulate(buckets) { b =>
      math.log((t(b) + 1).toDouble / (tt + buckets)) -
        math.log((r(b) + 1).toDouble / (rt + buckets))
    }
  }

  /**
   * Per-document importance weight over the raw corpus: (idCol, weight)
   * where weight = Σ_grams λ[bucket(gram)] (per occurrence, summed in
   * ascending-bucket order so the double total is partitioning- and
   * run-invariant). Null/short texts weigh 0.0 — they carry no
   * evidence either way.
   */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 10000, n: Int = 2, salt: String = "dsir",
      ordered: Boolean = true): DataFrame = {
    val lam = logRatios(raw, target, textCol, buckets, n, salt)
    val in = raw.select(col(idCol), col(textCol).cast("string"))
    val bc = raw.sparkSession.sparkContext.broadcast(lam)
    val outSchema = StructType(Seq(
      in.schema(in.schema.fieldIndex(idCol)),
      StructField("weight", DoubleType, nullable = false)))
    in.mapPartitions { rows =>
      val l = bc.value
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        if (r.isNullAt(1)) Row(r.get(0), 0.0)
        else {
          val m = localCounts(md, r.getString(1), n, buckets, salt)
          var w = 0.0
          val it = m.entrySet().iterator() // TreeMap: ascending bucket order
          while (it.hasNext) {
            val e = it.next()
            w += e.getValue * l(e.getKey)
          }
          Row(r.get(0), w)
        }
      }
    }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, idCol))
  }

  /** Deterministic Gumbel noise for an id: g = −ln(−ln(u)) with
    * u = (u32(md5(salt ':' id)) + 0.5) / 2^32 — pure in the id, so
    * resampling is reproducible across runs and partitionings. */
  private[llm] def gumbelJvm(md: java.security.MessageDigest, salt: String,
      id: String): Double = {
    val u32 = java.lang.Long.parseLong(
      TextOps.md5HexJvm(md, salt + ":" + id).substring(0, 8), 16)
    val u = (u32 + 0.5) / 4294967296.0
    -math.log(-math.log(u))
  }

  /**
   * Gumbel-top-k importance resampling: the k raw documents with the
   * largest `weight / temperature + Gumbel(salt, id)` — equivalent to
   * sampling k without replacement proportionally to
   * exp(weight / temperature) (Gumbel-max trick), but fully
   * deterministic. Output (idCol, weight, score), score descending.
   * `temperature` trades sharpness for diversity; k is bounded by
   * contract (the global top-k is a TakeOrdered, not a sort).
   */
  def resample(raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      k: Int, buckets: Int = 10000, n: Int = 2, salt: String = "dsir",
      temperature: Double = 1.0): DataFrame = {
    require(k >= 1 && temperature > 0,
      s"resample: need k >= 1 and temperature > 0; got k=$k temperature=$temperature")
    val weights = importanceWeights(raw, target, idCol, textCol, buckets, n, salt,
      ordered = false)
    val in = weights.select(col(idCol), col("weight"))
    val outSchema = StructType(in.schema.fields :+
      StructField("score", DoubleType, nullable = false))
    val scored = in.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val g = gumbelJvm(md, salt + ":g", String.valueOf(r.get(0)))
        Row(r.get(0), r.getDouble(1), r.getDouble(1) / temperature + g)
      }
    }(Encoders.row(outSchema))
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
  }
}
