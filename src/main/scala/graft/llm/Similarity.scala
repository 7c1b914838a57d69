package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Numeric discipline: vectors are quantized to integer milliunits
 * (round(x*1000)) before any arithmetic. Dot products and squared norms
 * are then exact BIGINT sums, and the final cosine (int / sqrt(int*int))
 * is a deterministic IEEE double — bit-identical across engines, so
 * results are verifiable against an external oracle and reproducible
 * across cluster runs regardless of partitioning or summation order.
 *
 * Two search shapes:
 *  - [[CosineTopK]]: brute force. The query set is broadcast; the corpus
 *    is scanned once, never shuffled. O(|Q| * N) dot products — the right
 *    baseline when |Q| is small or recall must be exact.
 *  - [[BucketedAnn]]: sign-prefix LSH buckets (IVF-style coarse
 *    quantization). Corpus and queries are bucketed by the sign pattern of
 *    the leading dimensions; the join is bucket-equality, so each query
 *    only scores its bucket's candidates — the scale path, trading recall
 *    for a 2^bits candidate reduction. More buckets, multi-probe, or a
 *    learned coarse quantizer slot into the same join shape.
 */
object Similarity {

  /** Quantize array<float> to exact integer milliunits: array<bigint>. */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Exact BIGINT dot product of two quantized vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Squared L2 norm (exact BIGINT) of a quantized vector. */
  def norm2(v: Column): Column = dot(v, v)

  /** Cosine similarity of quantized vectors given precomputed norms. */
  def cosine(dotCol: Column, n2a: Column, n2b: Column): Column =
    dotCol / sqrt(n2a.cast("double") * n2b.cast("double"))

  /** Sign-pattern bucket key over the first `bits` dimensions ("0101..."). */
  def signBucket(qv: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(qv, i) > 0, lit("1")).otherwise(lit("0"))): _*)

  private def scored(pairs: DataFrame, k: Int): DataFrame = {
    val cos = cosine(col("_dot"), col("_na"), col("_nb"))
    val w = Window.partitionBy("qid").orderBy(cos.desc, col("cid"))
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), round(cos, 4).as("cos"))
      .orderBy("qid", "rnk")
  }

  /**
   * Brute-force cosine top-k: for each query vector, the k most similar
   * corpus vectors (self excluded), ranked by cosine desc then id.
   * Output: (qid, rnk, cid, cos). The query side is broadcast — the
   * corpus partitioning is untouched and no shuffle happens until the
   * final (small, |Q|*k-row) ranking.
   */
  def cosineTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val prep = (df: DataFrame, id: String, v: String) => {
      val qv = quantize(col(vecCol))
      df.select(col(idCol).as(id), qv.as(v)).withColumn(s"_n2$id", norm2(col(v)))
    }
    val c = prep(corpus, "cid", "_vc")
    val q = prep(queries, "qid", "_vq")
    val pairs = c
      .join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        dot(col("_vq"), col("_vc")).as("_dot"),
        col("_n2qid").as("_na"), col("_n2cid").as("_nb"))
    scored(pairs, k)
  }

  /**
   * Bucketed ANN: both sides keyed by [[signBucket]]; candidates are
   * bucket-mates only. Same output shape as [[cosineTopK]] (queries with
   * an empty bucket return < k rows — approximate by design).
   */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bucketBits: Int = 4): DataFrame = {
    val prep = (df: DataFrame, id: String, v: String) => {
      df.select(col(idCol).as(id), quantize(col(vecCol)).as(v))
        .withColumn(s"_n2$id", norm2(col(v)))
        .withColumn(s"_bkt$id", signBucket(col(v), bucketBits))
    }
    val c = prep(corpus, "cid", "_vc")
    val q = prep(queries, "qid", "_vq")
    val pairs = c
      .join(q, col("_bktqid") === col("_bktcid") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        dot(col("_vq"), col("_vc")).as("_dot"),
        col("_n2qid").as("_na"), col("_n2cid").as("_nb"))
    scored(pairs, k)
  }
}
