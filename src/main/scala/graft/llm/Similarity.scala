package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructField, StructType}

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

  /**
   * Bucket-bit sizing for a corpus of `n` vectors: enough sign bits that
   * the expected bucket holds ~`targetBucketSize` vectors, so per-bucket
   * pair work stays bounded as the corpus grows (the round-3 caveat:
   * a fixed small bit count is quadratic-per-bucket at corpus scale).
   * Capped by the embedding dimension — each bit consumes one.
   */
  def autoBucketBits(n: Long, targetBucketSize: Int = 1024, maxBits: Int = 32): Int = {
    require(targetBucketSize > 0)
    val needed = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketSize)) /
      math.log(2.0)).toInt
    math.min(maxBits, math.max(1, needed))
  }

  /** Numeric key for (qid, cid) ordering inside the pre-reduce heap —
   *  must agree with the window's `cid` ASC tie-break, so the reduction
   *  only applies to numeric id types. */
  private def numericKey(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue
    case _ => Double.NaN
  }

  /**
   * Map-side top-k pre-reduction: per partition, keep only the k best
   * (cosine desc, cid asc) candidates per query. The cosine here is the
   * same double expression the final window recomputes (long dot /
   * sqrt(long*long)), so selection agrees bit-for-bit with the window
   * ranking. Only the surviving numPartitions * |Q| * k rows shuffle.
   * Applied only when both ids are numeric (the heap's tie-break must
   * match the window's `cid` ordering); non-numeric ids fall back to the
   * direct window — correct, just shuffling all pairs.
   */
  private def partitionTopK(pairs: DataFrame, k: Int): DataFrame = {
    val schema = pairs.schema
    val idsNumeric = Seq("qid", "cid").forall { c =>
      schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
        case _ => false
      }
    }
    if (!idsNumeric) return pairs
    pairs.mapPartitions { rows =>
      // per-qid bounded heap, worst candidate on top (min-heap by rank order)
      type Cand = (Double, Double, Row) // (cos, cidKey, row)
      // rank key (-cos, cidKey): smaller = better. The queue dequeues its
      // max, i.e. the current worst survivor.
      val byRank = Ordering.by[Cand, (Double, Double)](c => (-c._1, c._2))
      val heaps = new java.util.HashMap[Double, scala.collection.mutable.PriorityQueue[Cand]]()
      rows.foreach { r =>
        val cos = r.getLong(2).toDouble / math.sqrt(r.getLong(3).toDouble * r.getLong(4).toDouble)
        val cand = (cos, numericKey(r.get(1)), r)
        val heap = heaps.computeIfAbsent(numericKey(r.get(0)),
          _ => scala.collection.mutable.PriorityQueue.empty[Cand](byRank))
        if (heap.size < k) heap.enqueue(cand)
        else if (byRank.lt(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator.map(_._3))
    }(Encoders.row(schema))
  }

  private def scored(pairs: DataFrame, k: Int): DataFrame = {
    val cos = cosine(col("_dot"), col("_na"), col("_nb"))
    val w = Window.partitionBy("qid").orderBy(cos.desc, col("cid"))
    partitionTopK(pairs, k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), round(cos, 4).as("cos"))
      .orderBy("qid", "rnk")
  }

  /**
   * Brute-force cosine top-k: for each query vector, the k most similar
   * corpus vectors (self excluded), ranked by cosine desc then id.
   * Output: (qid, rnk, cid, cos). The query side is broadcast — the
   * corpus partitioning is untouched during scoring — and a map-side
   * per-partition top-k reduction runs before the ranking window, so the
   * only shuffle carries numPartitions * |Q| * k candidate rows, not the
   * full |Q| * N scored set.
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
   * Embedding-cosine near-duplicate pairs: all corpus pairs sharing a
   * sign bucket whose cosine clears the threshold — the embedding-space
   * sibling of MinHash near-dup (same LSH-bucket join shape: candidate
   * generation never goes all-pairs; recall grows with fewer bucket
   * bits, cost with more). Output (id_a, id_b, cos) with id_a < id_b.
   */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketBits: Int = 4): DataFrame = {
    val prep = corpus.select(col(idCol).as("_id"), quantize(col(vecCol)).as("_v"))
      .withColumn("_n2", norm2(col("_v")))
      .withColumn("_bkt", signBucket(col("_v"), bucketBits))
    val a = prep.select(col("_id").as("id_a"), col("_v").as("_va"),
      col("_n2").as("_na"), col("_bkt"))
    val b = prep.select(col("_id").as("id_b"), col("_v").as("_vb"),
      col("_n2").as("_nb"), col("_bkt"))
    val joined = a.join(b, Seq("_bkt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_va"), col("_vb"), col("_na"), col("_nb"))
    // pair scoring runs typed: the quadratic-in-bucket dot products are
    // the hot loop, and higher-order aggregate/zip_with evaluate
    // interpreted. Same integer dot / double cosine / HALF_UP rounding.
    val outSchema = StructType(Seq(
      joined.schema("id_a"), joined.schema("id_b"),
      StructField("cos", DoubleType, nullable = true)))
    joined.mapPartitions { rows =>
      rows.flatMap { r =>
        val va = r.getSeq[Long](2)
        val vb = r.getSeq[Long](3)
        var dotV = 0L
        var i = 0
        val n = math.min(va.length, vb.length)
        while (i < n) { dotV += va(i) * vb(i); i += 1 }
        val cos = dotV.toDouble / math.sqrt(r.getLong(4).toDouble * r.getLong(5).toDouble)
        if (cos >= threshold)
          Iterator.single(Row(r.get(0), r.get(1),
            java.math.BigDecimal.valueOf(cos)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue))
        else Iterator.empty
      }
    }(Encoders.row(outSchema))
      .orderBy("id_a", "id_b")
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
