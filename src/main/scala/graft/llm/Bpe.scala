package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * Byte-pair-encoding tokenizer training and application (Sennrich et
 * al. 2016, "Neural Machine Translation of Rare Words with Subword
 * Units" — the construction behind GPT-2/Llama-family tokenizers),
 * organized the way production trainers (fastBPE, HF tokenizers) do:
 *
 *  - The CORPUS-side work — word frequency counting — is fully
 *    distributed and pure Catalyst (explode + map-side-combined count;
 *    oracle-checked, pq52). At 100 TB this is the only pass that
 *    touches the data.
 *  - The MERGE loop runs driver-side over the `topWords`-bounded word
 *    frequency table (the standard shape: BPE statistics depend only
 *    on (word, count) pairs, and the Zipf head carries virtually all
 *    pair mass; the bound is an explicit parameter, not an assumption).
 *    Ties break (count desc, pair lexicographic) so training is
 *    deterministic.
 *  - APPLICATION is distributed again: merge ranks broadcast
 *    (numMerges-bounded), one typed pass with a per-partition
 *    distinct-word cache (Zipf makes the hit rate high), no shuffle.
 *
 * Words are whitespace tokens ([[TextOps.tokens]]); symbols are the
 * word's characters plus a terminal `</w>` marker, so merges never
 * cross word boundaries. `tokenCounts` is the precomputed-count column
 * [[Packing.packSequencesCounted]] asks for — the tokenizer-aware
 * packing path end-to-end.
 */
object Bpe {

  /** End-of-word marker symbol (kept out of the character alphabet by
    * construction — it is appended as a unit, never split). */
  val EndOfWord = "</w>"

  /** Trained model: ordered merge list; rank = position. */
  final case class BpeModel(merges: Array[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
  }

  /** Distributed word-occurrence counts: (word, cnt), empty tokens
    * dropped. Pure Catalyst — one explode + one map-side-combined
    * aggregate; this is the only corpus-scale stage of BPE training. */
  def wordCounts(df: DataFrame, textCol: String, ordered: Boolean = true): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .transform(Presented(_, ordered, "word"))

  /** One BPE-encode of a word under the merge ranks: start from
    * chars + `</w>`, repeatedly merge the adjacent pair with the
    * lowest rank until none applies. */
  private[llm] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = {
      val a = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) { a(i) = String.valueOf(word.charAt(i)); i += 1 }
      a(word.length) = EndOfWord
      a
    }
    var done = syms.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(rk) if rk < bestRank => bestRank = rk; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val next = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, next, 0, bestAt)
        next(bestAt) = syms(bestAt) + syms(bestAt + 1)
        System.arraycopy(syms, bestAt + 2, next, bestAt + 1, syms.length - bestAt - 2)
        syms = next
        done = syms.length <= 1
      }
    }
    syms
  }

  /**
   * Train `numMerges` merges. The corpus contributes exactly one
   * distributed job — [[wordCounts]] — whose `topWords` most frequent
   * words (ties to the lexicographically smaller word) feed the
   * driver-side pair-statistics loop. Deterministic: the next merge is
   * the pair with the highest weighted count, ties to the
   * lexicographically smaller pair.
   */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      topWords: Int = 65536): BpeModel = {
    require(numMerges >= 0 && topWords >= 1,
      s"train: need numMerges >= 0, topWords >= 1; got $numMerges, $topWords")
    val freqs = wordCounts(df, textCol, ordered = false)
      .orderBy(col("cnt").desc, col("word")).limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // mutable view: each word as its current symbol sequence
    var words: Array[(Array[String], Long)] = freqs.map { case (w, c) =>
      (encodeWord(w, Map.empty), c) // no ranks -> chars + </w>
    }
    val merges = Array.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts.merge((syms(i), syms(i + 1)), c, (a, x) => a + x)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        import scala.jdk.CollectionConverters._
        val best = pairCounts.entrySet().asScala
          .minBy(e => (-e.getValue, e.getKey))(
            Ordering.Tuple2(Ordering.Long, Ordering.Tuple2(Ordering.String, Ordering.String)))
          .getKey
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        m += 1
      }
    }
    BpeModel(merges.result())
  }

  /** The shared typed application pass: f(tokens-of-row) via a
    * per-partition distinct-word encode cache. */
  private def applied[T](df: DataFrame, idCol: String, textCol: String,
      model: BpeModel, outField: StructField)(
      fold: (Iterator[Array[String]]) => Any): DataFrame = {
    val in = df.select(col(idCol), col(textCol).cast("string"))
    val bc = df.sparkSession.sparkContext.broadcast(model.ranks)
    val outSchema = StructType(Seq(in.schema(in.schema.fieldIndex(idCol)), outField))
    in.mapPartitions { rows =>
      val ranks = bc.value
      val cache = new java.util.HashMap[String, Array[String]]()
      rows.map { r =>
        val pieces: Iterator[Array[String]] =
          if (r.isNullAt(1)) Iterator.empty
          else TextOps.tokensJvm(r.getString(1)).iterator.filter(_.nonEmpty)
            .map(w => cache.computeIfAbsent(w, encodeWord(_, ranks)))
        Row(r.get(0), fold(pieces))
      }
    }(Encoders.row(outSchema))
  }

  /** Per-document BPE token count: (idCol, n_tokens). Null/empty texts
    * count 0. This is the precomputed-count column for
    * [[Packing.packSequencesCounted]]. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String, model: BpeModel,
      ordered: Boolean = true): DataFrame =
    applied(df, idCol, textCol, model,
      StructField("n_tokens", LongType, nullable = false)) { pieces =>
      var n = 0L
      pieces.foreach(n += _.length)
      n
    }.transform(Presented(_, ordered, idCol))

  /** Per-document BPE token sequence: (idCol, tokens array<string>) —
    * for inspection and vocabulary work; at corpus scale prefer
    * [[tokenCounts]] (counts only, no token materialization). */
  def tokenize(df: DataFrame, idCol: String, textCol: String, model: BpeModel,
      ordered: Boolean = true): DataFrame =
    applied(df, idCol, textCol, model,
      StructField("tokens", ArrayType(StringType, containsNull = false),
        nullable = false)) { pieces =>
      val out = Array.newBuilder[String]
      pieces.foreach(out ++= _)
      out.result().toSeq
    }.transform(Presented(_, ordered, idCol))
}
