package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * BPE laws (word counting is oracle-pinned in pq52; these pin training
 * and application):
 *
 *  - the textbook corpus learns the textbook merges in order;
 *  - tokenize is lossless: concatenating a word's pieces (minus the
 *    terminal marker) reproduces the word;
 *  - token counts are monotonically non-increasing in merges, and
 *    equal character count (+1 marker per word) at zero merges;
 *  - tokenCounts == tokenize lengths (the counts-only path never
 *    diverges from the materializing one);
 *  - training and application are deterministic across partitionings;
 *  - the counts column feeds packSequencesCounted end-to-end (the
 *    tokenizer-aware packing path).
 */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark

  // Sennrich's running example: "low" x5, "lower" x2, "newest" x6, "widest" x3
  private def sennrich = TestSpark.df("doc_id bigint, text string", Seq(
    Row(1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    Row(2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))))

  test("textbook corpus learns the textbook merges in order") {
    val model = Bpe.train(sennrich, "text", numMerges = 4)
    // pair mass: (e,s)=9, (s,t)=9, (t,</w>)=9 ... ties break lexicographically:
    // round 1 picks (e,s); then (es,t)=9; then (est,</w>)=9; then (l,o)=7
    assert(model.merges.toSeq == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
  }

  test("tokenize is lossless and encodes 'newest' as the learned pieces") {
    val model = Bpe.train(sennrich, "text", numMerges = 4)
    val toks = Bpe.tokenize(sennrich, "doc_id", "text", model, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // every word reassembles from its pieces
    val d = sennrich.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    toks.foreach { case (id, pieces) =>
      val rebuilt = pieces.mkString("").replace(Bpe.EndOfWord, " ").trim
      assert(rebuilt == d(id), s"doc $id not lossless")
    }
    // 'newest' -> n e w est</w> under merges (e,s),(es,t),(est,</w>)
    assert(toks(2L).take(4) == Seq("n", "e", "w", "est</w>"))
  }

  test("token counts: zero merges == chars + marker; monotone non-increasing in merges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val counts = (0 to 3).map { m =>
      val model = Bpe.train(docs, "text", numMerges = m * 30)
      m -> Bpe.tokenCounts(docs, "doc_id", "text", model, ordered = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }.toMap
    val base = docs.select(col("doc_id"),
      aggregate(filter(TextOps.tokens(col("text")), t => t =!= ""),
        lit(0L), (acc, t) => acc + length(t) + 1).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(0) == base, "0 merges must equal chars + one marker per word")
    (1 to 3).foreach { m =>
      counts(m).foreach { case (id, n) =>
        assert(n <= counts(m - 1)(id), s"doc $id grew at $m merges")
      }
    }
  }

  test("tokenCounts == tokenize lengths; both partitioning-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(docs, "text", numMerges = 50)
    val viaTokens = Bpe.tokenize(docs.repartition(9), "doc_id", "text", model, ordered = false)
      .select(col("doc_id"), size(col("tokens")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaCounts = Bpe.tokenCounts(docs.repartition(2), "doc_id", "text", model, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaTokens == viaCounts)
  }

  test("null and empty texts count zero tokens") {
    val f = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, null), Row(2L, ""), Row(3L, "  "), Row(4L, "hi")))
    val model = Bpe.BpeModel(Array.empty)
    val got = Bpe.tokenCounts(f, "doc_id", "text", model, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 3L)) // h i </w>
  }

  test("BPE counts feed packSequencesCounted end-to-end within budget") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(docs, "text", numMerges = 100)
    val counted = docs.join(
      Bpe.tokenCounts(docs, "doc_id", "text", model, ordered = false), "doc_id")
    val packed = Packing.packSequencesCounted(counted, "doc_id", "n_tokens",
      targetTokens = 512, shards = 4)
    // every doc's token mass is covered exactly once across its spans
    val spanSum = packed.agg(sum(col("tok_end") - col("tok_start"))).head.getLong(0)
    val total = counted.agg(sum("n_tokens")).head.getLong(0)
    assert(spanSum == total, s"span coverage $spanSum != corpus tokens $total")
  }
}
