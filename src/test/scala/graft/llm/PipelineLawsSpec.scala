package graft.llm

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Law-style pins for the round-10 pipeline operators, checked over a
  * seeded random corpus in ONE Spark job per law (per-case Spark jobs
  * would be 100x slower than the law is worth). */
class PipelineLawsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def word(): String = {
    val chars = "abcdefghij0123456789"
    (0 until 1 + rnd.nextInt(6)).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }
  // 120 docs, 0..40 tokens each — covers empty, sub-chunk, and multi-chunk
  private val corpus: Seq[(Long, String)] =
    (0L until 120L).map(i => i -> Seq.fill(rnd.nextInt(41))(word()).mkString(" "))

  test("law: chunks reconstruct the document exactly (overlap dropped)") {
    val df = corpus.toDF("doc_id", "text")
    val chunked = TextAnalysis.chunkDocuments(df, "doc_id", "text",
      chunkTokens = 5, overlapTokens = 2)
      .collect().groupBy(_.getLong(0))
    corpus.foreach { case (id, text) =>
      val toks = TextOps.tokensJvm(text).toSeq.filter(_.nonEmpty)
      if (toks.isEmpty) assert(!chunked.contains(id) ||
        chunked(id).map(_.getString(3)).mkString == "")
      else {
        val chunks = chunked(id).sortBy(_.getLong(1)).map(_.getString(3).split(" ").toSeq)
        val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(2))
        assert(rebuilt == toks, s"doc $id: $rebuilt != $toks")
      }
    }
  }

  test("law: redactPii is idempotent and a second pass finds nothing") {
    val contaminated = corpus.map { case (i, t) =>
      (i, if (i % 3 == 0) s"$t x$i@h$i.com 555-123-4567 1.2.3.$i" else t)
    }.toDF("doc_id", "text")
    val once = TextAnalysis.redactPii(contaminated, "doc_id", "text", ordered = false)
    val twice = TextAnalysis.redactPii(
      once.select($"doc_id", $"redacted_text".as("text")),
      "doc_id", "text", ordered = false)
    val joined = once.select($"doc_id", $"redacted_text".as("r1"))
      .join(twice.select($"doc_id", $"redacted_text".as("r2"),
        $"n_redactions".as("n2")), "doc_id")
    assert(joined.filter($"r1" =!= $"r2" || $"n2" =!= 0L).count() == 0L)
  }

  test("law: containment is in [0,1], and exactly 1.0 for eval docs drawn from train") {
    val train = corpus.filter(_._2.split(" ").count(_.nonEmpty) >= 3).toDF("doc_id", "text")
    val subset = corpus.filter { case (i, t) =>
      i % 2 == 0 && t.split(" ").count(_.nonEmpty) >= 3 }
    val novel = (1000L until 1020L).map(i => i -> s"zz${i}a zz${i}b zz${i}c zz${i}d")
    val eval = (subset.map { case (i, t) => (i + 500, t) } ++ novel).toDF("doc_id", "text")
    val got = Decontamination.containment(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.values.forall(c => c >= 0.0 && c <= 1.0))
    subset.foreach { case (i, _) => assert(got(i + 500) == 1.0, s"doc ${i + 500}") }
    novel.foreach { case (i, _) => assert(got(i) == 0.0, s"doc $i") }
  }

  test("law: thresholdHex is monotone in rate and 8 lowercase hex chars") {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (a, b) =>
        val (ha, hb) = (Sampling.thresholdHex(a), Sampling.thresholdHex(b))
        ha.length == 8 && ha.forall(c => c.isDigit || ('a' to 'f').contains(c)) &&
          (a > b || ha <= hb) && (a < b || ha >= hb)
      })
    assert(res.passed, res.status.toString)
  }
}
