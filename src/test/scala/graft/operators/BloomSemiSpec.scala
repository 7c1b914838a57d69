package graft.operators

import graft.TestSpark
import graft.llm.Decontamination
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSemiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("prefilter: no false negatives, real pruning, nulls dropped") {
    val large = ((0L until 5000L).map(Option(_)) :+ None).toDF("k")
    val keys = (0L until 5000L by 37L).toDF("k") // 136 members
    val out = BloomSemiFilter.prefilter(large, keys, "k", "k",
      expectedItems = 200L, fpp = 0.01).select("k").as[Long].collect().toSet
    val members = (0L until 5000L by 37L).toSet
    assert(members.subsetOf(out), "a true member was dropped")
    // ~136 members + ~1% of 4864 non-members; 10x slack on the fpp
    assert(out.size <= members.size + 500, s"pruning too weak: ${out.size}")
  }

  test("prefilter: empty key set drops every row (exact semi-join answer)") {
    val large = (0L until 100L).toDF("k")
    val keys = Seq.empty[Long].toDF("k")
    assert(BloomSemiFilter.prefilter(large, keys, "k", "k", 10L).count() === 0L)
  }

  test("law: containmentBloom is bit-identical to containment") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 12).map(i => s"w$i")
    def sentence(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val train = (0L until 60L).map(i => (i, sentence(2 + rnd.nextInt(20)))).toDF("doc_id", "text")
    val eval = (100L until 120L).map(i => (i, sentence(rnd.nextInt(15)))).toDF("doc_id", "text")
    val plain = Decontamination.containment(train, eval, "doc_id", "text", shingleN = 3)
      .collect().map(_.toSeq).toSeq
    val bloom = Decontamination.containmentBloom(train, eval, "doc_id", "text",
      shingleN = 3, expectedEvalShingles = 1000L, fpp = 0.01)
      .collect().map(_.toSeq).toSeq
    assert(bloom === plain)
  }

  test("plan: the bloom probe survives optimization as a filter on the train side") {
    val train = (0L until 30L).map(i => (i, s"a b c d$i e f")).toDF("doc_id", "text")
    val eval = Seq((1000L, "a b c")).toDF("doc_id", "text")
    val plan = Decontamination.containmentBloom(train, eval, "doc_id", "text",
      shingleN = 3, expectedEvalShingles = 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
  }
}
