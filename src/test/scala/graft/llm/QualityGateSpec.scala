package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class QualityGateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // doc 1 passes everything; doc 2 fails only length (too short for
  // bigrams -> repetition gates are null-safe true); doc 3 is the
  // null-text fails-everything contract (n_tokens 0, never null); doc 4
  // fails stopword, ttr and both repetition ceilings but passes length
  // and word length.
  private val corpus = Seq(
    (1L, "the aa of bb and cc the dd of ee"),
    (2L, "x"),
    (3L, null.asInstanceOf[String]),
    (4L, "aa aa aa aa aa aa"))

  private def gate = TextAnalysis.qualityGate(corpus.toDF("doc_id", "text"),
    "doc_id", "text",
    minTokens = 5, maxTokens = 20, minMeanWlen = 2.0, maxMeanWlen = 3.0,
    minStopRatio = 0.3, minTtr = 0.5,
    maxDupBigramFrac = 0.2, maxTopBigramFrac = 0.3, ordered = false)

  test("per-gate flags and the pass conjunction") {
    val rows = gate.collect().map { r =>
      assert(!r.isNullAt(1), "n_tokens must never be null")
      r.getLong(0) -> ((r.getLong(1),
        r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7)))
    }.toMap
    //                    n  len    wlen   stop   ttr    rep    pass
    assert(rows(1L) === ((10L, true, true, true, true, true, true)))
    assert(rows(2L) === ((1L, false, false, false, true, true, false)))
    assert(rows(3L) === ((0L, false, false, false, false, false, false)))
    assert(rows(4L) === ((6L, true, true, false, false, false, false)))
  }

  test("plan: single typed pass, zero shuffle, thresholds stay out of the typed stage") {
    val plan = gate.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality gate shuffled:\n$plan")
    assert(!plan.contains("Window ["))
  }
}
