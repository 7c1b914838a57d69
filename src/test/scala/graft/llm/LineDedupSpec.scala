package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LineDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "keep one two three four five\nshort"),
    (2L, "x\nkeep one two three four five"), // cross-doc dup of doc 1's line
    (3L, "rep a b c d e\nrep a b c d e"),    // within-doc repeat
    (4L, null.asInstanceOf[String]),
    (5L, "short short"))                     // 2 tokens: never eligible

  private def df = corpus.toDF("doc_id", "text")

  test("keep-first across and within docs; short lines immune; nulls excluded") {
    val out = LineDedup.dedupLines(df, "doc_id", "text", minTokens = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 5L))
    assert(out(1L) === ((2L, 0L, corpus(0)._2)))          // first site intact
    assert(out(2L) === ((2L, 1L, "x")))
    assert(out(3L) === ((2L, 1L, "rep a b c d e")))
    assert(out(5L) === ((1L, 0L, "short short")))
  }

  test("law: a corpus of unique lines round-trips unchanged even at minTokens=1") {
    val unique = (0L until 30L)
      .map(i => (i, s"u${i}a u${i}b\nu${i}c u${i}d u${i}e"))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLines(unique, "doc_id", "text", minTokens = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    (0L until 30L).foreach(i => assert(out(i) === s"u${i}a u${i}b\nu${i}c u${i}d u${i}e"))
  }

  test("custom literal separator with regex metacharacters") {
    val d = Seq((1L, "dup w1 w2 w3 w4||solo a b c d"),
      (2L, "dup w1 w2 w3 w4||other e f g h")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(d, "doc_id", "text", sep = "||", minTokens = 5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) === "dup w1 w2 w3 w4||solo a b c d")
    assert(out(2L) === "other e f g h")
  }

  test("incremental: history wins, batch keeps-first, provenance split") {
    val hist = Seq((1L, "h1 h2 h3 h4 h5\nshort")).toDF("doc_id", "text")
    val idx = LineDedup.lineIndex(hist, "doc_id", "text")
    val batch = Seq(
      (10L, "h1 h2 h3 h4 h5\nnew1 n2 n3 n4 n5"), // history hit + fresh line
      (11L, "new1 n2 n3 n4 n5\nshort"),          // batch dup of doc 10's line
      (12L, "short")).toDF("doc_id", "text")
    val out = LineDedup.dedupLinesIncremental(batch, "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(10L) === ((2L, 1L, 0L, "new1 n2 n3 n4 n5")))
    assert(out(11L) === ((2L, 0L, 1L, "short")))
    assert(out(12L) === ((1L, 0L, 0L, "short")))
  }

  test("incremental law: empty history reduces to dedupLines exactly") {
    val emptyIdx = Seq.empty[Long].toDF("line_hash")
    val inc = LineDedup.dedupLinesIncremental(df, "doc_id", "text", emptyIdx)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2) + r.getLong(3), r.getString(4))).toSet
    val plain = LineDedup.dedupLines(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(inc === plain)
    // no history -> nothing attributed to it
    assert(LineDedup.dedupLinesIncremental(df, "doc_id", "text", emptyIdx)
      .agg(org.apache.spark.sql.functions.sum("n_removed_history"))
      .head.getLong(0) === 0L)
  }

  test("plan: no windows, map-side-combined dup aggregate, no cartesian") {
    val plan = LineDedup.dedupLines(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["), s"line dedup grew a window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_count"), s"dup count not partial:\n$plan")
  }

  test("plan: incremental history join is a hash equi-join on the 8-byte key") {
    val idx = Seq(1L, 2L).toDF("line_hash")
    val plan = LineDedup.dedupLinesIncremental(df, "doc_id", "text", idx)
      .queryExecution.executedPlan.toString
    // the _elig side-condition must ride as a join filter, never demote
    // the join to a nested loop over the corpus-sized line stream
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"history join degenerated:\n$plan")
    assert(plan.contains("xxhash64"), s"history join not on the hash key:\n$plan")
    assert(!plan.contains("Window ["))
  }
}
