package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Blocklist + cross-source overlap laws (both oracle-pinned, pq61/62):
 *
 *  - blocklist matches whole tokens only — "low" never hits "slow"
 *    (the Scunthorpe false-positive class), case-folded, bigrams as
 *    units, ratio gate in exact integers;
 *  - overlap counts DISTINCT shared contents (not row pairs), emits
 *    each unordered pair once, and never pairs a source with itself.
 */
class BlocklistOverlapSpec extends AnyFunSuite {

  test("blocklist: whole-token only, case-folded, bigrams as units") {
    val f = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "slow slowly lowly"), // no whole-token 'low' anywhere
      Row(2L, "LOW low Low"), // 3 case-folded hits
      Row(3L, "hash join is a hash join"), // bigram twice
      Row(4L, "join hash"), // reversed: no bigram hit
      Row(5L, null)))
    val got = Blocklist.score(f, "doc_id", "text",
      terms = Seq("low", "hash join"), maxHitRatioNum = 1, maxHitRatioDenom = 3,
      ordered = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == (3L, 0L, true))
    assert(got(2L) == (3L, 3L, false)) // 3 hits in 3 tokens > 1/3
    assert(got(3L) == (6L, 2L, true))  // 2/6 -> ratio exactly 1/3: passes
    assert(got(4L) == (2L, 0L, true))
    assert(got(5L) == (0L, 0L, true)) // nothing to match
  }

  test("blocklist rejects 3+-word terms instead of silently not matching them") {
    val f = TestSpark.df("doc_id bigint, text string", Seq(Row(1L, "x")))
    assertThrows[IllegalArgumentException] {
      Blocklist.score(f, "doc_id", "text", terms = Seq("three word phrase"))
    }
  }

  test("scoreMany: trie matcher equals score() on any 1-2-word list") {
    val docs = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("slow", "Batch", "hash join", "a", "the")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(
      m(Blocklist.scoreMany(docs, "doc_id", "text", terms, 1, 50, ordered = false)) ==
      m(Blocklist.score(docs, "doc_id", "text", terms, 1, 50, ordered = false)))
  }

  test("scoreMany: arbitrary-length phrases, overlapping and nested matches") {
    val f = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "big bad wolf big bad wolf"),  // trigram twice
      Row(2L, "big bad bad wolf"),           // neither trigram run
      Row(3L, "big bad wolf pack"),          // trigram + nested 'bad wolf' bigram
      Row(4L, null)))
    val got = Blocklist.scoreMany(f, "doc_id", "text",
      terms = Seq("big bad wolf", "bad wolf"), maxHitRatioNum = 1,
      maxHitRatioDenom = 4, ordered = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // doc 1: trigram at 1 and 4, 'bad wolf' at 2 and 5 -> 4 hits / 6 tokens
    assert(got(1L) == (6L, 4L, false))
    // doc 2: only 'bad wolf' at 3
    assert(got(2L) == (4L, 1L, true))
    // doc 3: trigram at 1 + 'bad wolf' at 2
    assert(got(3L) == (4L, 2L, false))
    assert(got(4L) == (0L, 0L, true))
  }

  test("score: list entries with tabs/doubled spaces match — score == scoreMany") {
    val f = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "hash join here"), Row(2L, "no match"), Row(3L, "solo")))
    val terms = Seq("hash\tjoin", "big  bad", "solo")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val viaScore = m(Blocklist.score(f, "doc_id", "text", terms, 1, 2, ordered = false))
    assert(viaScore(1L) == (3L, 1L, true)) // tab-separated entry still matches
    assert(viaScore(3L) == (1L, 1L, false))
    assert(viaScore ==
      m(Blocklist.scoreMany(f, "doc_id", "text", terms, 1, 2, ordered = false)))
  }

  test("overlap counts distinct shared contents once per unordered pair") {
    val f = TestSpark.df("doc_id bigint, text string, source string", Seq(
      Row(1L, "shared one", "a"), Row(2L, "shared one", "b"), // a~b via content 1
      Row(3L, "shared one", "b"), // duplicate row: still ONE shared content
      Row(4L, "shared two", "a"), Row(5L, "shared two", "b"), // a~b via content 2
      Row(6L, "shared two", "c"), // content 2 also in c
      Row(7L, "only a", "a"), Row(8L, null, "a"), Row(9L, "x", null)))
    val got = Overlap.sourceOverlap(f, "text", "source", ordered = false)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "b") -> 2L, // both contents
      ("a", "c") -> 1L, ("b", "c") -> 1L))
    assert(got.keys.forall { case (x, y) => x < y }, "pairs must be ordered once")
  }
}
