package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Unicode normalization + split assignment laws (arithmetic is
 * oracle-pinned in pq63/pq64):
 *
 *  - NFC composes combining sequences and is idempotent; accent strip
 *    removes marks from both precomposed and combining forms;
 *  - splits are disjoint and exhaustive with proportions near the
 *    weights; HEAD STABILITY: re-slicing the tail never moves a key
 *    out of an earlier split (the property that lets a held-out test
 *    set stay fixed while train/val re-partition);
 *  - null keys get a null split; invalid weights are refused.
 */
class NormalizeSplitsSpec extends AnyFunSuite {
  import TestSpark.spark

  test("NFC composes and is idempotent; accent strip handles both forms") {
    val f = TestSpark.df("id bigint, t string", Seq(
      Row(1L, "Café"), // combining acute
      Row(2L, "Café"),  // precomposed
      Row(3L, null)))
    val got = TextNormalize.normalize(f, "id", "t", ordered = false)
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(got(1L) == (Some("Café"), Some("Cafe"))) // composed + stripped
    assert(got(2L) == (Some("Café"), Some("Cafe")))
    assert(got(3L) == (None, None))
    assert(TextNormalize.nfcJvm(TextNormalize.nfcJvm("Café")) ==
      TextNormalize.nfcJvm("Café"))
  }

  test("splits disjoint, exhaustive, proportional; null key -> null split") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    val got = Sampling.assignSplits(d, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "s")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.forall(Set("train", "val", "test")))
    val n = got.size.toDouble
    val frac = got.values.groupBy(identity).view.mapValues(_.size / n).toMap
    info(f"fractions: ${frac.map { case (k, v) => f"$k $v%.3f" }.mkString(", ")}")
    assert(math.abs(frac("train") - 0.8) < 0.1)
    val withNull = TestSpark.df("doc_id bigint", Seq(Row(null)))
    val ns = Sampling.assignSplits(withNull, "doc_id",
      Seq(("a", 0.5), ("b", 0.5)), salt = "s").collect().head
    assert(ns.isNullAt(1), "null key must get a null split")
  }

  test("head stability: re-slicing the tail never moves a key out of an earlier split") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    def members(splits: Seq[(String, Double)], name: String): Set[Long] =
      Sampling.assignSplits(d, "doc_id", splits, salt = "s")
        .filter(col("split") === name)
        .collect().map(_.getLong(0)).toSet
    val coarse = members(Seq(("train", 0.8), ("rest", 0.2)), "train")
    val fine = members(Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "train")
    assert(coarse == fine, "train membership must not depend on how the tail is sliced")
  }

  test("invalid weights are refused") {
    val d = TestSpark.df("id bigint", Seq(Row(1L)))
    assertThrows[IllegalArgumentException] {
      Sampling.assignSplits(d, "id", Seq(("a", 0.5), ("b", 0.4)))
    }
    assertThrows[IllegalArgumentException] {
      Sampling.assignSplits(d, "id", Seq(("a", 1.0)))
    }
    assertThrows[IllegalArgumentException] {
      Sampling.assignSplits(d, "id", Seq(("a", 0.5), ("a", 0.5)))
    }
  }

  test("scriptProfile: exact counts per script, argmax ties to the earlier class") {
    val rows = Seq[(java.lang.Long, String)](
      (1L, "привет мир 2024"),  // cyrillic 9, digit 4
      (2L, "你好世界 hello"),    // cjk 4, latin 5 -> latin
      (3L, "こんにちは世界"),     // kana 5, cjk 2 -> kana
      (4L, "abc 你你你"),        // latin 3, cjk 3 -> tie -> latin (earlier)
      (5L, "¿¡***!?"),           // nothing scripted -> none, all other
      (6L, null))
    val df = graft.TestSpark.df("doc_id bigint, text string",
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) })
    val got = TextNormalize.scriptProfile(df, "doc_id", "text", ordered = false)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.schema.fieldNames.zipWithIndex.collect {
          case (n, i) if !r.isNullAt(i) && n != "doc_id" && n != "dominant" && n != "n_chars" =>
            n -> r.getLong(i)
        }.toMap, Option(r.getAs[String]("dominant")))).toMap
    assert(got(1L)._2("cyrillic") == 9L && got(1L)._2("digit") == 4L &&
      got(1L)._3.contains("cyrillic"))
    assert(got(2L)._2("cjk") == 4L && got(2L)._2("latin") == 5L &&
      got(2L)._3.contains("latin"))
    assert(got(3L)._2("kana") == 5L && got(3L)._2("cjk") == 2L &&
      got(3L)._3.contains("kana"))
    assert(got(4L)._3.contains("latin"), "equal counts tie to the earlier class")
    assert(got(5L)._3.contains("none") && got(5L)._2("other") == 7L)
    assert(got(6L)._1.contains(0L) && got(6L)._2("latin") == 0L &&
      got(6L)._3.isEmpty, "null text -> zero counts, null dominant")
  }

  test("scriptProfile: codepoint iteration — supplementary chars count once as other; range boundaries exact") {
    // the typed pass iterates CODE POINTS (Spark's length() semantics):
    // an emoji is one surrogate PAIR but must count as ONE other-char;
    // range boundaries are inclusive on both ends ('ӿ' = U+04FF in,
    // 'Ԁ' = U+0500 out)
    val rows = Seq[(java.lang.Long, String)](
      (1L, "a😀b"),   // a, emoji (U+1F600), b -> 3 chars, latin 2, other 1
      (2L, "ӿԀ"))               // U+04FF (cyrillic) + U+0500 (not) -> 2 chars
    val df = graft.TestSpark.df("doc_id bigint, text string",
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) })
    val got = TextNormalize.scriptProfile(df, "doc_id", "text", ordered = false)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_chars") == 3L &&
      got(1L).getAs[Long]("latin") == 2L &&
      got(1L).getAs[Long]("other") == 1L,
      s"surrogate pair must count once: ${got(1L)}")
    assert(got(2L).getAs[Long]("n_chars") == 2L &&
      got(2L).getAs[Long]("cyrillic") == 1L &&
      got(2L).getAs[Long]("other") == 1L,
      s"range boundary must be inclusive-exclusive exactly: ${got(2L)}")
  }
}
