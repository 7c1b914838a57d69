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

  test("law: shardShuffle is a permutation — every id once, positions contiguous per shard") {
    val df = corpus.toDF("doc_id", "text")
    val got = Packing.shardShuffle(df, "doc_id", shards = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // (id, shard, pos)
    assert(got.map(_._1).toSet == corpus.map(_._1).toSet, "every id exactly once")
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous from 1")
    }
    // determinism + salt sensitivity
    val again = Packing.shardShuffle(df, "doc_id", shards = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(again == got.toSet, "same salt must reproduce the permutation")
    val salted = Packing.shardShuffle(df, "doc_id", shards = 5, salt = "other")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(salted != got.toSet, "a different salt must draw a different permutation")
  }

  test("law: packSequences covers every token exactly once; interior sequences carry exactly target tokens") {
    val target = 7
    val df = corpus.toDF("doc_id", "text")
    val spans = Packing.packSequences(df, "doc_id", "text", target, shards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per-doc coverage: spans partition [0, n) in order with no gaps
    spans.groupBy(_._3).foreach { case (id, ss) =>
      val n = TextOps.tokensJvm(corpus.find(_._1 == id).get._2).length.toLong
      val ordered = ss.sortBy(_._2)
      assert(ordered.head._4 == 0L && ordered.last._5 == n, s"doc $id ends: $ordered")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4, s"doc $id gap between $a and $b")
        case _ =>
      }
    }
    // per-sequence budget: every sequence but the shard's last is full
    spans.groupBy(s => (s._1, s._2)).foreach { case ((shard, seq), ss) =>
      val tokens = ss.map(s => s._5 - s._4).sum
      val lastSeq = spans.filter(_._1 == shard).map(_._2).max
      if (seq < lastSeq)
        assert(tokens == target, s"shard $shard seq $seq carries $tokens != $target")
      else assert(tokens <= target, s"shard $shard last seq overflows: $tokens")
    }
  }

  test("law: packSequencesCounted with inline whitespace counts ≡ packSequences") {
    val df = corpus.toDF("doc_id", "text")
    val counted = df.withColumn("n_tok",
      org.apache.spark.sql.functions.size(
        TextOps.tokens(org.apache.spark.sql.functions.col("text"))).cast("long"))
    def key(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3, t._4)).toSeq
    val viaText = key(Packing.packSequences(df, "doc_id", "text", 7, shards = 3).collect())
    val viaCount = key(Packing.packSequencesCounted(counted, "doc_id", "n_tok", 7, shards = 3).collect())
    assert(viaText == viaCount,
      "a precomputed count column must pack identically to the inline count")
    // a negative count raises instead of corrupting the shard's offsets
    val bad = df.limit(1).withColumn("n_tok",
      org.apache.spark.sql.functions.lit(-1L))
    val e = intercept[Exception] {
      Packing.packSequencesCounted(bad, "doc_id", "n_tok", 7, shards = 1).collect()
    }
    assert(e.getMessage != null)
  }

  test("law: packSequences excludes null-text docs explicitly; empty text still packs") {
    import org.apache.spark.sql.Row
    val schema = "doc_id BIGINT, text STRING"
    val df = TestSpark.spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "a b c"), Row(2L, null), Row(3L, "")),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    val got = Packing.packSequences(df, "doc_id", "text", targetTokens = 2, shards = 1)
      .collect().map(_.getLong(2)).toSet
    assert(got == Set(1L, 3L), // null text out by contract, empty text in (one "" token)
      s"expected docs 1 and 3 only, got $got")
  }

  test("law: mixtureRates — uncapped strata hit budget*share exactly; caps flag and clamp to 1") {
    val df = Seq(
      ("web", 1000L), ("web", 1000L),   // 2000 tokens
      ("books", 100L),                  // 100 tokens — will be over-asked
      ("code", 500L)                    // untargeted -> rate 0
    ).toDF("source", "n_tokens")
    val got = Sampling.mixtureRates(df, "source", "n_tokens",
      Map("web" -> 0.5, "books" -> 0.5), budgetTokens = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got("web") == ((2000L, 0.25, false)))   // 1000*0.5/2000
    assert(got("books") == ((100L, 1.0, true)))    // wants 500 of 100 -> capped
    assert(got("code") == ((500L, 0.0, false)))    // excluded from the mixture
    // zero/null-token strata must rate 0, never 1 (least() skips the
    // NULL a zero-division produces), and targeted-but-empty flags capped
    import org.apache.spark.sql.Row
    val withEmpty = TestSpark.spark.createDataFrame(
      java.util.Arrays.asList(Row("web", 1000L),
        Row("empty", null), Row("zero", 0L)),
      org.apache.spark.sql.types.StructType.fromDDL("source STRING, n_tokens BIGINT"))
    val g2 = Sampling.mixtureRates(withEmpty, "source", "n_tokens",
      Map("web" -> 0.5, "empty" -> 0.25, "ghost" -> 0.25), budgetTokens = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(g2("empty") == ((0L, 0.0, true)))  // targeted, nothing to sample
    assert(g2("zero") == ((0L, 0.0, false)))  // untargeted and empty
    // a targeted stratum with NO corpus rows at all still emits its
    // zero-token capped row — callers watching `capped` see the undershoot
    assert(g2("ghost") == ((0L, 0.0, true)))
    assert(g2.size == 4)
    // over-subscribed mixtures are rejected up front
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixtureRates(df, "source", "n_tokens",
        Map("web" -> 0.9, "books" -> 0.9), budgetTokens = 1000L)
    }
    assert(ex.getMessage.contains("sum"))
  }

  test("law: temperatureMixtureRates — alpha=1 is proportional, lower alpha boosts small strata, shares partition the unit") {
    val df = Seq(
      ("web", 9000L), ("books", 900L), ("code", 100L)
    ).toDF("source", "n_tokens")
    def shares(alpha: Double): Map[String, Double] =
      Sampling.temperatureMixtureRates(df, "source", "n_tokens",
        alpha, budgetTokens = 1000L, ordered = false)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val s1 = shares(1.0)
    // alpha = 1: the natural proportions (ROUND(6) exact here)
    assert(s1 == Map("web" -> 0.9, "books" -> 0.09, "code" -> 0.01))
    val s05 = shares(0.5)
    // exponent smoothing: every small stratum gains, the big one pays
    assert(s05("code") > s1("code") && s05("books") > s1("books"))
    assert(s05("web") < s1("web"))
    // shares partition the unit (up to the 6-digit rounding)
    assert(math.abs(s05.values.sum - 1.0) < 1e-5)
    // rate law: uncapped rate == share * budget / n (alpha = 1 exact)
    val rates = Sampling.temperatureMixtureRates(df, "source", "n_tokens",
      1.0, budgetTokens = 1000L, ordered = false)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(rates("web") == ((0.1, false)) && rates("books") == ((0.1, false)))
    assert(rates("code") == ((0.1, false)))
    // deterministic across partitionings (sorted normalizer fold)
    val a = Sampling.temperatureMixtureRates(df.repartition(1), "source",
      "n_tokens", 0.5, 1000L, ordered = false).collect().map(_.toSeq).toSet
    val b = Sampling.temperatureMixtureRates(df.repartition(7), "source",
      "n_tokens", 0.5, 1000L, ordered = false).collect().map(_.toSeq).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixtureRates(df, "source", "n_tokens", 0.0, 1000L)
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

  test("law: URL canonicalization is idempotent over generated messy URLs") {
    // every combination of case, default/odd port, tracking params in
    // each position, fragments, and path shapes — one Spark job
    val urls = for {
      (scheme, i1) <- Seq("http", "HTTP", "https", "HtTpS").zipWithIndex
      (host, i2) <- Seq("Example.COM", "a.b.c", "X.Y:80", "x.y:443", "h.z:8080").zipWithIndex
      (path, i3) <- Seq("", "/", "/P/q", "/p?q=1", "?utm_a=1", "/p?utm_a=1&b=2",
        "/p?b=2&gclid=g&c=3", "/p?fbclid=f", "/p#f", "/p?q=1#f&utm",
        "/a&utm_x=1/p", "/p&gclid=z?utm_a=1&q=2").zipWithIndex
    } yield ((i1 * 1000 + i2 * 100 + i3).toLong, s"$scheme://$host$path")
    val df = urls.toDF("id", "url")
    val once = UrlOps.canonicalizeUrls(df, "id", "url", ordered = false)
    val twice = UrlOps.canonicalizeUrls(
      once.select($"id", $"canonical".as("url")), "id", "url", ordered = false)
    val joined = once.select($"id", $"canonical".as("c1"))
      .join(twice.select($"id", $"canonical".as("c2")), "id")
    val bad = joined.filter($"c1" =!= $"c2").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("law: HTML strip recovers the exact tokens of wrapped plain text") {
    // corpus docs wrapped in randomized markup skeletons: stripping must
    // return the original token sequence (single-spaced)
    val wrappers: Seq[(String, String)] = Seq(
      ("<html><body><p>", "</p></body></html>"),
      ("<div class=\"a\"><span>", "</span><script>var x = '<p>';</script></div>"),
      ("<!-- hdr --><article>", "</article><style>p{}</style>"),
      ("<p>", "<br/></p>"))
    val wrapped = corpus.zipWithIndex.map { case ((id, text), i) =>
      val (pre, post) = wrappers(i % wrappers.length)
      (id, text, pre + text + post)
    }
    val got = TextClean.stripHtml(
        wrapped.map { case (id, _, h) => (id, h) }.toDF("id", "html"),
        "id", "html", ordered = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    wrapped.foreach { case (id, text, _) =>
      val expect = TextOps.tokensJvm(text).filter(_.nonEmpty).mkString(" ")
      assert(got(id) == expect, s"doc $id: '${got(id)}' != '$expect'")
    }
  }

  test("law: weightedSample grows as a chain — sample(k) ⊂ sample(k+j)") {
    val df = corpus.toDF("doc_id", "text")
      .withColumn("w", org.apache.spark.sql.functions.length($"text") + 1)
    def ids(k: Int): Set[Long] = Sampling.weightedSample(df, "doc_id", "w", k, "law")
      .collect().map(_.getLong(0)).toSet
    val (s5, s20, s50) = (ids(5), ids(20), ids(50))
    assert(s5.subsetOf(s20) && s20.subsetOf(s50))
    assert(s5.size == 5 && s20.size == 20 && s50.size == 50)
  }

  test("law: leakedSpans marks exactly the train-covered runs, merged maximally") {
    val train = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b c d e f g h"),     // full copy -> one whole-doc span
      (2L, "a b c d X e f g h"),   // an insertion splits the leak in two
      (3L, "z1 z2 z3 z4"))         // novel -> no spans
      .toDF("doc_id", "text")
    val got = Decontamination.leakedSpans(train, eval, "doc_id", "text",
        ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 1L, 9L, 8L),
      (2L, 1L, 5L, 4L), (2L, 6L, 10L, 4L)))
  }

  test("law: corpus diff is an involution — swap sides, swap added/removed") {
    val a = corpus.toDF("doc_id", "text")
    val b = corpus.filter(_._1 % 3 != 0)
      .map { case (i, t) => (i, if (i % 5 == 0) t + " edited" else t) }
      .toDF("doc_id", "text")
    def d(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      CorpusDiff.diff(x, y, "doc_id", "text", ordered = false)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fwd = d(a, b)
    val swap = Map("added" -> "removed", "removed" -> "added",
      "changed" -> "changed")
    assert(d(b, a) == fwd.map { case (k, v) => k -> swap(v) })
  }
}
