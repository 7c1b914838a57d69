package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination, repetition metrics, and deterministic sampling —
  * the round-10 pipeline operators. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("containment: full copy 1.0, disjoint 0.0, partial in between, short doc 0-row") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // full copy: 4/4
      (11L, "xx yy zz ww vv"),                      // disjoint: 0/3
      (12L, "alpha beta gamma delta qq rr"),        // 2 of its 4 shingles in train
      (13L, "too short")                            // < 3 tokens: no shingles
    ).toDF("doc_id", "text")
    val got = Decontamination.containment(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(10L) == ((4L, 4L, 1.0)))
    assert(got(11L) == ((3L, 0L, 0.0)))
    assert(got(12L) == ((4L, 2L, 0.5)))
    assert(got(13L) == ((0L, 0L, 0.0))) // spine row, not dropped
    assert(got.size == 4)
  }

  test("contaminationReport: per-benchmark rollup with inclusive threshold; null benchmark keeps its group; perDoc reuse matches") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "mmlu"), // 1.0
      (11L, "xx yy zz ww vv", "mmlu"),                      // 0.0
      (12L, "alpha beta gamma delta qq rr", "gsm"),         // 0.5
      (13L, "one two three four five qq rr", "gsm"),        // 0.5
      (14L, "one two three four five six seven", null)      // 1.0, null bench
    ).toDF("doc_id", "text", "benchmark")
    def got(threshold: Double) =
      Decontamination.contaminationReport(train, eval, "doc_id", "text",
        "benchmark", threshold, ordered = false)
        .collect().map(r => Option(r.getString(0)) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val g = got(0.8)
    assert(g(Some("mmlu")) == ((2L, 1L, 0.5)))
    assert(g(Some("gsm")) == ((2L, 0L, 0.0)))
    assert(g(None) == ((1L, 1L, 1.0)), "null benchmark must keep its own group")
    // inclusive at the boundary: a doc exactly AT the threshold counts
    assert(got(0.5)(Some("gsm")) == ((2L, 2L, 1.0)))
    // a precomputed per-doc frame (the bloom path at scale) is identical
    val per = Decontamination.containment(train, eval, "doc_id", "text",
      ordered = false)
    val viaPerDoc = Decontamination.contaminationReport(train, eval, "doc_id",
      "text", "benchmark", 0.8, perDoc = Some(per), ordered = false)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(viaPerDoc == g)
  }

  test("containment counts DISTINCT shingles — repeats in the eval doc don't inflate") {
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // "a b c" appears twice in the eval text; distinct set = {a b c, b c a, c a b}
    val eval = Seq((10L, "a b c a b c")).toDF("doc_id", "text")
    val r = Decontamination.containment(train, eval, "doc_id", "text").head()
    assert(r.getLong(1) == 3L) // distinct shingles
    assert(r.getLong(2) == 1L) // only "a b c" is in train
  }

  test("repetitionMetrics: hand-computed bigram fractions; short docs emit no row") {
    val df = Seq(
      (1L, "x y x y x y"),   // bigrams: xy yx xy yx xy -> n=5, distinct=2, top=3
      (2L, "a b c d"),       // n=3, all distinct, top=1
      (3L, "solo")           // < 2 tokens: no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((5L, 0.6, 0.6)))   // (5-2)/5, 3/5
    assert(got(2L) == ((3L, 0.0, 0.333))) // 0/3, 1/3
    assert(!got.contains(3L))
  }

  test("hashSample is deterministic, salt-sensitive, and roughly calibrated") {
    val df = spark.range(0, 2000).select(col("id").as("k"))
    val a = Sampling.hashSample(df, "k", 0.5, salt = "s1").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "k", 0.5, salt = "s1").collect().map(_.getLong(0)).toSet
    assert(a == b) // same (salt, key) -> same sample, run to run
    val c = Sampling.hashSample(df, "k", 0.5, salt = "s2").collect().map(_.getLong(0)).toSet
    assert(a != c) // different salt -> independent draw
    assert(math.abs(a.size - 1000) < 150, s"rate 0.5 of 2000 drew ${a.size}")
    // nested rates: a lower-rate sample with the same salt is a subset
    val quarter = Sampling.hashSample(df, "k", 0.25, salt = "s1")
      .collect().map(_.getLong(0)).toSet
    assert(quarter.subsetOf(a))
  }

  test("rate edges: 0 keeps nothing, 1 keeps everything") {
    val df = spark.range(0, 100).select(col("id").as("k"))
    assert(Sampling.hashSample(df, "k", 0.0).count() == 0L)
    assert(Sampling.hashSample(df, "k", 1.0).count() == 100L)
    assert(Sampling.thresholdHex(0.5) == "80000000")
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val df = spark.range(0, 3000).select(col("id").as("k"),
      (col("id") % 3).cast("string").as("src"))
    val got = Sampling.stratifiedSample(df, "k", "src",
      rates = Map("0" -> 1.0, "1" -> 0.0), defaultRate = 0.5, salt = "t")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("0") == 1000L)        // rate 1.0: all of stratum 0
    assert(!got.contains("1"))       // rate 0.0: none of stratum 1
    val d = got("2")                 // default 0.5 of 1000
    assert(math.abs(d - 500) < 120, s"default rate drew $d")
  }

  test("tfIdfTopTerms: rare terms outweigh common ones, ties break on the term") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "cherry common"),
      (3L, "common common common")).toDF("doc_id", "text")
    // N=3. doc 1: apple tf=2 df=1 -> 6.0; banana 1/1 -> 3.0; common 1/3 -> 1.0
    val got = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, "apple", 6.0), (1L, 2L, "banana", 3.0),
      (2L, 1L, "cherry", 3.0), (2L, 2L, "common", 1.0),
      (3L, 1L, "common", 3.0))) // tf=3 * 3/3 = 3.0; only one distinct term
  }

  test("chunkDocuments: stride, overlap, short tail, and sub-chunk docs") {
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "doc_id", "text",
      chunkTokens = 4, overlapTokens = 1) // stride 3
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 1L, "t6"),          // tail chunk, no suppression
      (2L, 0L, 2L, "a b")))        // doc shorter than a chunk
  }

  test("redactPii: tags every pattern, counts the replacements performed, clean rows untouched") {
    val df = Seq(
      (1L, "mail a@b.io and c@d.org call 555-123-4567 from 10.0.0.1"),
      (2L, "plain words only"),
      // an IPv4 inside an email's local part: the email replacement
      // swallows it, so exactly ONE redaction happens and is counted
      // (per-pattern counts on the original text would report 2)
      (3L, "ping 1.2.3.4@mail.com now")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("mail <EMAIL> and <EMAIL> call <PHONE> from <IP>", 4L)))
    assert(got(2L) == (("plain words only", 0L)))
    assert(got(3L) == (("ping <EMAIL> now", 1L)))
  }

  test("sampling: rate 1.0 keeps every non-null key but still drops null keys") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "a"), org.apache.spark.sql.Row(null, "b"))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("v", StringType, nullable = true))))
    val kept = Sampling.hashSample(df, "k", 1.0).collect().map(_.getString(1)).toSeq
    assert(kept == Seq("a")) // the null-keyed row is excluded even at rate 1
  }

  test("sampling is a filter on the scan — no shuffle, no UDF in the plan") {
    val df = spark.range(0, 100).select(col("id").as("k"), lit("s").as("src"))
    val plan = Sampling.stratifiedSample(df, "k", "src", Map("s" -> 0.5), 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"))
  }

  test("ordered=false makes the projection tier streaming-compatible (redact + sample + chunk)") {
    // a global sort is illegal on an unbounded stream — the ordered
    // opt-out is exactly what lets these passes run unchanged under
    // Structured Streaming (stateless projections/filters need no
    // watermark, no state store)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = ms.toDF.toDF("doc_id", "text")
    val piped = TextAnalysis.chunkDocuments(
      TextAnalysis.redactPii(
        Sampling.hashSample(stream, "doc_id", rate = 1.0),
        "doc_id", "text", ordered = false)
        .withColumnRenamed("redacted_text", "text"),
      "doc_id", "text", chunkTokens = 3, overlapTokens = 0, ordered = false)
    val q = piped.writeStream.format("memory").queryName("pipeops_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, "mail a@b.io one two three four"), (2L, "x y"))
      q.processAllAvailable()
      val got = spark.table("pipeops_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
      assert(got == Set(
        (1L, 0L, "mail <EMAIL> one"), (1L, 1L, "two three four"),
        (2L, 0L, "x y")))
    } finally q.stop()
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}
