package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Semantic (embedding-space) decontamination laws (the corpus-scale row
 * set is oracle-pinned in pq125/pq125b):
 *
 *  - closed form on hand vectors: argmax eval, cosine arithmetic,
 *    inclusive ROUNDED threshold at the boundary;
 *  - ties go to the smaller eval id;
 *  - null ids/embeddings and zero-norm vectors never flag;
 *  - the bucketed arm equals brute force on scaled-copy contamination
 *    (identical sign pattern) and REALLY restricts across buckets —
 *    the recall trade is pinned, not assumed away;
 *  - partition invariance.
 */
class SemanticDecontamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(java.lang.Long, Array[Double])]) =
    spark.createDataFrame(rows.map(t => (t._1, Option(t._2).map(_.toSeq))))
      .toDF("vec_id", "embedding")

  private def run(train: Seq[(java.lang.Long, Array[Double])],
      eval: Seq[(java.lang.Long, Array[Double])], tau: Double,
      bits: Int = 0): Seq[(Long, Long, Double)] =
    Decontamination.semanticFlags(df(train), df(eval), "vec_id",
        "embedding", tau, bucketBits = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("closed form: argmax eval flagged, sub-threshold docs silent, boundary inclusive") {
    val train = Seq[(java.lang.Long, Array[Double])](
      (1L, Array(1.0, 0.0)),   // = eval 10 exactly -> cos 1.0
      (2L, Array(0.0, 1.0)),   // orthogonal to both evals -> no flag
      (3L, Array(1.0, 1.0)))   // cos to eval 10 = 0.7071 < 0.9
    val eval = Seq[(java.lang.Long, Array[Double])](
      (10L, Array(1.0, 0.0)), (11L, Array(-1.0, 0.0)))
    assert(run(train, eval, tau = 0.9) == Seq((1L, 10L, 1.0)))
    // inclusive boundary: rounded cos 0.7071 >= 0.7071 flags doc 3
    val got = run(train, eval, tau = 0.7071)
    assert(got.toSet == Set((1L, 10L, 1.0), (3L, 10L, 0.7071)))
  }

  test("cosine ties break to the smaller eval id") {
    val train = Seq[(java.lang.Long, Array[Double])]((1L, Array(1.0, 0.0)))
    // two identical evals: both cos 1.0 -> match_id must be 20
    val eval = Seq[(java.lang.Long, Array[Double])](
      (21L, Array(2.0, 0.0)), (20L, Array(2.0, 0.0)))
    assert(run(train, eval, tau = 0.9) == Seq((1L, 20L, 1.0)))
  }

  test("null ids/embeddings and zero-norm vectors are excluded on both sides") {
    val train = Seq[(java.lang.Long, Array[Double])](
      (1L, Array(1.0, 0.0)), (2L, null), (3L, Array(0.0, 0.0)), (null, Array(1.0, 0.0)))
    val eval = Seq[(java.lang.Long, Array[Double])](
      (10L, Array(1.0, 0.0)), (11L, null), (12L, Array(0.0, 0.0)), (null, Array(1.0, 0.0)))
    assert(run(train, eval, tau = 0.9) == Seq((1L, 10L, 1.0)))
  }

  test("bucketed == brute on scaled-copy contamination; cross-bucket candidates are really restricted") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val eval = e.filter(col("vec_id") < 15).select(
      (col("vec_id") + 50000).as("vec_id"),
      transform(col("embedding"), x => (x.cast("double") * 1.01).cast("float"))
        .as("embedding"))
    def flags(bits: Int): Set[(Long, Long)] =
      Decontamination.semanticFlags(e, eval, "vec_id", "embedding",
          tau = 0.99, bucketBits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = flags(0)
    assert(brute.size == 15 && flags(4) == brute,
      "a x1.01 copy shares every sign bit — the bucket join must find all 15")
    // restriction is real: sign-opposite vectors land in different
    // buckets even at high cosine-to-SOME-eval... demonstrate with a
    // hand case: train doc matching an eval only in another bucket
    val t2 = Seq[(java.lang.Long, Array[Double])]((1L, Array(1.0, 1.0, 1.0, 1.0)))
    val e2 = Seq[(java.lang.Long, Array[Double])]((10L, Array(-0.01, 1.0, 1.0, 1.0)))
    // cos ~ 0.86 and bucket "1111" vs "0111": brute flags at tau 0.8,
    // the 4-bit arm must not
    assert(run(t2, e2, tau = 0.8).nonEmpty)
    assert(run(t2, e2, tau = 0.8, bits = 4).isEmpty)
  }

  test("partition invariance") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val eval = e.filter(col("vec_id") < 5).select(
      (col("vec_id") + 50000).as("vec_id"), col("embedding"))
    def flags(parts: Int): Set[(Long, Long, Double)] =
      Decontamination.semanticFlags(e.repartition(parts), eval, "vec_id",
          "embedding", tau = 0.99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(flags(1) == flags(13) && flags(1).size >= 5)
  }

  test("knob guards: tau out of range and negative bits refused") {
    val t = Seq[(java.lang.Long, Array[Double])]((1L, Array(1.0)))
    intercept[IllegalArgumentException](run(t, t, tau = 0.0))
    intercept[IllegalArgumentException](run(t, t, tau = 1.5))
    intercept[IllegalArgumentException](run(t, t, tau = 0.5, bits = -1))
  }

  // ---- persisted eval-embedding index + streaming sink ----

  private def embCorpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  private def embEval = embCorpus.filter(col("vec_id") < 10).select(
    (col("vec_id") + 50000).as("vec_id"),
    transform(col("embedding"), x => (x.cast("double") * 1.01).cast("float"))
      .as("embedding"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_semdec").resolve(name).toString

  test("flags against the persisted index == one-shot semanticFlags, at both bucket widths") {
    def fl(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Seq(0, 4).foreach { bits =>
      val tbl = s"graft_semdec_idx$bits"
      try {
        val n = Decontamination.saveEvalEmbeddingIndex(embEval, "vec_id",
          "embedding", tbl, tmp(tbl), bucketBits = bits)
        assert(n == 10)
        val got = fl(Decontamination.semanticFlagsAgainstIndex(embCorpus,
          "vec_id", "embedding", tbl, tau = 0.99, ordered = false))
        val want = fl(Decontamination.semanticFlags(embCorpus, embEval,
          "vec_id", "embedding", tau = 0.99, bucketBits = bits,
          ordered = false))
        assert(got == want && got.size == 10, s"bits=$bits")
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("a stamp-less table is refused as foreign") {
    import spark.implicits._
    val tbl = "graft_semdec_foreign"
    try {
      Seq((1L, Seq(1L), 1L)).toDF("_eid", "_v", "_n2")
        .write.option("path", tmp(tbl)).format("parquet").saveAsTable(tbl)
      val e = intercept[Exception] {
        Decontamination.semanticFlagsAgainstIndex(embCorpus, "vec_id",
          "embedding", tbl, tau = 0.99)
      }
      assert(e.getMessage.contains("not an eval-embedding index"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("streaming sink: union of per-batch flags == one-shot; a replayed batch annotates identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val tbl = "graft_semdec_stream"
    try {
      Decontamination.saveEvalEmbeddingIndex(embEval, "vec_id",
        "embedding", tbl, tmp(tbl))
      val data = embCorpus.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      val (b1, b2) = data.splitAt(data.length / 2)
      val input = MemoryStream[(Long, Seq[Float])]
      val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val statuses = scala.collection.mutable.ArrayBuffer.empty[Map[Long, String]]
      val q = graft.streaming.StreamingSemantic.sink(
          input.toDF().toDF("vec_id", "embedding"),
          "vec_id", "embedding", tbl, tau = 0.99,
          onBatch = (a, _) => flagged.synchronized {
            statuses += a.select(col("vec_id"), col("status"))
              .as[(Long, String)].collect().toMap
            flagged ++= a.filter(col("status") === "contaminated")
              .select(col("vec_id"), col("match_id"))
              .as[(Long, Long)].collect()
            ()
          })
        .option("checkpointLocation", tmp("chk"))
        .start()
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // replay batch 1's rows — the gate is stateless, annotation identical
      input.addData(b1: _*); q.processAllAvailable()
      q.stop()
      val oneShot = Decontamination.semanticFlags(embCorpus, embEval,
          "vec_id", "embedding", tau = 0.99, ordered = false)
        .select("vec_id", "match_id").as[(Long, Long)].collect().toSet
      assert(flagged.toSet == oneShot && oneShot.size == 10,
        "union of per-batch flags must equal the one-shot flags")
      assert(statuses.size == 3 && statuses(2) == statuses(0),
        "a replayed batch must annotate identically")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("streaming sink refuses a batch carrying the reserved annotation columns") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Seq[Float], String)]
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingSemantic.sink(
        input.toDF().toDF("vec_id", "embedding", "status"),
        "vec_id", "embedding", "graft_semdec_never", tau = 0.99)
    }
    assert(e.getMessage.contains("status") &&
      e.getMessage.contains("reserved"),
      s"must name the clashing column: ${e.getMessage}")
  }
}
