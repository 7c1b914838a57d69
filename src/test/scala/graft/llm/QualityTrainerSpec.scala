package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hashed-logistic-regression training laws:
 *
 *  - ITERATION-1 EXACTNESS: from zero init, sigmoid(0) = 0.5 exactly,
 *    so residuals are the dyadics y − 0.5 and the first step's weights
 *    match a hand computation bit-for-bit — and are partition-count
 *    invariant (order-free exact sums).
 *  - LEARNING: on separable data the observed logistic loss strictly
 *    decreases across iterations, and the trained model ranks every
 *    positive above every negative.
 *  - SPINE: token-free docs move only the bias.
 *  - REFUSAL: null or non-0/1 labels fail fast, not silently skip.
 */
class QualityTrainerSpec extends AnyFunSuite {
  import TestSpark.spark

  private def bucketOf(tok: String, dim: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  private val dim = 32

  // separable fixture: positives speak one vocabulary, negatives another
  private def corpus() = TestSpark.df("doc_id bigint, text string, y double", Seq(
    Row(1L, "good clean prose good", 1.0),
    Row(2L, "good careful writing", 1.0),
    Row(3L, "clean careful good prose", 1.0),
    Row(4L, "spam junk spam junk", 0.0),
    Row(5L, "junk noise spam", 0.0),
    Row(6L, "noise noise junk", 0.0)))

  test("iteration 1 from zero init matches the hand computation exactly, any partitioning") {
    val df = corpus()
    val lr = 0.5
    val got = QualityTrainer.train(df, "text", "y", dim, iters = 1, lr = lr)
    // hand gradient: residual is y − 0.5 per doc; each token occurrence
    // adds its doc's residual to its bucket
    val grads = new Array[Double](dim)
    var bg = 0.0
    df.collect().foreach { r =>
      val res = r.getDouble(2) - 0.5
      bg += res
      r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        .foreach(t => grads(bucketOf(t, dim)) += res)
    }
    assert(got.bias == lr * bg)
    (0 until dim).foreach { j =>
      assert(got.weights(j) == lr * grads(j), s"bucket $j")
    }
    // loss at zero init is N·ln 2 (every prob is exactly 0.5)
    assert(math.abs(got.losses(0) - 6 * math.log(2)) < 1e-12)
    // exact sums are layout-invariant: identical bits at any partition count
    val re = QualityTrainer.train(df.repartition(7), "text", "y", dim,
      iters = 1, lr = lr)
    assert(re.bias == got.bias && re.weights.sameElements(got.weights))
  }

  test("loss strictly decreases on separable data and the model separates the classes") {
    val df = corpus()
    val trained = QualityTrainer.train(df, "text", "y", dim, iters = 6, lr = 0.5)
    trained.losses.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"loss must decrease: ${trained.losses.mkString(", ")}")
    }
    val probs = trained.score(df, "doc_id", "text", ordered = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val pos = Seq(1L, 2L, 3L).map(probs)
    val neg = Seq(4L, 5L, 6L).map(probs)
    assert(pos.min > neg.max,
      s"every positive must outrank every negative: pos=$pos neg=$neg")
  }

  test("token-free docs move only the bias; bad labels fail fast") {
    val blank = TestSpark.df("doc_id bigint, text string, y double", Seq(
      Row(1L, null, 1.0), Row(2L, "", 1.0), Row(3L, "   ", 0.0)))
    val t = QualityTrainer.train(blank, "text", "y", dim, iters = 1, lr = 1.0)
    assert(t.weights.forall(_ == 0.0), "no tokens, no weight movement")
    assert(t.bias == (0.5 + 0.5 - 0.5), "bias steps by the residual sum")

    val nullLabel = TestSpark.df("doc_id bigint, text string, y double",
      Seq(Row(1L, "a", 1.0), Row(2L, "b", null)))
    intercept[IllegalArgumentException] {
      QualityTrainer.train(nullLabel, "text", "y", dim, iters = 1)
    }
    val softLabel = TestSpark.df("doc_id bigint, text string, y double",
      Seq(Row(1L, "a", 0.7)))
    intercept[IllegalArgumentException] {
      QualityTrainer.train(softLabel, "text", "y", dim, iters = 1)
    }
    intercept[IllegalArgumentException] {
      QualityTrainer.train(blank, "text", "y", dim = 0, iters = 1)
    }
  }

  test("saveModel/loadModel round-trips bit-exactly; foreign tables and row-count drift fail fast") {
    val tbl = "graft_qc_model"
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_model")
    try {
      val trained = QualityTrainer.train(corpus(), "text", "y", dim,
        iters = 3, lr = 0.5)
      QualityTrainer.saveModel(spark, trained, tbl, s"$dir/m")
      val back = QualityTrainer.loadModel(spark, tbl)
      assert(back.bias == trained.bias &&
        back.weights.sameElements(trained.weights))
      // scoring with the loaded model is bit-identical
      val a = trained.score(corpus(), "doc_id", "text", ordered = false)
        .collect().map(_.toSeq).toSet
      val b = back.score(corpus(), "doc_id", "text", ordered = false)
        .collect().map(_.toSeq).toSet
      assert(a == b)
      // a table this code did not stamp is refused
      spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('graft.qc.dim')")
      intercept[RuntimeException] { QualityTrainer.loadModel(spark, tbl) }
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("streamed scoring equals batch scoring (projection-only composes with readStream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val trained = QualityTrainer.train(corpus(), "text", "y", dim,
      iters = 2, lr = 0.5)
    val input = MemoryStream[(Long, String)]
    val q = trained.score(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", ordered = false)
      .writeStream.format("memory").queryName("graft_qc_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "good clean prose good"), (2L, "spam junk spam junk"))
      q.processAllAvailable()
      input.addData((3L, null: String))
      q.processAllAvailable()
      val streamed = spark.table("graft_qc_stream").collect()
        .map(_.toSeq).toSet
      val batch = trained.score(
        TestSpark.df("doc_id bigint, text string", Seq(
          Row(1L, "good clean prose good"), Row(2L, "spam junk spam junk"),
          Row(3L, null))),
        "doc_id", "text", ordered = false).collect().map(_.toSeq).toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }
}
