package graft.streaming

import graft.TestSpark
import graft.llm.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Incremental per-stratum sampling laws:
 *
 *  - UNION LAW: after merging batches B1..Bn (any boundaries), the
 *    table equals topKPerStratum(B1 ∪ … ∪ Bn) — min-k is a
 *    semilattice;
 *  - the streaming sink maintains the same table through real
 *    micro-batches;
 *  - replay idempotence: re-merging a delivered batch changes nothing;
 *  - knob drift (salt or k) is refused by the stamps.
 */
class StreamingSampleSpec extends AnyFunSuite {
  import TestSpark.spark

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "source")

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_ssample").resolve(name).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("union law: three arbitrary batch boundaries converge to the one-shot sample; replay changes nothing") {
    val tbl = "graft_ssample_union"
    try {
      val expect = rows(Sampling.topKPerStratum(docs, "doc_id", "source",
        k = 5, salt = "ss"))
      Seq(0, 1, 2).foreach { m =>
        StreamingSample.mergeBatch(docs.filter(pmod(col("doc_id"), lit(3)) === m),
          "doc_id", "source", k = 5, salt = "ss", tbl, tmp(tbl))
        ()
      }
      assert(rows(StreamingSample.sample(spark, tbl, 5, "ss")) == expect,
        "batch merges must equal the one-shot batch sample")
      // replay: merge batch 1 again — idempotent
      StreamingSample.mergeBatch(docs.filter(pmod(col("doc_id"), lit(3)) === 1),
        "doc_id", "source", k = 5, salt = "ss", tbl, tmp(tbl))
      assert(rows(StreamingSample.sample(spark, tbl, 5, "ss")) == expect,
        "a replayed batch must not change the sample")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("streaming sink: micro-batches maintain the table to the batch law") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val tbl = "graft_ssample_stream"
    try {
      val data = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val (b1, b2) = data.splitAt(data.length / 2)
      val input = MemoryStream[(Long, String)]
      val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamingSample.sink(
          input.toDF().toDF("doc_id", "source"), "doc_id", "source",
          k = 5, salt = "ss2", tbl, tmp(tbl),
          onBatch = (n, _) => counts.synchronized { counts += n; () })
        .option("checkpointLocation", tmp("chk"))
        .start()
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val expect = rows(Sampling.topKPerStratum(docs, "doc_id", "source",
        k = 5, salt = "ss2"))
      assert(rows(StreamingSample.sample(spark, tbl, 5, "ss2")) == expect)
      assert(counts.nonEmpty && counts.last == expect.size)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("a crash between overwrite and re-stamp does not wedge the replay") {
    val tbl = "graft_ssample_crash"
    try {
      StreamingSample.mergeBatch(docs, "doc_id", "source", k = 5,
        salt = "ss4", tbl, tmp(tbl))
      // simulate the crash window: table committed, stamps never written
      spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES " +
        "('graft.sample.salt', 'graft.sample.k')")
      // the replayed merge must go through (our own committed data) and
      // restore the stamps; the semilattice law keeps the result exact
      StreamingSample.mergeBatch(docs, "doc_id", "source", k = 5,
        salt = "ss4", tbl, tmp(tbl))
      val expect = rows(Sampling.topKPerStratum(docs, "doc_id", "source",
        k = 5, salt = "ss4"))
      assert(rows(StreamingSample.sample(spark, tbl, 5, "ss4")) == expect)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("knob drift is refused by the stamps") {
    val tbl = "graft_ssample_drift"
    try {
      StreamingSample.mergeBatch(docs, "doc_id", "source", k = 5,
        salt = "ss3", tbl, tmp(tbl))
      val e1 = intercept[Exception] {
        StreamingSample.mergeBatch(docs, "doc_id", "source", k = 6,
          salt = "ss3", tbl, tmp(tbl))
      }
      assert(e1.getMessage.contains("k=5"))
      val e2 = intercept[Exception] {
        StreamingSample.sample(spark, tbl, 5, "other")
      }
      assert(e2.getMessage.contains("salt=ss3"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
