package graft.llm

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Incremental decontamination laws — the pq21/pq44 discipline applied
 * to pq25: the eval set's shingles persist as a bucketed index, corpus
 * batches audit against it one at a time, and a tiny eval-sized
 * matched-state table accumulates hits, so the audit NEVER rescans
 * earlier batches.
 *
 *  1. ACCUMULATION LAW: after auditing B1..Bn, containmentState ≡
 *     containment(B1 ∪ ... ∪ Bn) — schema, rows, rounding, spine.
 *  2. REPLAY: re-auditing a batch appends nothing.
 *  3. GROWING EVAL SETS: appended docs join the audit from the next
 *     batch on.
 *  4. PLAN: the audit join is exchange-free above the bucketed
 *     eval-index scan — only batch-derived shingles shuffle.
 */
class IncrementalDecontamSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planSession(buckets: Int): SparkSession = {
    val s2 = TestSpark.spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", buckets.toString)
    s2
  }

  private def tmpPath(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_idec").resolve(name).toString

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSeq.sortBy(_.mkString("|"))

  private def reachesBucketedScan(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
    case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
    case other => other.children.exists(reachesBucketedScan)
  }

  test("accumulation law: batched audits reproduce whole-corpus containment exactly; replays append nothing; eval appends join next batch; plan exchange-free") {
    val s2 = planSession(buckets = 8)
    val d = s2.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    // the pq25 shape: verbatim copies (containment 1.0), fresh text
    // (0.0), mixed tails (between)
    val idstr = col("doc_id").cast("string")
    val eval = d.filter(col("doc_id") < 10)
      .select((col("doc_id") + 50000).as("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") >= 30 && col("doc_id") < 40)
        .select((col("doc_id") + 60000).as("doc_id"),
          concat(lit("n"), idstr, lit("a n"), idstr, lit("b")).as("text")))
    val b1 = d.filter(col("doc_id") % 2 === 0)
    val b2 = d.filter(col("doc_id") % 2 === 1)
    val tbl = "graft_idec_eval"
    val mtbl = "graft_idec_matched"
    try {
      Decontamination.saveEvalShingleIndex(eval, "doc_id", "text",
        tbl, tmpPath(tbl), shingleN = 3, buckets = 8)

      // audit batch 1: state == containment over b1 alone
      val n1 = Decontamination.auditBatch(b1, "doc_id", "text",
        tbl, mtbl, tmpPath(mtbl))
      assert(n1 > 0L, "batch 1 must hit the copied eval docs")
      assert(sortedRows(Decontamination.containmentState(s2, tbl, mtbl,
          ordered = false)) ==
        sortedRows(Decontamination.containment(b1, eval, "doc_id", "text",
          shingleN = 3, ordered = false)),
        "state after B1 must equal containment(B1)")

      // audit batch 2: state == containment over the FULL corpus —
      // without ever rescanning batch 1
      Decontamination.auditBatch(b2, "doc_id", "text", tbl, mtbl, tmpPath(mtbl))
      assert(sortedRows(Decontamination.containmentState(s2, tbl, mtbl,
          ordered = false)) ==
        sortedRows(Decontamination.containment(d, eval, "doc_id", "text",
          shingleN = 3, ordered = false)),
        "state after B1+B2 must equal containment(B1 ∪ B2)")

      // replay: a re-audited batch appends zero pairs
      assert(Decontamination.auditBatch(b2, "doc_id", "text",
        tbl, mtbl, tmpPath(mtbl)) == 0L)

      // growing eval set: a new doc (verbatim copy of doc 20) joins
      // the audit from the NEXT batch on — b1's re-audit now matches
      // it (its shingles were never in the state)
      val newDoc = d.filter(col("doc_id") === 20)
        .select((col("doc_id") + 90000).as("doc_id"), col("text"))
      Decontamination.appendEvalDocs(newDoc, "doc_id", "text", tbl)
      val state0 = Decontamination.containmentState(s2, tbl, mtbl,
        ordered = false).filter(col("doc_id") === 90020L).collect()
      assert(state0.head.getDouble(3) == 0.0,
        "a just-appended doc has no matches yet")
      assert(Decontamination.auditBatch(b1, "doc_id", "text",
        tbl, mtbl, tmpPath(mtbl)) > 0L,
        "the new doc's shingles are new state — the re-audit matches them")
      val state1 = Decontamination.containmentState(s2, tbl, mtbl,
        ordered = false).filter(col("doc_id") === 90020L).collect()
      assert(state1.head.getDouble(3) == 1.0,
        "a verbatim copy reaches containment 1.0 once its batch is audited")

      // plan pin: the audit join shuffles ONLY the batch side — no
      // shuffle exchange sits between the bucketed eval-index scan and
      // the semi-join (the classify discipline)
      val batchSh = TextOps.shingleIndex(b2, "doc_id", "text", 3)
        .select("_sh").distinct()
      val hits = s2.table(tbl).filter(col("_sh").isNotNull)
        .join(batchSh, Seq("_sh"), "left_semi")
      val shuffles = hits.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.children.exists(reachesBucketedScan) => e
      }
      assert(shuffles.isEmpty,
        s"audit join re-shuffles the eval index:\n${hits.queryExecution.executedPlan}")

      // a table without the stamp refuses the audit
      s2.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('graft.shingleN')")
      val err = intercept[IllegalArgumentException] {
        Decontamination.auditBatch(b1, "doc_id", "text", tbl, mtbl, tmpPath(mtbl))
      }
      assert(err.getMessage.contains("graft.shingleN"))
    } finally Seq(tbl, mtbl).foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("broadcast containment filter ≡ drop-id anti-join (rounded inclusive boundary, shingle-less and null rows kept); annotation twin ≡ gate join; filter plan is exchange-free") {
    val s2 = planSession(buckets = 8)
    import s2.implicits._
    val tbl = "graft_test_bcfilter_eval"
    val mtbl = "graft_test_bcfilter_matched" // unused, reserved name hygiene
    try {
      // eval doc "a b c d" at shingleN=3 → keys {"a b c", "b c d"}
      val eval = Seq((50000L, "a b c d")).toDF("doc_id", "text")
      Decontamination.saveEvalShingleIndex(eval, "doc_id", "text",
        tbl, tmpPath(tbl), shingleN = 3, buckets = 8)
      val batch = Seq[(java.lang.Long, String)](
        (1L, "a b c d"),       // 2/2 matched → 1.0, drops
        (2L, "a b c d e"),     // 2/3 matched → raw 0.66667 < 0.667 but
                               // ROUND3 = 0.667 ≥ 0.667 — must DROP
                               // (pins the rounded-inclusive decision)
        (3L, "x y z w"),       // 0 matched → keeps
        (4L, "a b"),           // too short to shingle → keeps
        (5L, null),            // null text → keeps
        (null, "a b c d")      // null id: filter drops it (text fully
                               // contained); gate annotation marks it
                               // clean with null stats (left-join shape)
      ).toDF("doc_id", "text")
      val thr = 0.667
      val filtered = Decontamination.containmentFilterAgainstIndex(
        batch, "text", tbl, thr)
      val viaAnti = batch.join(
        Decontamination.containmentDropIdsAgainstIndex(
          batch.filter(col("doc_id").isNotNull), "doc_id", "text", tbl, thr)
          .select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      // the anti-join form can't see the null-id row's drop (null never
      // joins); compare on the non-null-id rows and pin the null-id row
      // separately against the filter's per-row semantics
      assert(sortedRows(filtered.filter(col("doc_id").isNotNull)) ==
        sortedRows(viaAnti.filter(col("doc_id").isNotNull)))
      assert(sortedRows(filtered.filter(col("doc_id").isNotNull))
        .map(_.head) == Seq(3L, 4L, 5L).map(x => x: Any).sortBy(_.toString))
      assert(filtered.filter(col("doc_id").isNull).count() == 0L,
        "a fully-contained null-id row drops under the per-row filter")

      // zero-exchange pin: the broadcast filter never shuffles
      val exchanges = filtered.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"broadcast containment filter shuffles:\n${filtered.queryExecution.executedPlan}")

      // annotation twin ≡ the old per-doc-aggregate + spine + id join
      val annotated = Decontamination.annotateContainmentAgainstIndex(
        batch, "doc_id", "text", tbl, thr)
      val gate = Decontamination.containmentAgainstIndex(
          batch.filter(col("doc_id").isNotNull), "doc_id", "text", tbl,
          ordered = false)
        .withColumnRenamed("doc_id", "_gid")
      val oldForm = batch
        .join(gate, col("doc_id") === col("_gid"), "left")
        .drop("_gid")
        .withColumn("status",
          when(col("containment") >= thr, lit("contaminated"))
            .otherwise(lit("clean")))
      assert(annotated.columns.toSeq == oldForm.columns.toSeq)
      assert(sortedRows(annotated) == sortedRows(oldForm))
    } finally Seq(tbl, mtbl).foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
