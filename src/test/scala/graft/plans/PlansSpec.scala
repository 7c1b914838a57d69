package graft.plans

import graft.TestSpark
import graft.llm.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expression layer: LongArrayDot + SQL registration. */
class PlansSpec extends AnyFunSuite {
  import TestSpark.{df, spark}

  private val schema = "id BIGINT, a ARRAY<BIGINT>, b ARRAY<BIGINT>"

  /** The interpreted higher-order fold LongArrayDot replaces — kept here
   *  as the executable spec (it pads the shorter array with null, so the
   *  equivalence tests use equal lengths; prefix semantics are pinned
   *  separately against the typed-twin behavior). */
  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("LongArrayDot matches the aggregate(zip_with) fold on equal-length arrays") {
    val rows = (1 to 50).map { i =>
      Row(i.toLong,
        Seq.tabulate(8)(j => (i * 31 + j * 7 - 40).toLong),
        Seq.tabulate(8)(j => (j * 13 - i * 3 + 5).toLong))
    }
    val in = df(schema, rows)
    val out = in.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      foldDot(col("a"), col("b")).as("fold")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("LongArrayDot: common-prefix semantics, null array -> null, empty -> 0") {
    val in = df(schema, Seq(
      Row(1L, Seq(2L, 3L, 4L), Seq(10L, 100L)), // prefix: 2*10 + 3*100
      Row(2L, null, Seq(1L, 2L)),
      Row(3L, Seq(1L, 2L), null),
      Row(4L, Seq.empty[Long], Seq(5L))))
    val out = in.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 320L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    assert(out(3).getLong(1) == 0L)
  }

  test("LongArrayDot executes inside WholeStageCodegen (not interpreted)") {
    val in = df(schema, Seq(Row(1L, Seq(1L, 2L), Seq(3L, 4L))))
    val q = in.select(Similarity.dot(col("a"), col("b")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen span in the compact plan form
    assert(plan.contains("*(1) Project [graft_dot("))
    // the fold form would show as higher-order `aggregate(...)` in the plan
    assert(!plan.contains("aggregate("))
    assert(q.collect().head.getLong(0) == 11L)
  }

  test("LongArrayDot property: matches BigInt reference over the common prefix, symmetric") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def evalDot(a: Array[Long], b: Array[Long]): Long =
      LongArrayDot(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType))).eval(null).asInstanceOf[Long]
    // |x| <= 1e6, length <= 64: products <= 1e12, sums <= 64e12 — no overflow,
    // so the BigInt reference must agree exactly
    val arr: Gen[Array[Long]] =
      Gen.choose(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-1000000L, 1000000L)).map(_.toArray))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(arr, arr) { (a, b) =>
        val n = math.min(a.length, b.length)
        val ref = (0 until n).map(i => BigInt(a(i)) * BigInt(b(i))).sum
        BigInt(evalDot(a, b)) == ref && evalDot(a, b) == evalDot(b, a)
      })
    assert(res.passed, res.status.toString)
  }

  test("graft_dot registers as a SQL function via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()
    assert(r.head.getLong(0) == 32L)
  }

  // ---- HexHamming64 ------------------------------------------------

  test("HexHamming64 matches the nibble tree and the JVM twin on real signatures") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = graft.llm.SimHashSignatures(docs, "doc_id", "text", ordered = false)
      .filter(col("simhash").isNotNull)
    val paired = sigs.select(col("simhash").as("sa"),
      reverse(col("simhash")).as("sb"))
    val rows = paired.select(
      graft.llm.SimHashNearDup.hammingExpr(col("sa"), col("sb")).as("native"),
      graft.llm.SimHashNearDup.nibbleHammingExpr(col("sa"), col("sb")).as("tree"),
      col("sa"), col("sb")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"native != nibble tree on ${r.getString(2)}")
      assert(r.getLong(0) ==
        graft.llm.SimHashNearDup.hammingJvm(r.getString(2), r.getString(3)))
    }
  }

  test("HexHamming64: identical -> 0, complement -> 64, malformed -> null") {
    val in = df("id BIGINT, a STRING, b STRING", Seq(
      Row(1L, "0123456789abcdef", "0123456789abcdef"),
      Row(2L, "0000000000000000", "ffffffffffffffff"),
      Row(3L, "0123456789ABCDEF", "0123456789abcdef"), // case-insensitive
      Row(4L, "short", "0123456789abcdef"),
      Row(5L, "0123456789abcdeg", "0123456789abcdef"), // non-hex char
      Row(6L, null, "0123456789abcdef")))
    val out = in.select(col("id"),
        graft.llm.SimHashNearDup.hammingExpr(col("a"), col("b")).as("h"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 0L)
    assert(out(1).getLong(1) == 64L)
    assert(out(2).getLong(1) == 0L)
    assert(out(3).isNullAt(1) && out(4).isNullAt(1) && out(5).isNullAt(1))
  }

  test("HexHamming64 executes inside WholeStageCodegen and registers as SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_hamming64('0000000000000000', '0000000000000003') AS h").collect()
    assert(r.head.getLong(0) == 2L)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.llm.SimHashSignatures(docs, "doc_id", "text", ordered = false)
      .select(graft.llm.SimHashNearDup.hammingExpr(
        col("simhash"), reverse(col("simhash"))).as("h"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen span in the compact plan form
    assert(plan.linesIterator.exists(l =>
      l.contains("Project [graft_hamming64(") && l.trim.startsWith("*(")),
      s"expected the hamming projection inside a codegen span:\n$plan")
  }
}
