package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the restructuring operators. Embed semantics port the
 *  reference suite (ref: tests/test_embedable.py); pivot and group-nest
 *  semantics pin the behavior of wstlr/extractor.py:48-187, which the
 *  reference leaves untested. */
class RestructureSpec extends AnyFunSuite {
  import TestSpark.df

  // --- NormalizeColumns -------------------------------------------------

  test("NormalizeColumns normalizes headers like the CSV reader does") {
    val in = df("`Subject Id` STRING, `Value (Units)/Test` STRING",
      Seq(Row("S1", "10")))
    assert(NormalizeColumns(in).columns.toSeq == Seq("subject_id", "value_units_test"))
  }

  test("NormalizeColumns rejects collisions instead of silently merging") {
    val in = df("`My Col` STRING, `my col` STRING", Seq(Row("a", "b")))
    val e = intercept[IllegalArgumentException](NormalizeColumns(in))
    assert(e.getMessage.contains("collision"))
  }

  // --- MissingValues / ValueCleaning ------------------------------------

  test("MissingValues nulls the configured sentinels only in targeted columns") {
    val in = df("a STRING, b STRING",
      Seq(Row("NA", "NA"), Row("Not Provided", "x"), Row("", "y"), Row("keep", "z")))
    val out = MissingValues(in, columns = Seq("a")).collect().toSeq
    assert(out == Seq(Row(null, "NA"), Row(null, "x"), Row(null, "y"), Row("keep", "z")))
  }

  test("ValueCleaning collapses semicolon-whitespace and trims") {
    val in = df("v STRING", Seq(Row("  a; b;   c  ")))
    assert(ValueCleaning(in, Seq("v")).collect().head.getString(0) == "a;b;c")
  }

  // --- AggregatorPivot (ref: wstlr/extractor.py:100-187) ----------------

  private val labsDf = df(
    "subject_id STRING, lab_glucose STRING, lab_sodium STRING, other STRING",
    Seq(Row("S1", "99", "140", "x"), Row("S2", "85", null, "y")))

  test("AggregatorPivot folds regex-matched columns into an array<struct> column") {
    val out = AggregatorPivot(labsDf, Map("labs" -> "^lab_"))
    assert(out.columns.toSeq == Seq("subject_id", "other", "labs"))
    val s1 = out.filter(out("subject_id") === "S1").collect().head
    assert(s1.getSeq[Row](2) == Seq(Row("lab_glucose", "99"), Row("lab_sodium", "140")))
  }

  test("AggregatorPivot splitter strips the code prefix; varnameLookup remaps codes and the column") {
    // the DD maps the config's descriptive aggregator name to a varname,
    // and value keys use the POST-substitution name (extractor.py:168-180)
    val out = AggregatorPivot(labsDf, Map("labs" -> "^lab_"),
      aggSplitter = Some("_"),
      varnameLookup = Map("labs" -> "measurements", "measurements:glucose" -> "glu"))
    assert(out.columns.toSeq == Seq("subject_id", "other", "measurements"))
    val s1 = out.filter(out("subject_id") === "S1").collect().head
    assert(s1.getSeq[Row](2) == Seq(Row("glu", "99"), Row("sodium", "140")))
  }

  test("AggregatorPivot codeDetails adds a text field per matched column") {
    val out = AggregatorPivot(labsDf, Map("labs" -> "^lab_"),
      codeDetails = Map("lab_glucose" -> "Serum glucose"))
    val s1 = out.filter(out("subject_id") === "S1").collect().head
    // lab_glucose carries text; lab_sodium (no detail) gets a null text —
    // the array element type must be uniform
    assert(s1.getSeq[Row](2) == Seq(
      Row("lab_glucose", "99", "Serum glucose"),
      Row("lab_sodium", "140", null)))
  }

  test("AggregatorPivot: first matching aggregator wins, classification is ordered") {
    val in = df("id STRING, ab_x STRING, a_y STRING",
      Seq(Row("S1", "1", "2")))
    // both regexes match ab_x; config order decides
    val (standard, agg) = AggregatorPivot.classify(
      AggregatorPivot.compile(Map("first" -> "^ab_", "second" -> "^a")),
      in.columns.toSeq)
    assert(standard == Seq("id"))
    val byName = agg.toMap
    assert(byName.get("first").exists(_.contains("ab_x")) ||
      byName.get("second").exists(_.contains("ab_x"))) // deterministic below
    // Map ordering is insertion order for small maps, so "first" matched it:
    assert(byName("first") == Seq("ab_x"))
    assert(byName("second") == Seq("a_y"))
  }

  test("AggregatorPivot with no aggregators is identity") {
    assert(AggregatorPivot(labsDf, Map.empty).columns.toSeq == labsDf.columns.toSeq)
  }

  // --- GroupByNest (ref: wstlr/extractor.py:48-97) ----------------------

  private val visitsDf = df(
    "subject_id STRING, visit STRING, value STRING",
    Seq(
      Row("S2", "v1", "30"),
      Row("S1", "v1", "10"),
      Row("S1", "v2", "20"),
      Row("S2", "v2", "40")))

  test("GroupByNest nests non-key columns under content, preserving intra-group row order") {
    val out = GroupByNest(visitsDf, "subject_id")
    assert(out.columns.toSeq == Seq("subject_id", "content"))
    val byKey = out.collect().map(r => r.getString(0) -> r.getSeq[Row](1)).toMap
    assert(byKey("S1") == Seq(Row("v1", "10"), Row("v2", "20")))
    assert(byKey("S2") == Seq(Row("v1", "30"), Row("v2", "40")))
  }

  test("GroupByNest ordered=true returns groups in first-seen key order") {
    val out = GroupByNest(visitsDf, "subject_id", ordered = true)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("S2", "S1"))
  }

  test("GroupByNest supports comma-separated composite keys with header normalization") {
    val in = df("`Subject Id` STRING, visit STRING, value STRING",
      Seq(Row("S1", "v1", "10")))
    val out = GroupByNest(NormalizeColumns(in), "Subject Id, visit")
    assert(out.columns.toSeq == Seq("subject_id", "visit", "content"))
    assert(out.collect().head.getSeq[Row](2) == Seq(Row("10")))
  }

  // --- EmbedJoin (ref: tests/test_embedable.py, wstlr/embedable.py) -----

  private val subjects = df("subject_id STRING, arm STRING",
    Seq(Row("S1", "A"), Row("S2", "B"), Row("S3", "A")))
  private val observations = df("subject_id STRING, value STRING",
    Seq(Row("S1", "10"), Row("S1", "20"), Row("S2", "30")))

  test("EmbedJoin returns all matching child rows, tagged with table_name, in child order") {
    val out = EmbedJoin(subjects, observations, "observations", "Subject Id")
    val s1 = out.filter(out("subject_id") === "S1").collect().head
    assert(s1.getSeq[Row](2) == Seq(
      Row("observations", "S1", "10"),
      Row("observations", "S1", "20")))
  }

  test("EmbedJoin fills [] for a parent with no child rows") {
    val out = EmbedJoin(subjects, observations, "observations", "subject_id")
    val s3 = out.filter(out("subject_id") === "S3").collect().head
    assert(s3.getSeq[Row](2) == Seq.empty)
  }

  test("EmbedJoin raises when the join column is missing from the child") {
    val badChild = df("other_col STRING, value STRING", Seq(Row("X", "1")))
    val e = intercept[IllegalArgumentException](
      EmbedJoin(subjects, badChild, "observations", "subject_id"))
    assert(e.getMessage.contains("Unable to join on column name"))
  }

  test("EmbedJoin raises when the join column is missing from the parent") {
    val badParent = df("other STRING", Seq(Row("X")))
    val e = intercept[IllegalArgumentException](
      EmbedJoin(badParent, observations, "observations", "subject_id"))
    assert(e.getMessage.contains("missing join column"))
  }

  test("EmbedJoin supports compound comma-separated keys (project_config.md:79-96)") {
    val parent = df("study STRING, subject_id STRING",
      Seq(Row("A", "S1"), Row("A", "S2"), Row("B", "S1")))
    val child = df("study STRING, subject_id STRING, v STRING",
      Seq(Row("A", "S1", "x"), Row("B", "S1", "y")))
    val out = EmbedJoin(parent, child, "kids", "Study, Subject Id")
    val byKey = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getSeq[Row](2)).toMap
    assert(byKey(("A", "S1")).map(_.getString(3)) == Seq("x"))
    assert(byKey(("B", "S1")).map(_.getString(3)) == Seq("y"))
    assert(byKey(("A", "S2")).isEmpty)
    // row-count conservation: every child row lands in exactly one parent
    assert(byKey.values.map(_.size).sum == 2)
  }

  test("EmbedJoin handles column names needing backtick quoting in the nested struct") {
    val parent = df("`select` STRING", Seq(Row("S1")))
    val child = df("`select` STRING, `order` STRING", Seq(Row("S1", "x")))
    val out = EmbedJoin(parent, child, "kids", "select")
    assert(out.filter(out("select") === "S1").collect().head.getSeq[Row](1)
      == Seq(Row("kids", "S1", "x")))
  }

  test("EmbedJoin salted path is result-identical to the plain join; plan carries the salt") {
    val plain = EmbedJoin(subjects, observations, "observations", "subject_id")
    val salted = EmbedJoin(subjects, observations, "observations", "subject_id",
      saltBuckets = 4)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    def byKey(dfr: org.apache.spark.sql.DataFrame) =
      dfr.collect().map(r => r.getString(0) -> r.getSeq[Row](2)).toMap
    assert(byKey(salted) == byKey(plain))
    // the salt key really participates in the join (then drops from output)
    assert(salted.queryExecution.optimizedPlan.toString.contains("_salt"))
    assert(!salted.columns.contains("_salt"))
    // broadcast + salt is a contradiction: broadcast has no skew funnel
    intercept[IllegalArgumentException](
      EmbedJoin(subjects, observations, "observations", "subject_id",
        hintBroadcast = true, saltBuckets = 4))
  }

  // --- DisplayColumns / RunLengthGroup ----------------------------------

  test("DisplayJoin adds <col>_display via a broadcast dim join, null on miss") {
    val data = df("code INT", Seq(Row(1), Row(2), Row(9)))
    val dim = df("k INT, name STRING", Seq(Row(1, "One"), Row(2, "Two")))
    val out = DisplayJoin(data, dim, "code", "k", "name").orderBy("code")
    assert(out.columns.toSeq == Seq("code", "code_display"))
    assert(out.collect().toSeq == Seq(Row(1, "One"), Row(2, "Two"), Row(9, null)))
  }

  test("Column twins of the Naming helpers match the driver-side forms") {
    import graft.functions.WhistlerFunctions
    val in = df("s STRING", Seq(Row("  My Column (x)/Y  "), Row("a;   b"), Row("YES")))
    val r = in.select(
      WhistlerFunctions.fixFieldName(col("s")),
      WhistlerFunctions.cleanValues(col("s")),
      WhistlerFunctions.evaluateBool(col("s"))).collect()
    assert(r(0).getString(0) == graft.model.Naming.fixFieldName("  My Column (x)/Y  "))
    assert(r(1).getString(1) == graft.model.Naming.cleanValues("a;   b"))
    assert(r(2).getBoolean(2) == graft.model.Naming.evaluateBool("YES"))
  }

  test("DisplayColumns adds <col>_display from the code->display map, null on miss") {
    val in = df("code STRING", Seq(Row("M"), Row("F"), Row("X")))
    val out = DisplayColumns(in, Map("M" -> "Male", "F" -> "Female"), Seq("code"))
    assert(out.collect().toSeq == Seq(
      Row("M", "Male"), Row("F", "Female"), Row("X", null)))
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets")
    val left = spark.range(1000).selectExpr("id AS k", "id * 2 AS lv")
    val right = spark.range(500).selectExpr("id AS k", "id * 3 AS rv")
    Bucketing.writeBucketed(left, "bkt_left", s"$dir/left", Seq("k"), buckets = 8)
    Bucketing.writeBucketed(right, "bkt_right", s"$dir/right", Seq("k"), buckets = 8)
    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(joined.count() == 500)
    spark.sql("DROP TABLE bkt_left")
    spark.sql("DROP TABLE bkt_right")
  }

  test("SkewJoin.saltedJoin returns exactly the plain join's rows") {
    // a hot key (k=1) plus normal keys; salted result must be identical
    val left = df("k INT, lv STRING",
      (1 to 50).map(i => Row(1, s"hot$i")) ++ Seq(Row(2, "a"), Row(3, "b"), Row(9, "miss")))
    val right = df("k INT, rv STRING", Seq(Row(1, "R1"), Row(2, "R2"), Row(3, "R3")))
    def sortedRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val plain = left.join(right, Seq("k"))
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), saltBuckets = 4)
    assert(sortedRows(salted) == sortedRows(plain))
    // left joins preserve the unmatched row too
    val plainLeft = left.join(right, Seq("k"), "left")
    val saltedLeft = SkewJoin.saltedJoin(left, right, Seq("k"), "left", saltBuckets = 4)
    assert(sortedRows(saltedLeft) == sortedRows(plainLeft))
  }

  test("RunLengthGroup assigns a new run id whenever the code changes in order") {
    val in = df("pos INT, code STRING",
      Seq(Row(1, "a"), Row(2, "a"), Row(3, "b"), Row(4, "a"), Row(5, "a")))
    val out = RunLengthGroup(in, "code", Seq("pos")).orderBy("pos")
    assert(out.collect().map(_.getLong(2)).toSeq == Seq(1L, 1L, 2L, 3L, 3L))
  }
}
