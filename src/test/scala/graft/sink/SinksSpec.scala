package graft.sink

import graft.TestSpark
import graft.inspect.{DuplicateIdentifiers, ModuleSummary}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bundle/study-ids sinks and inspection aggregates
 *  (ref: wstlr/bundle.py, studyids.py, inspector.py, module_summary.py,
 *  tests/test_studyids.py, tests/test_module_summary.py). */
class SinksSpec extends AnyFunSuite {
  import TestSpark.{df, spark}

  private val resources = df(
    "module STRING, resourceType STRING, id STRING, resource STRING",
    Seq(
      Row("patient", "Patient", "P1", """{"resourceType":"Patient","id":"P1"}"""),
      Row("patient", "Patient", "P2", """{"resourceType":"Patient","id":"P2"}"""),
      Row("patient", "Patient", "P2", """{"resourceType":"Patient","id":"P2"}"""), // dup fullUrl
      Row("condition", "Condition", "C1", """{"resourceType":"Condition","id":"C1"}""")))

  test("bundle entries: PUT verb with id, fullUrl built from service url, dedup per module") {
    val e = BundleSink.entries(resources, "http://fhir.example", BundleSink.Put)
    val rows = e.orderBy("fullUrl").collect()
    assert(rows.length == 3) // P2 dup dropped
    val p1 = rows.find(_.getString(3).endsWith("Patient/P1")).get
    assert(p1.getString(3) == "http://fhir.example/Patient/P1")
    assert(p1.getString(4).contains(""""request":{"method":"PUT","url":"Patient/P1"}"""))
    assert(p1.getString(4).contains(""""resource":{"resourceType":"Patient","id":"P1"}"""))
  }

  test("bundle chunking: new bundle per module and per maxRecords") {
    val many = spark.range(25).selectExpr(
      "'patient' AS module", "'Patient' AS resourceType",
      "concat('P', lpad(cast(id as string), 3, '0')) AS id",
      """concat('{"id":"', id, '"}') AS resource""")
    val e = BundleSink.entries(many, "http://svc")
    val b = BundleSink.bundles(e, "graft-test", maxRecords = 10).orderBy("module", "chunk").collect()
    assert(b.map(r => (r.getInt(1), r.getLong(2))).toSeq == Seq((0, 10L), (1, 10L), (2, 5L)))
    val doc = b.head.getString(3)
    assert(doc.startsWith("""{"resourceType":"Bundle","id":"graft-test","type":"transaction","entry":["""))
    assert(doc.endsWith("]}"))
    // each bundle parses as one JSON document
    import spark.implicits._
    val parsed = spark.read.json(Seq(doc).toDS)
    assert(parsed.select(explode(col("entry"))).count() == 10)
  }

  test("bundle write produces one file per (module, chunk)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bundles").toString
    val e = BundleSink.entries(resources, "http://svc")
    BundleSink.write(BundleSink.bundles(e, "bid"), dir)
    val files = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(files.toSeq == Seq("module=condition", "module=patient"))
  }

  test("bundle write at scale: >15k resources split into <=15,000-record files (bundle.py:84)") {
    // real written files at the reference's actual chunk size: 34k
    // resources over two modules -> ceil(17k/15k) = 2 chunk dirs each,
    // every bundle document carrying <= 15,000 entries
    val dir = java.nio.file.Files.createTempDirectory("graft-bundles-15k").toString
    val many = spark.range(34000).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'patient' ELSE 'specimen' END AS module",
      "'Patient' AS resourceType",
      "concat('P', lpad(cast(id as string), 6, '0')) AS id",
      """concat('{"id":"', id, '"}') AS resource""")
    val e = BundleSink.entries(many, "http://svc")
    BundleSink.write(BundleSink.bundles(e, "bid"), dir) // default MaxRecords = 15000
    val chunks = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .flatMap(m => m.listFiles.filter(_.isDirectory).map(c => (m.getName, c.getName)))
      .sorted.toSeq
    assert(chunks == Seq(
      ("module=patient", "chunk=0"), ("module=patient", "chunk=1"),
      ("module=specimen", "chunk=0"), ("module=specimen", "chunk=1")))
    // per-file record bound, counted from the written bytes (one
    // "fullUrl" per entry), and totals intact: 17k = 15,000 + 2,000
    val perChunk = chunks.map { case (m, c) =>
      val text = new java.io.File(s"$dir/$m/$c").listFiles
        .filter(_.getName.endsWith(".txt"))
        .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
      (m, c, "\"fullUrl\"".r.findAllIn(text).length)
    }
    perChunk.foreach { case (m, c, n) =>
      assert(n <= BundleSink.MaxRecords, s"$m/$c has $n records")
    }
    assert(perChunk.map(_._3).sum == 34000)
    assert(perChunk.collect { case (_, "chunk=0", n) => n }.toSeq == Seq(15000, 15000))
  }

  test("maxRecordsPerFile is the unbounded-export sibling: no window, same bound") {
    // the documented scale path for exports where a per-module total
    // order (assignChunks' window) is unnecessary: Spark's own
    // maxRecordsPerFile bounds file size with zero shuffle
    val dir = java.nio.file.Files.createTempDirectory("graft-mrpf").toString
    spark.range(34000).selectExpr("cast(id as string) AS id")
      .repartition(2)
      .write.option("maxRecordsPerFile", BundleSink.MaxRecords)
      .mode("overwrite").parquet(dir)
    val counts = spark.read.parquet(dir)
      .select(input_file_name().as("f")).groupBy("f").count()
      .collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= BundleSink.MaxRecords))
    assert(counts.sum == 34000)
  }

  test("study-ids aggregation dedups and sorts per resourceType") {
    val in = df("t STRING, id STRING", Seq(
      Row("Patient", "B"), Row("Patient", "A"), Row("Patient", "B"),
      Row("Condition", "Z")))
    val out = StudyIdsSink.sortedIdSets(in, "t", "id").collect()
    assert(out.map(r => r.getString(0) -> r.getSeq[String](1)).toMap ==
      Map("Patient" -> Seq("A", "B"), "Condition" -> Seq("Z")))
  }

  test("study-ids json nests study/host/type and merges, not overwrites") {
    val in = df("t STRING, id STRING", Seq(Row("Patient", "P1")))
    val sets = StudyIdsSink.sortedIdSets(in, "t", "id")
    val existing = """{"other_study":{"hostA":{"Patient":["X"]}}}"""
    val json = StudyIdsSink.toJson(sets, "my_study", "hostA", Some(existing))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    assert(root.get("other_study").get("hostA").get("Patient").get(0).asText == "X")
    assert(root.get("my_study").get("hostA").get("Patient").get(0).asText == "P1")
  }

  test("duplicate-identifier detection flags repeats per resourceType only") {
    val in = df("t STRING, system STRING, value STRING", Seq(
      Row("Patient", "s", "1"), Row("Patient", "s", "1"),
      Row("Condition", "s", "1"), // same idval, different type: not a dup
      Row("Patient", "s", "2")))
    val idval = concat_ws(":", col("system"), col("value"))
    val dups = DuplicateIdentifiers(in, "t", idval).collect()
    assert(dups.length == 1)
    assert(dups.head.getString(0) == "Patient" && dups.head.getString(1) == "s:1")
    assert(!DuplicateIdentifiers.isClean(in, "t", idval))
  }

  test("module summary counts per module/type with share of type total") {
    val in = df("module STRING, t STRING", Seq(
      Row("patient", "Patient"), Row("patient", "Patient"),
      Row("extra", "Patient"), Row("condition", "Condition")))
    val out = ModuleSummary(in, "module", "t").collect()
    val byKey = out.map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(byKey(("patient", "Patient")) == ((2L, 66.67)))
    assert(byKey(("extra", "Patient")) == ((1L, 33.33)))
    assert(byKey(("condition", "Condition")) == ((1L, 100.0)))
  }

  test("flattenForProjection explodes grouped content and embedded arrays") {
    import graft.model.TableType
    import graft.project.ResourceBuilders
    val grouped = df("subject_id STRING, content ARRAY<STRUCT<visit: STRING, value: STRING>>",
      Seq(Row("S1", Seq(Row("v1", "10"), Row("v2", "20")))))
    val flatG = ResourceBuilders.flattenForProjection(grouped, TableType.Grouped)
    assert(flatG.columns.toSeq == Seq("subject_id", "visit", "value"))
    assert(flatG.count() == 2)

    val parent = df(
      "subject_id STRING, labs ARRAY<STRUCT<table_name: STRING, subject_id: STRING, v: STRING>>",
      Seq(Row("S1", Seq(Row("labs", "S1", "9")))))
    val flatE = ResourceBuilders.flattenForProjection(parent, TableType.Embedded, "labs")
    assert(flatE.columns.toSeq == Seq("subject_id", "v"))
    assert(flatE.collect().head.getString(1) == "9")
  }

  test("Consumers.inspect fans one cached pass into summary + checks") {
    import graft.inspect.Consumers
    val r = df("module STRING, resourceType STRING, id STRING, resource STRING", Seq(
      Row("patient", "Patient", "P1",
        """{"resourceType":"Patient","identifier":[{"system":"s","value":"1"}]}"""),
      Row("patient", "Patient", "P2",
        """{"resourceType":"Patient","identifier":[{"system":"s","value":"1"}]}"""), // dup
      Row("harmony", "ConceptMap", "CM", """{"resourceType":"ConceptMap"}"""),        // exempt
      Row("odd", "Thing", "T1", """{"no_type":true}""")))
    val report = Consumers.inspect(r)
    assert(report.moduleSummary.count() == 3)
    assert(report.duplicateIdentifiers.collect().map(_.getString(1)).toSeq == Seq("s:1"))
    assert(report.missingResourceType == 1L)
    assert(report.missingIdentifier == 1L) // Thing lacks one; ConceptMap exempt
    TestSpark.spark.catalog.clearCache(); graft.CacheScope.releaseSession()
  }

  test("DdProfiler: histogram, try-float min/max, distinct-count value gate") {
    import graft.inspect.DdProfiler
    val in = df("status STRING, score STRING", Seq(
      Row("open", "1.5"), Row("open", "n/a"), Row("closed", "3")))
    val hist = DdProfiler.histogram(in, Seq("status")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(hist == Map("open" -> 2L, "closed" -> 1L))
    val prof = DdProfiler.profile(in, Seq("status", "score"), maxValues = 50).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof("score").getString(1) == "1.5")  // vmin
    assert(prof("score").getString(2) == "3.0")  // vmax
    assert(prof("status").getString(1) == "")    // non-numeric -> blank
    assert(prof("status").getString(4) == "closed;open")
    // gate: over the cutoff the list is withheld
    val gated = DdProfiler.profile(in, Seq("score"), maxValues = 2).collect().head
    assert(gated.isNullAt(4))
  }

  test("DdProfiler.toDdCsv drafts a DD the CSV parser reads back") {
    import graft.inspect.DdProfiler
    val in = df("status STRING, score STRING", Seq(
      Row("open", "1.5"), Row("closed", "3")))
    val csv = DdProfiler.toDdCsv(
      DdProfiler.profile(in, Seq("status", "score")).collect().toSeq)
    val p = java.nio.file.Files.createTempDirectory("graft-builddd").resolve("draft.csv")
    java.nio.file.Files.write(p, csv.getBytes("UTF-8"))
    val table = graft.sources.DdCsv.parse(TestSpark.spark, p.toString, "S")
    assert(table.variables.map(_.varName).toSet == Set("status", "score"))
    assert(table.variable("score").get.dataType == graft.model.DdType.Number)
    assert(table.variable("status").get.enumerations.keySet == Set("closed", "open"))
  }

  test("module summary honors a resource-type restriction (test_module_summary.py)") {
    val in = df("module STRING, t STRING", Seq(
      Row("m1", "Patient"), Row("m1", "Observation")))
    val out = ModuleSummary(in, "module", "t", resourceTypes = Seq("Patient")).collect()
    assert(out.length == 1 && out.head.getString(1) == "Patient")
  }
}
