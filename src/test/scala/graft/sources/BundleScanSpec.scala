package graft.sources

import graft.TestSpark
import graft.model._
import graft.project.{Projection, ResourceBuilders}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

import scala.collection.immutable.ListMap

/** Whistle-output/study-ids/IG-zip scans, first-K report, and the
 *  remaining DD-definition builders. */
class BundleScanSpec extends AnyFunSuite {
  import TestSpark.{df, spark}

  test("BundleScan.read explodes each module of the whistle-output doc") {
    val doc =
      """{"patient":[{"resourceType":"Patient","id":"P1"},{"resourceType":"Patient","id":"P2"}],
        |"ddmeta":[{"resourceType":"CodeSystem","id":"CS1","count":2}]}"""
        .stripMargin.replaceAll("\n", "")
    val p = Files.createTempDirectory("graft-bscan").resolve("out.json")
    Files.write(p, doc.getBytes("UTF-8"))
    val out = BundleScan.read(spark, p.toString)
    val rows = out.orderBy("module", "id").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq == Seq(
      ("ddmeta", "CodeSystem", "CS1"),
      ("patient", "Patient", "P1"),
      ("patient", "Patient", "P2")))
    assert(rows.head.getString(3).contains("\"count\":2"))
    // patient-first ordering rank
    val ranks = out.select(col("module"), BundleScan.moduleRank(col("module")))
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ranks == Map("patient" -> 0, "ddmeta" -> 1))
  }

  test("BundleScan.read skips non-array metadata keys and tolerates missing id/resourceType") {
    val doc =
      """{"config":{"missing":["NA"]},
        |"study":{"id":"S1"},
        |"patient":[{"resourceType":"Patient","id":"P1"}],
        |"odd":[{"noType":true}]}""".stripMargin.replaceAll("\n", "")
    val p = Files.createTempDirectory("graft-bscan2").resolve("mixed.json")
    Files.write(p, doc.getBytes("UTF-8"))
    val out = BundleScan.read(spark, p.toString).collect()
    assert(out.map(_.getString(0)).toSet == Set("patient", "odd"))
    val odd = out.find(_.getString(0) == "odd").get
    assert(odd.isNullAt(1) && odd.isNullAt(2))
    assert(odd.getString(3).contains("noType"))
  }

  test("loadFilter restricts by module and resourceType; empty lists pass all") {
    val r = df("module STRING, resourceType STRING", Seq(
      Row("patient", "Patient"), Row("cond", "Condition")))
    assert(BundleScan.loadFilter(r).count() == 2)
    assert(BundleScan.loadFilter(r, modules = Seq("patient")).count() == 1)
    assert(BundleScan.loadFilter(r, resourceTypes = Seq("Condition")).count() == 1)
  }

  test("readStudyIds flattens the nested study/host/type document") {
    val json = """{"study1":{"hostA":{"Patient":["P1","P2"],"Condition":["C1"]}}}"""
    val out = BundleScan.readStudyIds(spark, json).orderBy("resource_type", "id").collect()
    assert(out.map(r => (r.getString(2), r.getString(3))).toSeq ==
      Seq(("Condition", "C1"), ("Patient", "P1"), ("Patient", "P2")))
  }

  test("readIgZip reads json members and honors exclusion substrings") {
    val dir = Files.createTempDirectory("graft-ig")
    val zipPath = dir.resolve("definitions.json.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    Seq("StructureDefinition-a.json" -> """{"id":"a"}""",
        "ValueSet-b.json" -> """{"id":"b"}""",
        "skip-me.json" -> """{"id":"c"}""",
        "readme.txt" -> "not json").foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val out = BundleScan.readIgZip(spark, zipPath.toString, exclusions = Seq("skip-"))
    assert(out.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("StructureDefinition-a.json", "ValueSet-b.json"))
  }

  test("FirstKReport shows first k and the And-N-more overflow") {
    val r = df("msg STRING", (1 to 7).map(i => Row(s"err$i")))
    val lines = FirstKReport(r.orderBy("msg"), 5, _.getString(0))
    assert(lines.length == 6)
    assert(lines.last == "And 2 more.")
    val short = FirstKReport(r.limit(3), 5, _.getString(0))
    assert(short.length == 3)
  }

  private val study = Projection.StudyInfo("S1", "https://s1")
  private def dd = DdStudy("S1", Seq(DdTable("S1", "demo", Seq(
    DdVariable("S1", "demo", "pid"),
    DdVariable("S1", "demo", "sex", description = "Biological sex",
      dataType = DdType.Enumeration, enumerations = ListMap("M" -> "Male", "F" -> "Female")),
    DdVariable("S1", "demo", "age", dataType = DdType.Integer)))))

  test("ddDefinitions builds ObservationDefinitions and an ActivityDefinition per table") {
    val out = ResourceBuilders.ddDefinitions(spark, study, dd).collect()
    val byType = out.groupBy(_.getString(1))
    assert(byType("ObservationDefinition").length == 3)
    assert(byType("ActivityDefinition").length == 1)
    val sexDef = byType("ObservationDefinition")
      .find(_.getString(2) == "S1.demo.sex").get.getString(3)
    assert(sexDef.contains(""""permittedDataType":["CodeableConcept"]"""))
    assert(sexDef.contains(""""validCodedValueSet""""))
    val ageDef = byType("ObservationDefinition")
      .find(_.getString(2) == "S1.demo.age").get.getString(3)
    assert(ageDef.contains(""""permittedDataType":["Quantity"]"""))
    assert(!ageDef.contains("validCodedValueSet"))
    val act = byType("ActivityDefinition").head.getString(3)
    assert(act.contains(""""name":"S1.demo-vars""""))
    assert(act.contains("C0035168"))
    assert(act.contains("S1.demo.sex")) // references each variable's ObsDef
  }

  test("questionnaireResponses: typed answers, numeric parses only, null values omitted") {
    val data = df("pid STRING, sex STRING, age STRING",
      Seq(Row("P1", "M", "12"), Row("P2", "F", "n/a")))
    val out = ResourceBuilders.questionnaireResponses(
      data, study, dd.table("demo").get, harmonyLookup = None)
      .orderBy("id").collect()
    assert(out.length == 2)
    val j1 = out(0).getString(3)
    assert(out(0).getString(2) == "S1.demo.source-data.P1")
    assert(j1.contains(""""status":"completed""""))
    assert(j1.contains(""""linkId":"age","text":"age","answer":[{"valueInteger":12}]"""))
    assert(j1.contains("rl-questionnaire"))
    val j2 = out(1).getString(3)
    // n/a doesn't parse: the age item has no answer array
    assert(j2.contains(""""linkId":"age","text":"age"}"""))
  }
}
