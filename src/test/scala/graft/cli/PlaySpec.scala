package graft.cli

import graft.TestSpark
import graft.harmony.Harmony
import graft.project.{Projection, ResourceBuilders}
import graft.sink.{IdCacheStore, InvalidReferencesWriter}
import graft.sources.ConfigReader
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Play orchestrator + id-cache store + invalid-references writer +
 *  harmony ConceptMap resource. */
class PlaySpec extends AnyFunSuite {
  import TestSpark.{df, spark}

  private def write(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))

  private def fixture(): (Path, String) = {
    val dir = Files.createTempDirectory("graft-play")
    write(dir, "demographics.csv", "Subject Id,Sex\nS1,M\nS2,F\n")
    write(dir, "demographics_dd.csv",
      """variable_name,description,data_type,enumerations
        |Subject Id,Participant,string,
        |Sex,Biological sex,enumeration,M=Male;F=Female
        |""".stripMargin)
    write(dir, "harmony.csv",
      """local code,text,table_name,parent_varname,local code system,code,display,code system
        |M,Male,demographics,sex,sex,male,Male,http://hl7.org/fhir/administrative-gender
        |F,Female,demographics,sex,sex,female,Female,http://hl7.org/fhir/administrative-gender
        |""".stripMargin)
    val config =
      """{"study_id":"PFIX","identifier_prefix":"https://pfix","dataset":{
        |"demographics":{"filename":"demographics.csv",
        |  "data_dictionary":{"filename":"demographics_dd.csv"},
        |  "code_harmonization":"harmony.csv"}}}""".stripMargin
    (dir, config)
  }

  test("Play.run: DD catalog, always-rebuilt ConceptMap, gated document write") {
    val (dir, configJson) = fixture()
    val config = ConfigReader.fromJson(configJson)
    val outDir = Files.createTempDirectory("graft-play-out").toString

    val result = Play.run(spark, config, dir.toString, outDir)
    assert(result.ddStudy.tables.map(_.tableName) == Seq("demographics"))
    assert(result.extracted.keySet == Set("demographics"))
    assert(result.harmonyJsonPaths.length == 1)
    assert(result.whistleInputPath.isDefined)

    // ConceptMap JSON parses and has the self group
    val cm = new String(Files.readAllBytes(java.nio.file.Paths.get(result.harmonyJsonPaths.head)))
    assert(cm.contains(""""resourceType":"ConceptMap""""))
    assert(cm.contains(""""target":"self""""))

    // whistle-input doc has study + data
    val doc = new String(Files.readAllBytes(java.nio.file.Paths.get(result.whistleInputPath.get)))
    assert(doc.contains(""""id":"PFIX""""))
    assert(doc.contains(""""demographics":["""))

    // second run: document is fresh -> not rewritten
    val again = Play.run(spark, config, dir.toString, outDir)
    assert(again.whistleInputPath.isEmpty)
    // ...but force rebuilds
    val forced = Play.run(spark, config, dir.toString, outDir, force = true)
    assert(forced.whistleInputPath.isDefined)
  }

  test("Play.run from a reference-style YAML config (the reference's native format)") {
    val (dir, _) = fixture()
    val yaml =
      """study_id: PFIX
        |study_title: Fixture Study
        |identifier_prefix: https://pfix
        |consent_group: GRU
        |curies:
        |  HP: http://purl.obolibrary.org/obo/hp.owl
        |active_tables:
        |  demographics: true
        |dataset:
        |  demographics:
        |    filename: demographics.csv
        |    data_dictionary:
        |      filename: demographics_dd.csv
        |    code_harmonization: harmony.csv
        |""".stripMargin
    write(dir, "study.yaml", yaml)
    val config = ConfigReader.fromFile(dir.resolve("study.yaml").toString)
    assert(config.studyId == "PFIX")
    assert(config.studyTitle == "Fixture Study")
    assert(config.consentGroup.contains("GRU"))
    assert(config.curies == Map("HP" -> "http://purl.obolibrary.org/obo/hp.owl"))
    assert(config.activeTables == Map("demographics" -> true))
    assert(config.dataset("demographics").codeHarmonization.contains("harmony.csv"))
    // identical parse to the JSON mirror of the same fixture
    assert(config.dataset == ConfigReader.fromJson(fixture()._2)
      .copy(studyTitle = config.studyTitle).dataset)

    val outDir = Files.createTempDirectory("graft-play-yaml-out").toString
    val result = Play.run(spark, config, dir.toString, outDir)
    assert(result.ddStudy.tables.map(_.tableName) == Seq("demographics"))
    assert(result.whistleInputPath.isDefined)
    val doc = new String(Files.readAllBytes(java.nio.file.Paths.get(result.whistleInputPath.get)))
    assert(doc.contains(""""id":"PFIX""""))
  }

  test("ddMetaResources unions terminology, definitions, and the ConceptMap resource") {
    val (dir, configJson) = fixture()
    val config = ConfigReader.fromJson(configJson)
    val dd = Play.loadDdCatalog(spark, config, dir.toString)
    val out = Play.ddMetaResources(spark, config, dd, dir.toString)
    val types = out.collect().map(_.getString(1)).toSet
    assert(types == Set("CodeSystem", "ValueSet", "ObservationDefinition",
      "ActivityDefinition", "ConceptMap"))
    // harmony module carries sources VS + targets VS + the ConceptMap
    val harmony = out.filter(out("module") === "harmony").collect().map(_.getString(2)).toSet
    assert(harmony == Set("PFIX.cm-valueset.sources", "PFIX.cm-valueset.targets",
      "PFIX.concept-map"))
  }

  test("harmonyConceptMap resource aggregates groups with study identity") {
    val (dir, _) = fixture()
    val groups = Harmony.conceptMapGroups(
      Harmony.read(spark, Seq(dir.resolve("harmony.csv").toString)))
    val out = ResourceBuilders.harmonyConceptMap(groups,
      Projection.StudyInfo("PFIX", "https://pfix")).collect()
    assert(out.length == 1)
    val j = out.head.getString(3)
    assert(j.contains(""""value":"PFIX.concept-map""""))
    assert(j.contains("data-to-public"))
    assert(j.contains(""""source":"sex""""))
  }

  test("IdCacheStore: load empty, merge INSERT OR REPLACE, save+reload round trip") {
    val path = Files.createTempDirectory("graft-idc").resolve("cache.parquet").toString
    val empty = IdCacheStore.load(spark, path)
    assert(empty.isEmpty)
    val v1 = df("system STRING, value STRING, resource_type STRING, fhir_id STRING",
      Seq(Row("s", "A", "Patient", "1"), Row("s", "B", "Patient", "2")))
    val v2 = df("system STRING, value STRING, resource_type STRING, fhir_id STRING",
      Seq(Row("s", "B", "Patient", "99"), Row("s", "C", "Patient", "3")))
    IdCacheStore.save(IdCacheStore.merge(empty, v1), path)
    val merged = IdCacheStore.merge(IdCacheStore.load(spark, path), v2)
    IdCacheStore.save(merged, path)
    val reloaded = IdCacheStore.load(spark, path).collect()
      .map(r => r.getString(1) -> r.getString(3)).toMap
    assert(reloaded == Map("A" -> "1", "B" -> "99", "C" -> "3")) // B replaced
  }

  test("InvalidReferencesWriter merges new entries into an existing report") {
    val deferred = df("module STRING, resourceType STRING, id STRING, resource STRING",
      Seq(Row("m", "Condition", "C1", """{"x":1}""")))
    val existing = """[{"module":"old","resourceType":"T","id":"Z","message":"m"}]"""
    val json = InvalidReferencesWriter.toJson(deferred, Some(existing))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(json)
    assert(arr.size == 2)
    assert(arr.get(0).get("id").asText == "Z")
    assert(arr.get(1).get("id").asText == "C1")
    assert(arr.get(1).get("resource").get("x").asInt == 1)
  }
}
