package graft

import graft.model.StudyConfig
import graft.sources.{ConfigReader, DdCsv}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** End-to-end extraction golden: a whistler-style fixture study (config
 *  + DD + harmony + data CSVs) through the full pipeline
 *  (ref: wstlr/extractor.py:207-373 DataCsvToObject). */
class ExtractorSpec extends AnyFunSuite {
  import TestSpark.spark

  private def write(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def fixtureDir(): Path = {
    val dir = Files.createTempDirectory("graft-study")
    write(dir, "demographics.csv",
      """Subject Id,Sex,Age
        |S1,M,12
        |S2,F,9
        |S3,M,40
        |""".stripMargin)
    write(dir, "labs_part1.csv",
      """Subject Id,LAB_glucose,LAB_sodium,Visit
        |S1,99,140,v1
        |S1,85,138,v2
        |""".stripMargin)
    write(dir, "labs_part2.csv",
      """Subject Id,LAB_glucose,LAB_sodium,Visit
        |S2,92,142,v1
        |""".stripMargin)
    write(dir, "conditions.csv",
      """Subject Id,Condition
        |S1,asthma
        |S1,eczema
        |S2,asthma
        |""".stripMargin)
    write(dir, "harmony.csv",
      """local code,text,table_name,parent_varname,local code system,code,display,code system
        |M,Male,demographics,sex,sex,male,Male,http://hl7.org/fhir/administrative-gender
        |F,Female,demographics,sex,sex,female,Female,http://hl7.org/fhir/administrative-gender
        |""".stripMargin)
    // labs DD: the config's descriptive aggregator name substitutes to the
    // DD varname (extractor.py:316 + dd/variable.py:63-72)
    write(dir, "labs_dd.csv",
      """variable_name,description,data_type,enumerations
        |Subject Id,Participant,string,
        |measurements,Lab Panel,string,
        |Visit,Visit code,string,
        |""".stripMargin)
    dir
  }

  private val configJson =
    """{
      |"study_id": "FIX1",
      |"identifier_prefix": "https://fix1",
      |"dataset": {
      |  "demographics": {"filename": "demographics.csv",
      |                   "code_harmonization": "harmony.csv"},
      |  "labs": {"filename": "labs_part1.csv,labs_part2.csv",
      |           "group_by": "Subject Id",
      |           "data_dictionary": {"filename": "labs_dd.csv"},
      |           "aggregators": {"Lab Panel": "^lab_"},
      |           "aggregator-splitter": "_"},
      |  "conditions": {"filename": "conditions.csv",
      |                 "embed": {"dataset": "demographics", "colname": "Subject Id"}}
      |}}""".stripMargin

  test("full extraction: pivot + multi-file group nest + embed + display columns") {
    val dir = fixtureDir()
    val config: StudyConfig = ConfigReader.fromJson(configJson)
    val dd = graft.cli.Play.loadDdCatalog(spark, config, dir.toString)
    val out = Extractor.extract(spark, config, Some(dd), dataDir = dir.toString)

    // conditions is embedded — not a top-level table
    assert(out.keySet == Set("demographics", "labs"))

    // demographics: normalized headers, sex_display from harmony,
    // embedded conditions array with table_name tag and []-fill
    val demo = out("demographics").orderBy("subject_id").collect()
    val d = out("demographics")
    assert(d.columns.contains("sex_display"))
    assert(d.columns.contains("conditions"))
    val s1 = demo(0)
    assert(s1.getAs[String]("sex_display") == "Male")
    val s1conds = s1.getAs[scala.collection.Seq[Row]]("conditions")
    assert(s1conds.map(_.getAs[String]("condition")) == Seq("asthma", "eczema"))
    assert(s1conds.forall(_.getAs[String]("table_name") == "conditions"))
    assert(demo(2).getAs[scala.collection.Seq[Row]]("conditions").isEmpty) // S3: []

    // labs: multi-file union, LAB_ columns pivoted with splitter-stripped
    // codes; the descriptive aggregator name "Lab Panel" substituted to
    // the DD varname "measurements"; grouped with file order preserved
    val labs = out("labs").orderBy("subject_id").collect()
    assert(out("labs").columns.toSeq == Seq("subject_id", "content"))
    val l1 = labs(0).getAs[scala.collection.Seq[Row]]("content")
    assert(l1.length == 2) // v1 then v2, CSV order
    assert(l1.map(_.getAs[String]("visit")) == Seq("v1", "v2"))
    val v1m = l1.head.getAs[scala.collection.Seq[Row]]("measurements")
    assert(v1m.map(r => (r.getAs[String]("code"), r.getAs[String]("value"))) ==
      Seq(("glucose", "99"), ("sodium", "140")))
    // cross-file order: S2's row came from part2
    assert(labs(1).getAs[scala.collection.Seq[Row]]("content").length == 1)
  }

  test("embed salt_buckets config drives the salted join and results are unchanged") {
    val dir = fixtureDir()
    val plainCfg = ConfigReader.fromJson(configJson)
    val saltedCfg = ConfigReader.fromJson(configJson.replace(
      """"colname": "Subject Id"}""",
      """"colname": "Subject Id", "salt_buckets": 4}"""))
    assert(saltedCfg.dataset("conditions").embed.get.saltBuckets == 4)
    def conds(cfg: StudyConfig) =
      Extractor.extract(spark, cfg, dataDir = dir.toString)("demographics")
        .orderBy("subject_id").collect()
        .map(r => r.getAs[String]("subject_id") ->
          r.getAs[scala.collection.Seq[Row]]("conditions").map(_.getAs[String]("condition")))
        .toSeq
    assert(conds(saltedCfg) == conds(plainCfg))
    // junk salt_buckets is a loud config error, never a silent no-salt
    val e = intercept[IllegalArgumentException](ConfigReader.fromJson(configJson.replace(
      """"colname": "Subject Id"}""",
      """"colname": "Subject Id", "salt_buckets": "eight"}""")))
    assert(e.getMessage.contains("salt_buckets"))
  }

  test("inactive tables are pruned from the plan") {
    val dir = fixtureDir()
    val config = ConfigReader.fromJson(configJson.replace(
      "\"dataset\": {",
      """"active_tables": {"demographics": true}, "dataset": {"""))
    val out = Extractor.extract(spark, config, dataDir = dir.toString)
    assert(out.keySet == Set("demographics"))
  }
}
