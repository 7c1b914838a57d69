package graft.cli

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** The remaining console-script mains (buildcm/bundleup/inspectjson/
 *  builddd/buildsrcobs/buildsrcqr/dd-json-to-csv/init-play) run
 *  in-process against the fixture study. */
class ToolMainsSpec extends AnyFunSuite {
  import TestSpark.spark

  private def write(dir: Path, name: String, content: String): Path = {
    val p = dir.resolve(name)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p
  }

  private def read(p: Path): String =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)

  private def fixture(): Path = {
    val dir = Files.createTempDirectory("graft-toolmains")
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
    write(dir, "study.yaml",
      """study_id: TOOLS
        |identifier_prefix: https://tools
        |dataset:
        |  demographics:
        |    filename: demographics.csv
        |    data_dictionary:
        |      filename: demographics_dd.csv
        |    code_harmonization: harmony.csv
        |""".stripMargin)
    write(dir, "fhir_hosts",
      """dev:
        |  host_desc: Dev
        |  target_service_url: http://fhir.example/fhir
        |  auth_type: auth_basic
        |  username: u
        |  password: p
        |""".stripMargin)
    dir
  }

  private val whistleOutput =
    """{"patient":[
      |  {"resourceType":"Patient","id":"p1",
      |   "identifier":[{"system":"https://tools","value":"S1"}]},
      |  {"resourceType":"Patient","id":"p2",
      |   "identifier":[{"system":"https://tools","value":"S1"}]}],
      |"obs":[{"resourceType":"Observation","id":"o1",
      |   "identifier":[{"system":"https://tools","value":"O1"}]}]}""".stripMargin

  test("buildcm writes a ConceptMap JSON next to each CSV") {
    val dir = fixture()
    assert(BuildCmMain.run(Array(dir.resolve("harmony.csv").toString), spark) == 0)
    val json = read(dir.resolve("harmony.json"))
    assert(json.contains(""""resourceType":"ConceptMap""""))
    assert(json.contains(""""id":"harmony""""))
    assert(json.contains(""""code":"male""""))
    // usage / missing-file errors
    assert(BuildCmMain.run(Array.empty[String], spark) == 1)
    assert(BuildCmMain.run(Array(dir.resolve("nope.csv").toString), spark) == 1)
    assert(BuildCmMain.run(Array("--curie", "broken", dir.resolve("harmony.csv").toString), spark) == 1)
  }

  test("bundleup writes per-module transaction bundle files") {
    val dir = fixture()
    val wo = write(dir, "wo.json", whistleOutput)
    val out = dir.resolve("bundles")
    assert(BundleUpMain.run(Array(
      "-e", "dev", "--hosts-file", dir.resolve("fhir_hosts").toString,
      "-o", out.toString, wo.toString), spark) == 0)
    val patientBundle = read(out.resolve("wo-transaction-patient-00001.json"))
    assert(patientBundle.contains(""""type":"transaction""""))
    assert(patientBundle.contains("http://fhir.example/fhir/Patient/p1"))
    assert(patientBundle.contains(""""method":"PUT""""))
    assert(Files.exists(out.resolve("wo-transaction-obs-00001.json")))
    // default env is the first configured host (bundle.py:198-205)
    val out2 = dir.resolve("bundles2")
    assert(BundleUpMain.run(Array("--hosts-file", dir.resolve("fhir_hosts").toString,
      "-o", out2.toString, wo.toString), spark) == 0)
    assert(Files.exists(out2.resolve("wo-transaction-patient-00001.json")))
    // unknown env is an error
    assert(BundleUpMain.run(Array("-e", "nope",
      "--hosts-file", dir.resolve("fhir_hosts").toString,
      "-o", out.toString, wo.toString), spark) == 1)
  }

  test("inspectjson reports duplicates and the module summary") {
    val dir = fixture()
    val wo = write(dir, "wo.json", whistleOutput)
    val buf = new ByteArrayOutputStream()
    val rc = Console.withOut(buf)(InspectJsonMain.run(Array(wo.toString), spark))
    assert(rc == 0)
    val report = buf.toString("UTF-8")
    // p1/p2 share system:value https://tools:S1
    assert(report.contains("Duplicate identifiers (1)"))
    assert(report.contains("https://tools:S1"))
    assert(report.contains("Module Summary:"))
    assert(report.contains("patient"))
    assert(report.contains("Observation"))
    assert(InspectJsonMain.run(Array(dir.resolve("nope.json").toString), spark) == 1)
    assert(InspectJsonMain.run(Array.empty[String], spark) == 1)
  }

  test("builddd profiles a whistle-input document into draft DD CSVs") {
    val dir = fixture()
    val wi = dir.resolve("wi")
    assert(ExtractJsonMain.run(Array("-o", wi.toString, dir.resolve("study.yaml").toString), spark) == 0)
    val out = dir.resolve("dd-draft")
    assert(BuildDdMain.run(Array("-o", out.toString, wi.resolve("TOOLS.json").toString), spark) == 0)
    val csv = read(out.resolve("TOOLS-demographics.csv"))
    assert(csv.startsWith("variable_name,"))
    // profiled variables come from the extracted table's columns
    assert(csv.contains("sex"))
    // the draft parses straight back as a DD
    val dd = graft.sources.DdCsv.parse(spark,
      out.resolve("TOOLS-demographics.csv").toString, "TOOLS", Some("demographics"))
    assert(dd.variables.nonEmpty)
    assert(BuildDdMain.run(Array(dir.resolve("nope.json").toString), spark) == 1)
    assert(BuildDdMain.run(Array.empty[String], spark) == 1)
  }

  test("buildsrcobs and buildsrcqr materialize source-data resources as whistle output") {
    val dir = fixture()
    val out = dir.resolve("srcout").toString
    assert(BuildSrcMains.run(Array("-o", out,
      dir.resolve("study.yaml").toString), spark, qr = false) == 0)
    val obs = graft.sources.BundleScan.read(spark, s"$out/TOOLS-srcobs.json")
    assert(obs.filter(obs("resourceType") === "Observation").count() > 0)
    assert(BuildSrcMains.run(Array("-o", out,
      dir.resolve("study.yaml").toString), spark, qr = true) == 0)
    val qr = graft.sources.BundleScan.read(spark, s"$out/TOOLS-srcqr.json")
    assert(qr.filter(qr("resourceType") === "QuestionnaireResponse").count() > 0)
    assert(BuildSrcMains.run(Array.empty[String], spark, qr = false) == 1)
  }

  test("dd-json-to-csv converts a JSON DD to per-table CSVs") {
    val dir = fixture()
    val src = write(dir, "dd.json",
      """{"name":"TOOLS","tables":[
        |  {"table":"demo","columns":[
        |    {"variable_name":"subject_id","description":"Participant","data_type":"string"},
        |    {"variable_name":"sex","description":"Sex","data_type":"enumeration",
        |     "enumerations":"M=Male;F=Female"}]}]}""".stripMargin)
    val out = dir.resolve("ddcsv")
    assert(DdJsonToCsvMain.run(Array("-s", src.toString, "-o", out.toString)) == 0)
    val csv = read(out.resolve("demo.csv"))
    assert(csv.contains("subject_id"))
    assert(csv.contains("M=Male;F=Female"))
    assert(DdJsonToCsvMain.run(Array("-o", out.toString)) == 1) // -s required
  }

  test("init-play scaffolds a starter study that play runs end-to-end") {
    val dir = Files.createTempDirectory("graft-init")
    assert(InitPlayMain.run(Array("--study-id", "STARTER", dir.toString)) == 0)
    assert(Files.exists(dir.resolve("study.yaml")))
    assert(Files.exists(dir.resolve("fhir_hosts.example")))
    assert(Files.exists(dir.resolve("data/demographics.csv")))
    assert(read(dir.resolve("study.yaml")).contains("study_id: STARTER"))
    // the scaffolded project runs unmodified through play (document stage)
    val out = dir.resolve("out").toString
    assert(PlayMain.run(Array("-o", out, dir.resolve("study.yaml").toString), spark) == 0)
    assert(Files.exists(dir.resolve("out/whistle-input/STARTER.json")))
    assert(Files.exists(dir.resolve("out/harmony/harmony.json")))
    // a second init-play refuses to clobber the edited project
    assert(InitPlayMain.run(Array(dir.toString)) == 1)
    assert(read(dir.resolve("study.yaml")).contains("STARTER")) // untouched
    assert(InitPlayMain.run(Array("-f", dir.toString)) == 0) // -f overrides
  }
}
