package graft.sources

import graft.TestSpark
import graft.model.{DdStudy, DdType}
import graft.sink.WhistleInputWriter
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.ListMap

/** DD JSON parser, DD->CSV round trip, whistle-input document writer
 *  (ref: wstlr/dd/json_parser.py, extractor.py:207-249,376-399). */
class DdJsonSpec extends AnyFunSuite {
  import TestSpark.{df, spark}

  private val ddJson =
    """{"name":"MyStudy","description":"A study",
      |"tables":[
      |  {"table":"demographics","columns":[
      |    {"variable_name":"participant_id","data_type":"string","description":"ID"},
      |    {"varname":"sex","type":"enumeration","values":"M=Male;F=Female"}]},
      |  {"table":"visits","columns":[
      |    {"variable_name":"visit_id","data_type":"integer"}]}
      |]}""".stripMargin

  test("DdJson parses tables/columns with alias remap inside variable objects") {
    val study = DdJson.parse(ddJson)
    assert(study.studyName == "MyStudy")
    assert(study.tables.map(_.tableName) == Seq("demographics", "visits"))
    val sex = study.table("demographics").get.variable("sex").get
    assert(sex.dataType == DdType.Enumeration)
    assert(sex.enumerations == ListMap("M" -> "Male", "F" -> "Female"))
    assert(study.table("visits").get.variable("visit_id").get.dataType == DdType.Integer)
  }

  test("DdJson honors custom tables/columns array names (anvil_data_model)") {
    val alt = ddJson.replace("\"tables\"", "\"entities\"").replace("\"columns\"", "\"attrs\"")
    val study = DdJson.parse(alt, tablesPath = "entities", columnsPath = "attrs")
    assert(study.tables.map(_.tableName) == Seq("demographics", "visits"))
  }

  test("toCsv re-emits enumerations k=v;... and round-trips through DdCsv") {
    val study = DdJson.parse(ddJson)
    val csvs = DdJson.toCsv(study)
    assert(csvs.keySet == Set("demographics", "visits"))
    assert(csvs("demographics").contains("sex,,enumeration,M=Male;F=Female,"))
    // round-trip: parse the emitted CSV back through the CSV DD parser
    val dir = java.nio.file.Files.createTempDirectory("graft-ddrt")
    val p = dir.resolve("demographics.csv")
    java.nio.file.Files.write(p, csvs("demographics").getBytes("UTF-8"))
    val reparsed = DdCsv.parse(spark, p.toString, "MyStudy")
    assert(reparsed.variable("sex").get.enumerations == ListMap("M" -> "Male", "F" -> "Female"))
  }

  test("WhistleInputWriter streams the full document with distributed table data") {
    val study = DdJson.parse(ddJson)
    val config = graft.model.StudyConfig(studyId = "MyStudy", studyTitle = "A study",
      identifierPrefix = "https://mystudy", annotations = Map("k" -> "v"))
    val demo = df("participant_id STRING, sex STRING", Seq(Row("S1", "M"), Row("S2", "F")))
    val out = java.nio.file.Files.createTempDirectory("graft-wi").resolve("whistle-input.json")
    WhistleInputWriter.write(out.toString, config,
      DdStudy("MyStudy", study.tables), Map("demographics" -> demo),
      harmonyJson = Seq("""{"mappings":[]}"""))

    val json = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS)
    val row = parsed.collect().head
    assert(parsed.columns.toSet ==
      Set("config", "study", "code-systems", "harmony", "demographics"))
    val studyNode = row.getAs[Row]("study")
    assert(studyNode.getAs[String]("id") == "MyStudy")
    assert(studyNode.getAs[String]("identifier-prefix") == "https://mystudy")
    assert(row.getAs[scala.collection.Seq[Row]]("demographics").length == 2)
    // code-systems: demographics table + sex variable + visits table
    assert(row.getAs[scala.collection.Seq[Row]]("code-systems").length == 3)
  }
}
