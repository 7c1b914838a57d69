package graft.sources

import graft.TestSpark
import graft.model.DdType
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Whistler CSV-read semantics (ref: wstlr/extractor.py:151,334-351)
 *  and the DD CSV parser (ref: wstlr/dd/csv_parser.py, dd/loader.py). */
class CsvSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmpCsv(name: String, content: String, bom: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft-csv")
    val p = dir.resolve(name)
    val bytes = (if (bom) "﻿" else "") + content
    Files.write(p, bytes.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("reads all-string schema with fix_fieldname-normalized headers") {
    val p = tmpCsv("t.csv", "Subject Id,Value (Units)/Test\nS1,10\n")
    val df = CsvSource.read(spark, Seq(p))
    assert(df.columns.toSeq == Seq("subject_id", "value_units_test"))
    assert(df.schema.fields.forall(_.dataType == StringType))
    assert(df.collect().head.getString(1) == "10")
  }

  test("strips a UTF-8 BOM from the first header (utf-8-sig)") {
    val p = tmpCsv("t.csv", "Subject Id,Value\nS1,10\n", bom = true)
    val df = CsvSource.read(spark, Seq(p))
    assert(df.columns.toSeq == Seq("subject_id", "value"))
  }

  test("honors a configurable delimiter") {
    val p = tmpCsv("t.tsv", "A\tB\n1\t2\n")
    val df = CsvSource.read(spark, Seq(p), delimiter = "\t")
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.collect().head.getString(0) == "1")
  }

  test("unions a multi-file list in order with file-ordered row ids") {
    val p1 = tmpCsv("part1.csv", "Id,V\nA,1\nB,2\n")
    val p2 = tmpCsv("part2.csv", "Id,V\nC,3\n")
    val df = CsvSource.read(spark, Seq(p1, p2), withRowId = true)
    val rows = df.orderBy("_rid").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
  }

  test("fileList splits the comma list, trims, and drops 'none'") {
    assert(CsvSource.fileList(" a.csv , b.csv ,none, ") == Seq("a.csv", "b.csv"))
  }

  test("DdCsv parses variables with types and enumerations") {
    val p = tmpCsv("demographics.csv",
      """variable_name,description,data_type,enumerations
        |participant_id,Unique identifier,string,
        |sex,Biological sex,enumeration,M=Male;F=Female
        |age,Age at enrollment,integer,
        |""".stripMargin)
    val table = DdCsv.parse(spark, p, "MyStudy")
    assert(table.tableName == "demographics")
    assert(table.variables.map(_.varName) == Seq("participant_id", "sex", "age"))
    assert(table.variable("sex").get.dataType == DdType.Enumeration)
    assert(table.variable("sex").get.enumerations == Map("M" -> "Male", "F" -> "Female"))
    assert(table.variable("age").get.dataType == DdType.Integer)
    assert(table.subjectId.contains("participant_id"))
  }

  test("DdCsv applies built-in header aliases (varname/type/values)") {
    val p = tmpCsv("t.csv", "varname,type,values\nsex,enumeration,M=Male\n")
    val table = DdCsv.parse(spark, p, "S")
    assert(table.variables.head.varName == "sex")
    assert(table.variables.head.enumerations == Map("M" -> "Male"))
  }

  test("DdCsv applies user alias remap (canonical -> alternate header)") {
    val p = tmpCsv("t.csv", "var_label,kind,opts\nsex,string,\n")
    val table = DdCsv.parse(spark, p, "S", colnames = Map(
      "variable_name" -> "var_label", "data_type" -> "kind", "enumerations" -> "opts"))
    assert(table.variables.head.varName == "sex")
  }

  test("DdCsv rejects a file missing required columns, naming them") {
    val p = tmpCsv("t.csv", "something,else\nx,y\n")
    val e = intercept[IllegalArgumentException](DdCsv.parse(spark, p, "S"))
    assert(e.getMessage.contains("variable_name"))
  }

  test("DdCsv ignores undeclared extra columns (restkey junk)") {
    val p = tmpCsv("t.csv",
      "variable_name,data_type,enumerations,surprise\nsex,string,,whatever\n")
    val table = DdCsv.parse(spark, p, "S")
    assert(table.variables.map(_.varName) == Seq("sex"))
  }
}
