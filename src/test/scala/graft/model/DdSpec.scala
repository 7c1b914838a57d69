package graft.model

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.ListMap

/** Ports of the reference DD suites
 *  (ref: tests/test_dd_variable.py, tests/test_dd_table.py). */
class DdSpec extends AnyFunSuite {

  private def mkVar(
      varName: String = "sex",
      description: String = "",
      dataType: String = DdType.String,
      enumerations: ListMap[String, String] = ListMap.empty,
      consentGroup: Option[String] = None): DdVariable =
    DdVariable("MyStudy", "demographics", varName,
      description = description, dataType = dataType,
      enumerations = enumerations, consentGroup = consentGroup,
      urlBase = "http://base")

  test("parseEnums: empty yields no values") {
    assert(DdVariable.parseEnums(null) == ListMap.empty)
    assert(DdVariable.parseEnums("") == ListMap.empty)
  }

  test("parseEnums: semicolon-delimited code=desc pairs") {
    assert(DdVariable.parseEnums("M=Male;F=Female")
      == ListMap("M" -> "Male", "F" -> "Female"))
  }

  test("parseEnums: newline-delimited bare values use value as own description") {
    assert(DdVariable.parseEnums("White\nBlack\nAsian")
      == ListMap("White" -> "White", "Black" -> "Black", "Asian" -> "Asian"))
  }

  test("parseEnums: duplicate codes keep first occurrence") {
    assert(DdVariable.parseEnums("A=Alpha;A=Alternate") == ListMap("A" -> "Alpha"))
  }

  test("values: blank/None description falls back to the code") {
    val v = mkVar(dataType = DdType.Enumeration,
      enumerations = ListMap("M" -> "Male", "X" -> "", "Y" -> "None"))
    assert(v.values == Seq(CodeEntry("M", "Male"), CodeEntry("X", "X"), CodeEntry("Y", "Y")))
  }

  test("desc uses description when present, falls back to varname when blank") {
    assert(mkVar(description = "Biological sex").desc == "Biological sex")
    assert(mkVar(description = "   ").desc == "sex")
  }

  test("varname lookup maps description and enumerations back to codes") {
    val v = mkVar(description = "Biological sex", dataType = DdType.Enumeration,
      enumerations = ListMap("M" -> "Male", "F" -> "Female"))
    assert(v.varnameLookupEntries.toMap == Map(
      "Biological sex" -> "sex", "sex:Male" -> "M", "sex:Female" -> "F"))
  }

  test("varname lookup skips description entry when description equals varname") {
    assert(mkVar(description = "sex").varnameLookupEntries.isEmpty)
  }

  test("variable url includes table and variable; consent group scopes the url") {
    assert(mkVar().url == "http://base/CodeSystem/data-dictionary/demographics/sex")
    assert(mkVar(consentGroup = Some("GRU")).url.contains("/gru/"))
    assert(mkVar(consentGroup = Some("GRU")).url != mkVar(consentGroup = Some("HMB")).url)
  }

  test("DdTable: duplicate variable names are a hard error") {
    val v1 = mkVar("sex")
    val v2 = mkVar("Sex") // normalizes to same fieldName
    val e = intercept[IllegalArgumentException](
      DdTable("MyStudy", "demographics", Seq(v1, v2)))
    assert(e.getMessage.contains("sex"))
  }

  test("DdTable: first variable is default subject id unless overridden") {
    val t = DdTable("MyStudy", "demographics", Seq(mkVar("Subject Id"), mkVar("sex")))
    assert(t.subjectId.contains("subject_id"))
    val o = DdTable("MyStudy", "demographics", Seq(mkVar("Subject Id"), mkVar("sex")),
      subjectIdOverride = Some("Participant Id"))
    assert(o.subjectId.contains("participant_id"))
  }

  test("DdTable: table code system has one entry per variable (code=varname, description=desc)") {
    val t = DdTable("MyStudy", "demographics",
      Seq(mkVar("sex", description = "Biological sex"), mkVar("age")))
    assert(t.tableCodeSystemValues == Seq(
      CodeEntry("sex", "Biological sex"), CodeEntry("age", "age")))
  }

  test("raw schema is all-string; typed schema follows declared types") {
    import org.apache.spark.sql.types._
    val t = DdTable("MyStudy", "demographics", Seq(
      mkVar("id"), mkVar("age", dataType = DdType.Integer),
      mkVar("weight", dataType = DdType.Number),
      mkVar("enrolled", dataType = DdType.Boolean),
      mkVar("visit date", dataType = DdType.Date)))
    assert(t.rawSchema.fields.forall(_.dataType == StringType))
    assert(t.typedSchema.map(f => f.name -> f.dataType) == Seq(
      "id" -> StringType, "age" -> LongType, "weight" -> DoubleType,
      "enrolled" -> BooleanType, "visit_date" -> DateType))
  }
}
