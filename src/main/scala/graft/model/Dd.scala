package graft.model

import org.apache.spark.sql.types._

import scala.collection.immutable.ListMap

/** One enumerated code -> description pair (ref: wstlr/dd/variable.py:92-116). */
final case class CodeEntry(code: String, description: String)

/**
 * Data-dictionary variable (ref: wstlr/dd/variable.py:34-178).
 * Declared types, not inferred; enumerations carried as an ordered
 * code->description map.
 */
final case class DdVariable(
    studyName: String,
    tableName: String,
    varName: String,
    description: String = "",
    dataType: String = DdType.String,
    enumerations: ListMap[String, String] = ListMap.empty,
    consentGroup: Option[String] = None,
    urlBase: String = Dd.SystemBase,
    required: Boolean = false,
    keyComponent: Boolean = false,
    notes: String = "") {

  val fieldName: String = Naming.fixFieldName(varName)

  /** Non-empty description, else varname (ref: dd/variable.py:79-83). */
  def desc: String = if (description != null && description.trim.nonEmpty) description else varName

  /** CodeSystem URL for this variable's value domain. */
  def url: String =
    Naming.ddSystemUrl(urlBase, "CodeSystem", consentGroup, tableName, Some(varName))

  /** desc->varname and "var:valuedesc"->code substitutions
   *  (ref: dd/variable.py:63-72). */
  def varnameLookupEntries: Seq[(String, String)] = {
    val descEntry = if (desc != varName) Seq(desc -> varName) else Seq.empty
    val valueEntries = enumerations.collect {
      case (code, description) if code != description => s"$varName:$description" -> code
    }
    descEntry ++ valueEntries.toSeq
  }

  /** Enumerations as {code, description} entries; blank/None description
   *  falls back to code (ref: dd/variable.py:150-178). */
  def values: Seq[CodeEntry] = enumerations.toSeq.map { case (code, d) =>
    CodeEntry(code, if (d == null || d == "None" || d.trim.isEmpty) code else d)
  }

  /** Spark type for the *projected* (typed) view of this column. NOTE the
   *  engine keeps raw data stringly-typed and try-casts at projection time
   *  (SURVEY.md §1.2); this is the target type for that cast. */
  def sparkType: DataType = dataType match {
    case DdType.Integer => LongType
    case DdType.Boolean => BooleanType
    case DdType.Number  => DoubleType
    case DdType.Date    => DateType
    case _              => StringType // string / enumeration / identifier
  }
}

object DdVariable {

  /** Parse the DD enum cell: ";"- or newline-separated, optional
   *  `code=Description`, first duplicate wins (ref: dd/variable.py:92-116). */
  def parseEnums(values: String): ListMap[String, String] = {
    if (values == null || values.isEmpty) return ListMap.empty
    val splitter = if (values.contains(";")) ";" else if (values.contains("\n")) "\n" else ";"
    val parts = values.split(splitter, -1)
    var out = ListMap.empty[String, String]
    parts.foreach { entry =>
      if (entry.contains("=")) {
        val kv = entry.split("=", -1)
        val code = kv(0).trim
        if (!out.contains(code)) out += code -> kv(1).trim
      } else if (parts.length > 1 && entry.trim.nonEmpty) {
        // reference quirk kept as-is (variable.py:113 `len(split_values) > 1`):
        // a lone bare code without '=' parses to an EMPTY enumeration
        val v = entry.trim
        if (!out.contains(v)) out += v -> v
      }
    }
    out
  }
}

/**
 * Data-dictionary table (ref: wstlr/dd/table.py:14-149): ordered variables,
 * duplicate variable names are a hard error.
 */
final case class DdTable(
    studyName: String,
    tableName: String,
    variables: Seq[DdVariable],
    consentGroup: Option[String] = None,
    urlBase: String = Dd.SystemBase,
    subjectIdOverride: Option[String] = None) {

  {
    val dups = variables.groupBy(_.fieldName).collect { case (n, vs) if vs.size > 1 => n }
    require(dups.isEmpty, s"Duplicate variable(s) in DD table $tableName: ${dups.mkString(", ")}")
  }

  def url: String = Naming.ddSystemUrl(urlBase, "CodeSystem", consentGroup, tableName, None)

  def variable(fieldName: String): Option[DdVariable] = variables.find(_.fieldName == fieldName)

  /** First variable is the default subject id unless overridden
   *  (ref: dd/table.py subject_id handling). */
  def subjectId: Option[String] =
    subjectIdOverride.map(Naming.fixFieldName).orElse(variables.headOption.map(_.fieldName))

  /** Table-level code system: one entry per variable (code=varname,
   *  description=desc) (ref: dd/table.py:118-149). */
  def tableCodeSystemValues: Seq[CodeEntry] =
    variables.map(v => CodeEntry(v.varName, v.desc))

  /** desc->varname substitution map across all variables. */
  def varnameLookup: Map[String, String] =
    variables.flatMap(_.varnameLookupEntries).toMap

  /** All-string ingest schema (SURVEY.md §1.2: values stay strings through
   *  extraction). */
  def rawSchema: StructType =
    StructType(variables.map(v => StructField(v.fieldName, StringType, nullable = true)))

  /** Typed schema for the projection layer's try-cast target. */
  def typedSchema: StructType =
    StructType(variables.map(v => StructField(v.fieldName, v.sparkType, nullable = true)))
}

/** Data-dictionary study: table catalog (ref: wstlr/dd/study.py:10-91). */
final case class DdStudy(
    studyName: String,
    tables: Seq[DdTable],
    urlBase: String = Dd.SystemBase) {

  def table(name: String): Option[DdTable] = tables.find(_.tableName == name)
}

object Dd {
  /** Public NCPI IG base (ref: wstlr/__init__.py:14). */
  val SystemBase = "https://nih-ncpi.github.io/ncpi-fhir-ig"
}
