package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model._

import scala.jdk.CollectionConverters._

/**
 * JSON data-dictionary parser (ref: wstlr/dd/json_parser.py:14-52 — the
 * `anvil_data_model` format: `{name, description, tables: [{table,
 * columns: [{variable_name, data_type, ...}]}]}` with configurable
 * tables/columns array names) and the DD->CSV writer
 * (json_parser.py:54-87: enumerations re-joined `k=v;...`).
 *
 * Like [[DdCsv]], this is catalog-building metadata — parsed driver-side
 * by design.
 */
object DdJson {

  def parse(
      json: String,
      tablesPath: String = "tables",
      columnsPath: String = "columns",
      colnames: Map[String, String] = Map.empty,
      consentGroup: Option[String] = None,
      urlBase: String = Dd.SystemBase): DdStudy = {
    val root = new ObjectMapper().readTree(json)
    val studyName = opt(root, "name").getOrElse("")
    // alias remap applies per variable object key (json_parser.py:50)
    val aliasMap = DdCsv.BaseColnames ++ colnames.map { case (canon, alt) => alt -> canon }

    val tables = root.get(tablesPath).elements().asScala.map { tableNode =>
      val tableName = tableNode.get("table").asText()
      val variables = tableNode.get(columnsPath).elements().asScala.map { v =>
        val fields: Map[String, String] = v.properties().asScala.map { e =>
          aliasMap.getOrElse(e.getKey, e.getKey) -> e.getValue.asText()
        }.toMap
        DdVariable(
          studyName = studyName,
          tableName = tableName,
          varName = fields.getOrElse("variable_name", ""),
          description = fields.getOrElse("description", ""),
          dataType = DdType.standardize(fields.getOrElse("data_type", "")),
          enumerations = DdVariable.parseEnums(fields.getOrElse("enumerations", "")),
          consentGroup = consentGroup,
          urlBase = urlBase,
          required = Naming.evaluateBool(fields.getOrElse("required", "")),
          keyComponent = Naming.evaluateBool(fields.getOrElse("key_component", "")),
          notes = fields.getOrElse("notes", ""))
      }.toSeq
      DdTable(studyName, tableName, variables, consentGroup, urlBase)
    }.toSeq
    DdStudy(studyName, tables, urlBase)
  }

  def parseFile(path: String, tablesPath: String = "tables",
      columnsPath: String = "columns", colnames: Map[String, String] = Map.empty): DdStudy =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8), tablesPath, columnsPath, colnames)

  private def opt(n: JsonNode, key: String): Option[String] =
    Option(n.get(key)).filterNot(_.isNull).map(_.asText())

  /** DD re-emitted as per-table CSV content (ref: json_parser.py:54-87):
   *  header + one row per variable, enumerations as `k=v;...`.
   *  Returns (tableName -> csv text); callers write the files. */
  def toCsv(study: DdStudy): Map[String, String] =
    study.tables.map { table =>
      val header = "variable_name,description,data_type,enumerations,notes"
      val rows = table.variables.map { v =>
        val enums = v.enumerations.map { case (k, d) => s"$k=$d" }.mkString(";")
        Seq(v.varName, v.description, v.dataType, enums, v.notes).map(csvCell).mkString(",")
      }
      table.tableName -> (header +: rows).mkString("", "\n", "\n")
    }.toMap

  private def csvCell(s: String): String =
    if (s == null) ""
    else if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
