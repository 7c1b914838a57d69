package graft.sink

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model.{DdStudy, StudyConfig}
import org.apache.spark.sql.DataFrame

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Whistle-input document writer (ref: wstlr/extractor.py:207-249 document
 * shape, 376-399 emit): one JSON document
 * `{config, study, code-systems, harmony, <table>: [rows...]}`.
 *
 * This is a COMPATIBILITY artifact (SURVEY.md §3.2): the engine's native
 * interchange is the per-table DataFrames; a user migrating from the
 * reference can still emit the document its Whistle tooling consumes.
 * Scale posture: metadata (study, DD, code systems, harmony) is
 * driver-side by nature; table data streams through
 * `toJSON.toLocalIterator` one partition at a time — the driver never
 * holds a table in memory, but output is inherently one file (exactly
 * like the reference). For big data, write parquet instead and skip this.
 */
object WhistleInputWriter {

  private val mapper = new ObjectMapper()

  /** The study metadata object (ref: extractor.py:208-221). */
  def studyNode(config: StudyConfig, dd: DdStudy): ObjectNode = {
    val study = mapper.createObjectNode()
    study.put("id", config.studyId)
    study.put("accession", config.studyAccession)
    study.put("title", config.studyTitle)
    study.put("desc", config.studyDesc)
    study.put("identifier-prefix", config.identifierPrefix)
    study.put("dd-prefix", config.ddPrefix)
    study.put("url", config.url)
    study.put("publisher", config.publisher)
    val ddArr = study.putArray("data-dictionary")
    val ddObj = ddArr.addObject()
    ddObj.put("study", config.studyId)
    val ddValues = ddObj.putArray("values")
    dd.tables.foreach { t =>
      val tn = ddValues.addObject()
      tn.put("table_name", t.tableName)
      tn.put("url", t.url)
      val vals = tn.putArray("values")
      t.variables.foreach { v =>
        val vn = vals.addObject()
        vn.put("code", v.varName)
        vn.put("description", v.desc)
      }
    }
    val ann = study.putObject("annotations")
    config.annotations.foreach { case (k, v) => ann.put(k, v) }
    config.consentGroup.foreach(cg => study.put("consent_group", cg))
    study
  }

  /** code-systems entries: table-level + per-categorical-variable
   *  (ref: extractor.py:283-327; the cs_entry shape
   *  ResourceBuilders.ddTerminology also consumes). */
  def codeSystemsNode(config: StudyConfig, dd: DdStudy): ArrayNode = {
    val arr = mapper.createArrayNode()
    dd.tables.foreach { t =>
      val tn = arr.addObject()
      tn.put("study", config.studyId)
      tn.put("table_name", t.tableName)
      tn.put("url", t.url)
      val vals = tn.putArray("values")
      t.tableCodeSystemValues.foreach { v =>
        val o = vals.addObject(); o.put("code", v.code); o.put("description", v.description)
      }
      t.variables.filter(_.values.nonEmpty).foreach { v =>
        val vn = arr.addObject()
        vn.put("study", config.studyId)
        vn.put("table_name", t.tableName)
        vn.put("varname", v.varName)
        vn.put("url", v.url)
        val vv = vn.putArray("values")
        v.values.foreach { e =>
          val o = vv.addObject(); o.put("code", e.code); o.put("description", e.description)
        }
      }
    }
    arr
  }

  /**
   * Write the document. `tables` maps dataset name -> extracted
   * DataFrame (post NormalizeColumns/pivot/group/embed);
   * `harmonyJson` holds pre-built ObjectifyHarmony-style JSON objects
   * (from [[graft.harmony.Harmony.conceptMapJson]] groups or custom).
   */
  def write(
      path: String,
      config: StudyConfig,
      dd: DdStudy,
      tables: Map[String, DataFrame],
      harmonyJson: Seq[String] = Nil): Unit = {
    val head = mapper.createObjectNode()
    val cfg = head.putObject("config")
    val missing = cfg.putArray("missing")
    config.missingValues.foreach(missing.add)
    head.set[ObjectNode]("study", studyNode(config, dd))
    head.set[ArrayNode]("code-systems", codeSystemsNode(config, dd))

    val out = new BufferedWriter(new OutputStreamWriter(
      Files.newOutputStream(Paths.get(path)), StandardCharsets.UTF_8), 1 << 20)
    try {
      val headJson = mapper.writeValueAsString(head)
      out.write(headJson.dropRight(1)) // strip closing '}' to append sections
      out.write(",\"harmony\":[")
      out.write(harmonyJson.mkString(","))
      out.write("]")
      tables.foreach { case (name, df) =>
        out.write(",")
        out.write(mapper.writeValueAsString(name))
        out.write(":[")
        // partition-at-a-time stream; the driver never holds a table
        val it = df.toJSON.toLocalIterator()
        var first = true
        while (it.hasNext) {
          if (!first) out.write(",")
          out.write(it.next())
          first = false
        }
        out.write("]")
      }
      out.write("}")
    } finally out.close()
  }
}
