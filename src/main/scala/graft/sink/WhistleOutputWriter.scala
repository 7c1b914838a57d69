package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Whistle-output document writer: re-emit (module, resourceType, id,
 * resource-JSON) rows as the `{module: [resources...]}` document the
 * reference's Whistle stage produces — the file every downstream script
 * (`bundleup`, `inspectjson`, `loadfhir`) consumes. The inverse of
 * [[graft.sources.BundleScan.read]].
 *
 * Like [[WhistleInputWriter]], a single-file COMPATIBILITY artifact
 * (SURVEY.md §3.2): rows stream through `toLocalIterator` sorted by
 * (module, resourceType, id), so the driver holds one resource at a
 * time, but the output is inherently one file. At scale keep resources
 * as DataFrames (or partitioned parquet) and skip the document.
 */
object WhistleOutputWriter {

  def write(path: String, resources: DataFrame): Unit = {
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val ordered = resources
      .select(col("module"), col("resourceType"), col("id"), col("resource"))
      .orderBy("module", "resourceType", "id")
    val out = new BufferedWriter(new OutputStreamWriter(
      Files.newOutputStream(Paths.get(path)), StandardCharsets.UTF_8), 1 << 20)
    try {
      out.write("{")
      var currentModule: String = null
      var firstInModule = true
      val it = ordered.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val module = r.getString(0)
        if (module != currentModule) {
          if (currentModule != null) out.write("\n],")
          out.write(jsonKey(module))
          out.write(":[")
          currentModule = module
          firstInModule = true
        }
        if (!firstInModule) out.write(",")
        firstInModule = false
        out.write("\n")
        out.write(r.getString(3)) // pre-serialized JSON splices in raw
      }
      if (currentModule != null) out.write("\n]")
      out.write("}\n")
    } finally out.close()
  }

  private def jsonKey(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
