package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/**
 * Scans over the pipeline's own document formats.
 */
object BundleScan {

  /**
   * Whistle-output JSON scan (ref: wstlr/bundle.py:30-56 ParseBundle):
   * the `{module: [resources...]}` document becomes
   * (module, resourceType, id, resource-JSON) rows — the projection
   * output contract — with every module's array exploded. Spark's JSON
   * reader owns the dynamic per-module schemas; resources are
   * re-serialized per row so downstream consumers see uniform strings.
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    val doc = spark.read.option("multiLine", "true").json(path)
    // only array-valued keys are modules — a whistle-input-style doc mixes
    // in scalar/object metadata keys (config, study), which are not
    // resource groups
    val moduleCols = doc.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] => f.name
    }.toSeq
    require(moduleCols.nonEmpty, s"no module arrays found in $path")
    val parts = moduleCols.map { module =>
      val exploded = doc.select(explode(col(s"`$module`")).as("_r"))
      val fields = exploded.select("_r.*").columns.toSet
      def strField(name: String) =
        if (fields.contains(name)) col(s"_r.$name").cast("string")
        else lit(null).cast("string")
      exploded.select(
        lit(module).as("module"),
        strField("resourceType").as("resourceType"),
        strField("id").as("id"),
        to_json(col("_r")).as("resource"))
    }
    parts.reduce(_ unionByName (_, allowMissingColumns = true))
  }

  /** Patient-first module ordering (ref: bundle.py:37-42). */
  def moduleRank(module: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(module === "patient", 0).otherwise(1)

  /**
   * Module/resource load filter (ref: wstlr/load.py:248-253): empty
   * list = everything passes.
   */
  def loadFilter(resources: DataFrame,
      modules: Seq[String] = Nil, resourceTypes: Seq[String] = Nil): DataFrame = {
    val byModule = if (modules.isEmpty) resources
      else resources.filter(col("module").isin(modules.map(lit): _*))
    if (resourceTypes.isEmpty) byModule
    else byModule.filter(col("resourceType").isin(resourceTypes.map(lit): _*))
  }

  /**
   * study-ids JSON scan (ref: wstlr/studyids.py:60-83): the nested
   * {study: {host: {resourceType: [ids]}}} document flattened to
   * (study, host, resource_type, id) rows. Metadata-sized — parsed
   * driver-side, returned as a DataFrame for joins.
   */
  def readStudyIds(spark: SparkSession, json: String): DataFrame = {
    val root = new ObjectMapper().readTree(json)
    val rows = for {
      se <- root.properties().asScala.toSeq
      he <- se.getValue.properties().asScala.toSeq
      te <- he.getValue.properties().asScala.toSeq
      id <- te.getValue.elements().asScala.toSeq
    } yield (se.getKey, he.getKey, te.getKey, id.asText())
    import spark.implicits._
    rows.toDF("study", "host", "resource_type", "id")
  }

  /**
   * IG zip scan (ref: wstlr/igload/ig_source.py:11-55): each JSON member
   * of a definitions zip becomes a (filename, json) row; the exclusion
   * wildcard filter drops members whose name contains any exclusion
   * substring (ref: igload/__init__.py:21-26). The unzip is driver-side
   * (like the reference); parsing fans out through spark.read.json on
   * the member strings when the caller needs structure.
   */
  def readIgZip(spark: SparkSession, zipPath: String,
      exclusions: Seq[String] = Nil): DataFrame = {
    val zf = new java.util.zip.ZipFile(zipPath)
    val members =
      try {
        zf.entries().asScala
          .filter(e => !e.isDirectory && e.getName.endsWith(".json"))
          .filterNot(e => exclusions.exists(e.getName.contains))
          .map { e =>
            val bytes = zf.getInputStream(e).readAllBytes()
            (e.getName, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          }.toSeq
      } finally zf.close()
    import spark.implicits._
    members.toDF("filename", "json")
  }
}

/**
 * First-K error reporting (ref: wstlr/load.py:427-450 first-5 load
 * errors, conceptmap.py:128-136 first-10 duplicate keys + "And N more").
 */
object FirstKReport {
  /** The report lines: first k formatted rows plus the overflow line. */
  def apply(df: DataFrame, k: Int, format: org.apache.spark.sql.Row => String): Seq[String] = {
    val total = df.count()
    val shown = df.limit(k).collect().map(format).toSeq
    if (total > k) shown :+ s"And ${total - k} more." else shown
  }
}
