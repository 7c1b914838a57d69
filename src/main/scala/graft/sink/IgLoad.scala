package graft.sink

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.sources.BundleScan
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/**
 * IG load orchestration (ref: wstlr/igload/__init__.py:122-250): per
 * content entry, gather the IG's definition resources (publisher
 * `definitions.json.zip` members, or an explicit FILES list), filter to
 * the requested resource types minus exclusion wildcards, then
 *
 *  1. with `forceOverwrite`: delete the matching pre-existing resources
 *     (the ImplementationGuide resource last, igload:200-214), and give
 *     the backend settle time proportional to the delete count
 *     (igload:216-219 `sleep(sleep_time + len(deleted_items))`);
 *  2. load everything, the ImplementationGuide again last
 *     (igload:225-243).
 *
 * Spark shape: IGs are metadata-sized (hundreds of resources), but the
 * same per-partition client + eager `localCheckpoint` discipline as
 * [[FhirLoadSink]] applies — deletes and loads are side effects and run
 * exactly once per phase, with a hard barrier (one action per phase)
 * between deletes and loads because the server must see them in order.
 */
object IgLoad {

  /** One root-level entry of the content YAML
   *  (ref: igload/templates/ncpi.yaml). */
  final case class Content(
      name: String,
      sourceType: String, // IG | FILES
      url: Option[String],
      path: Option[String],
      resources: Seq[String],
      excludeWildcards: Seq[String])

  /** Parse the content YAML: root keys are entry names;
   *  `resources`/`exclude-wildcards` accept a list or one
   *  whitespace-separated string (igload:184-195). */
  def parseContent(yaml: String): Seq[Content] = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(yaml)
    def strings(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
      if (n == null || n.isNull) Nil
      else if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
      else n.asText().split("\\s+").toSeq.filter(_.nonEmpty)
    root.properties().asScala.iterator.map { e =>
      val n = e.getValue
      def opt(k: String) = Option(n.get(k)).filterNot(_.isNull).map(_.asText())
      Content(
        name = e.getKey,
        sourceType = opt("source_type").getOrElse("IG"),
        url = opt("url"),
        path = opt("path"),
        resources = strings(n.get("resources")),
        excludeWildcards = strings(n.get("exclude-wildcards")))
    }.toSeq
  }

  /**
   * Gather one content entry's resources as (filename, json) rows.
   * IG: the publisher zip at `<path>/output/definitions.json.zip` (or
   * fetched from `<url>/definitions.json.zip` — ig_source.py:17-30).
   * FILES: each listed file/URL (file_source.py:10-26); filenames are
   * the basename, and the effective resource list becomes the set of
   * types found (igload:171-178 replaces the config's list).
   */
  def gather(spark: SparkSession, content: Content): (DataFrame, Seq[String]) =
    content.sourceType match {
      case "IG" =>
        val zipPath = content.path.map(p => s"$p/output/definitions.json.zip")
          .orElse(content.url.map { u =>
            val tmp = java.nio.file.Files.createTempFile("graft-ig", ".zip")
            tmp.toFile.deleteOnExit() // downloaded copy, not a deliverable
            FileSource.fetchBytes(s"$u/definitions.json.zip", tmp)
            tmp.toString
          })
          .getOrElse(throw new IllegalArgumentException(
            s"content '${content.name}' needs a 'path' or 'url'"))
        (BundleScan.readIgZip(spark, zipPath), content.resources)
      case "FILES" =>
        val rows = content.resources.map { f =>
          (f.split("/").last, FileSource.fetch(f))
        }
        import spark.implicits._
        val df = rows.toDF("filename", "json")
        val types = df.select(get_json_object(col("json"), "$.resourceType"))
          .distinct().collect().map(_.getString(0)).toSeq
        (df, types)
      case other =>
        throw new IllegalArgumentException(s"unknown source_type '$other' in '${content.name}'")
    }

  /** The per-resource server operations, injectable for tests (the HTTP
   *  form is [[HttpIgClient]]). `delete` returns true when something was
   *  actually removed; `load` returns the HTTP status. */
  trait Client extends Serializable {
    def delete(resourceType: String, url: Option[String], id: Option[String]): Boolean
    def load(resourceType: String, url: Option[String], json: String, forceOverwrite: Boolean): Int
  }

  private val resultSchema = StructType(Seq(
    StructField("filename", StringType),
    StructField("resource_type", StringType, nullable = true),
    StructField("action", StringType), // deleted | delete-miss | loaded | excluded
    StructField("status", IntegerType, nullable = true)))

  /**
   * Run the overwrite-delete + load phases over gathered (filename,
   * json) rows. Returns one (filename, resource_type, action, status)
   * row per resource per phase. A resource is in scope when its type OR
   * filename is in `resourceList` and no exclusion wildcard matches the
   * filename (igload:21-26, 226-229).
   */
  def run(
      resources: DataFrame,
      resourceList: Seq[String],
      exclusions: Seq[String],
      forceOverwrite: Boolean,
      makeClient: () => Client,
      settleBaseMillis: Long = 5000L,
      settleMillisPerItem: Long = 1000L,
      // injectable so tests pin the COMPUTED pause (base + perItem * n)
      // instead of differencing two noisy end-to-end wall-clock runs
      sleeper: Long => Unit = Thread.sleep(_)): DataFrame = {
    val spark = resources.sparkSession
    val annotated = resources.select(
      col("filename"),
      get_json_object(col("json"), "$.resourceType").as("resource_type"),
      get_json_object(col("json"), "$.id").as("rid"),
      get_json_object(col("json"), "$.url").as("curl"),
      col("json"))
    val excludedCond = exclusions.foldLeft(lit(false))(
      (acc, e) => acc || col("filename").contains(e))
    val inList =
      if (resourceList.isEmpty) lit(true)
      else col("resource_type").isin(resourceList.map(lit): _*) ||
        col("filename").isin(resourceList.map(lit): _*)
    // null-safe scope predicate: a null resource_type makes `isin` NULL,
    // and a bare filter(cond)/filter(!cond) pair would drop such rows
    // from BOTH sides (three-valued logic) — every row must land in
    // exactly one of scoped/excluded
    val inScope = coalesce(inList && !excludedCond, lit(false))
    val scoped = annotated.filter(inScope)
      // the explode below feeds two phases; tiny (IG-sized) either way
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val excludedRows = annotated.filter(!inScope)
      .select(col("filename"), col("resource_type"),
        lit("excluded").as("action"), lit(null).cast("int").as("status"))

    // rows without a resourceType can be neither deleted nor loaded (the
    // REST URL needs the type) — surface them as action="invalid" instead
    // of silently vanishing from both phases (a bare `!isIg` filter would
    // null them out of each side)
    val invalidRows = scoped.filter(col("resource_type").isNull)
      .select(col("filename"), col("resource_type"),
        lit("invalid").as("action"), lit(null).cast("int").as("status"))
    val isIg = coalesce(col("resource_type") === "ImplementationGuide", lit(false))
    val igRows = scoped.filter(isIg).collect() // <= 1 per IG by construction
    val rest = scoped.filter(!isIg && col("resource_type").isNotNull)

    def opt(r: Row, i: Int): Option[String] = Option(r.getString(i))

    // phase 1: force-overwrite deletes, IG last, then settle
    val deleteResults: Seq[DataFrame] =
      if (!forceOverwrite) Nil
      else {
        val restDeleted = rest.mapPartitions { rows =>
          val client = makeClient()
          rows.map { r =>
            val gone = client.delete(r.getString(1), opt(r, 3), opt(r, 2))
            Row(r.getString(0), r.getString(1),
              if (gone) "deleted" else "delete-miss", null)
          }
        }(Encoders.row(resultSchema)).localCheckpoint(true) // side effects run once, now
        val igDeleted = igRows.toSeq.map { r =>
          val gone = makeClient().delete(r.getString(1), opt(r, 3), opt(r, 2))
          Row(r.getString(0), r.getString(1), if (gone) "deleted" else "delete-miss", null)
        }
        val nDeleted = restDeleted.filter(col("action") === "deleted").count() +
          igDeleted.count(_.getString(2) == "deleted")
        if (nDeleted > 0) // ref: igload:216-219
          sleeper(settleBaseMillis + settleMillisPerItem * nDeleted)
        Seq(restDeleted, spark.createDataFrame(igDeleted.asJava, resultSchema))
      }

    // phase 2: loads, IG last (igload:225-243). The HTTP status decides
    // the action — a 4xx/5xx is a load-failed row, never a silent success
    def loadAction(status: Int): String = if (status < 300) "loaded" else "load-failed"
    val restLoaded = rest.mapPartitions { rows =>
      val client = makeClient()
      rows.map { r =>
        val status = client.load(r.getString(1), opt(r, 3), r.getString(4), forceOverwrite)
        Row(r.getString(0), r.getString(1), loadAction(status), status)
      }
    }(Encoders.row(resultSchema)).localCheckpoint(true)
    val igLoaded = igRows.toSeq.map { r =>
      val status = makeClient().load(r.getString(1), opt(r, 3), r.getString(4), forceOverwrite)
      Row(r.getString(0), r.getString(1), loadAction(status), status)
    }

    val out = (deleteResults :+ restLoaded :+ spark.createDataFrame(igLoaded.asJava, resultSchema))
      .reduce(_ unionByName _)
      .unionByName(invalidRows.localCheckpoint(true))
      .unionByName(excludedRows)
    scoped.unpersist() // both phases are checkpointed; nothing re-reads it
    out
  }
}

/**
 * Standard-FHIR-REST [[IgLoad.Client]] (the reference delegates the same
 * operations to its client library — delete_by_query / load with
 * skip_insert_if_present, igload:28-55, 300-306):
 *  - delete: conditional `DELETE Type?url=` when the resource has a
 *    canonical url (IG artifacts may load under server-assigned ids —
 *    igload:30-31), else `DELETE Type/id`;
 *  - load: conditional create (`If-None-Exist: url=`) when present and
 *    not overwriting, conditional update (`PUT Type?url=`) when
 *    overwriting, plain POST otherwise.
 */
class HttpIgClient(
    baseUrl: String,
    headers: Map[String, String] = Map.empty) extends IgLoad.Client {

  private lazy val client = java.net.http.HttpClient.newHttpClient()

  private def request(method: String, url: String, body: Option[String],
      extraHeaders: Map[String, String] = Map.empty): Int = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
    (headers ++ extraHeaders).foreach { case (k, v) => b.header(k, v) }
    body.foreach(_ => b.header("Content-Type", "application/fhir+json"))
    val req = b.method(method, body
      .map(s => java.net.http.HttpRequest.BodyPublishers.ofString(s,
        java.nio.charset.StandardCharsets.UTF_8))
      .getOrElse(java.net.http.HttpRequest.BodyPublishers.noBody())).build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  override def delete(resourceType: String, url: Option[String], id: Option[String]): Boolean = {
    val target = url.map(u => s"$baseUrl/$resourceType?url=${enc(u)}")
      .orElse(id.map(i => s"$baseUrl/$resourceType/$i"))
    target.exists(t => request("DELETE", t, None) < 300)
  }

  override def load(resourceType: String, url: Option[String], json: String,
      forceOverwrite: Boolean): Int = url match {
    case Some(u) if forceOverwrite =>
      request("PUT", s"$baseUrl/$resourceType?url=${enc(u)}", Some(json))
    case Some(u) =>
      request("POST", s"$baseUrl/$resourceType", Some(json),
        Map("If-None-Exist" -> s"url=${enc(u)}"))
    case None =>
      request("POST", s"$baseUrl/$resourceType", Some(json))
  }
}
