package graft.sink

import graft.Presented

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Sink layer, first slice: the transaction-bundle writer and the
 * study-ids writer (ref: wstlr/bundle.py:68-188, wstlr/studyids.py:85-107).
 *
 * Both are expressed as DataFrame transforms feeding ordinary Spark
 * writes: chunk/dedup/verb decisions are columns, the bundle document is
 * assembled per (module, chunk) by one aggregation, and the write is a
 * partitioned text write — one file per bundle, any number of executors.
 */
object BundleSink {

  sealed trait RequestType { def verb: String }
  case object Put extends RequestType { val verb = "PUT" }
  case object Post extends RequestType { val verb = "POST" }

  /** Records per bundle file (ref: bundle.py:84 `max_records`). */
  val MaxRecords = 15000

  /**
   * Assign each resource its bundle chunk: per-module row number (ordered
   * by `orderCol` for determinism) divided by `maxRecords` — the
   * "new file per module or per 15,000 records" rule (bundle.py:131-134).
   *
   * Scale note: sequential file numbering is inherently a per-module
   * total order, so each module's rows pass through one window
   * partition. Fine for the bundle-file contract (files are consumed
   * sequentially anyway); for unbounded exports prefer
   * `maxRecordsPerFile` on a plain partitioned write instead.
   */
  def assignChunks(resources: DataFrame, moduleCol: String, orderCol: String,
      maxRecords: Int = MaxRecords): DataFrame = {
    val w = Window.partitionBy(col(moduleCol)).orderBy(col(orderCol))
    resources.withColumn("_chunk",
      ((row_number().over(w) - 1) / maxRecords).cast("int"))
  }

  /**
   * Build the bundle entries: fullUrl, verb, destination, entry JSON.
   * PUT keeps resources carrying an `id`; everything else POSTs to the
   * type with the first identifier value as the logical id
   * (ref: bundle.py:135-147). fullUrl duplicates within a module are
   * dropped, first occurrence wins (bundle.py:106-108,150-174).
   *
   * @param resources (module, resourceType, id, resource-JSON) — the
   *                  projection layer's output contract
   */
  def entries(
      resources: DataFrame,
      targetServiceUrl: String,
      requestType: RequestType = Put,
      idCol: String = "id",
      orderCol: String = "id"): DataFrame = {
    val hasId = col(idCol).isNotNull && (requestType == Put)
    val verb = when(hasId, lit("PUT")).otherwise(lit("POST"))
    val destination = when(hasId, concat_ws("/", col("resourceType"), col(idCol)))
      .otherwise(col("resourceType"))
    // POST entries take the first identifier value as the logical id in
    // fullUrl (bundle.py:139-147) — without it every id-less resource of
    // a type would share one fullUrl and the dedup below would silently
    // drop all but the first
    val logicalId = when(hasId, col(idCol))
      .otherwise(get_json_object(col("resource"), "$.identifier[0].value"))
    val fullUrl = concat_ws("/", lit(targetServiceUrl), col("resourceType"), logicalId)
    // first-wins by orderCol, not dropDuplicates — the reference keeps the
    // first duplicate in file order (bundle.py:106-108), and an arbitrary
    // survivor would make bundle content nondeterministic across runs
    val w = Window.partitionBy(col("module"), col("fullUrl")).orderBy(col(orderCol))
    resources
      .withColumn("fullUrl", fullUrl)
      .withColumn("_dup", row_number().over(w)).filter(col("_dup") === 1).drop("_dup")
      .withColumn("entry",
        // the resource column is pre-serialized JSON and splices in raw;
        // scalar strings are JSON-escaped
        concat(
          lit("""{"fullUrl":"""), jsonStr(col("fullUrl")),
          lit(""","resource":"""), col("resource"),
          lit(""","request":{"method":"""), jsonStr(verb),
          lit(""","url":"""), jsonStr(destination), lit("}}")))
      .select(col("module"), col("resourceType"), col(idCol).as("_id"),
        col("fullUrl"), col("entry"))
  }

  /** JSON string literal from a string column (escapes backslash+quote;
   *  ids/urls carry no control characters by construction). */
  private def jsonStr(c: Column): Column =
    concat(lit("\""),
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))

  /**
   * Assemble one transaction-bundle document per (module, chunk)
   * (ref: bundle.py:113-125 header, 150-174 entries): a single
   * aggregation; each output row is one complete bundle file's content.
   */
  def bundles(
      entriesDf: DataFrame,
      bundleId: String,
      maxRecords: Int = MaxRecords): DataFrame = {
    val chunked = assignChunks(entriesDf, "module", "fullUrl", maxRecords)
    chunked
      .groupBy(col("module"), col("_chunk"))
      .agg(concat_ws(",\n", sort_array(collect_list(struct(col("fullUrl"), col("entry")))
        .getField("entry"))).as("_entries"),
        count(lit(1)).as("n_records"))
      .withColumn("bundle", concat(
        lit(s"""{"resourceType":"Bundle","id":"$bundleId","type":"transaction","entry":[\n"""),
        col("_entries"), lit("\n]}")))
      .select(col("module"), col("_chunk").as("chunk"), col("n_records"), col("bundle"))
  }

  /**
   * Write one file per bundle: partitioned text write — executors write
   * their own bundles, nothing funnels through the driver.
   */
  def write(bundlesDf: DataFrame, outDir: String): Unit =
    bundlesDf.select(col("module"), col("chunk"), col("bundle"))
      .repartition(col("module"), col("chunk"))
      .write.partitionBy("module", "chunk").mode("overwrite").text(outDir)
}

/**
 * Study-ids writer (ref: wstlr/studyids.py:85-107): per resourceType, the
 * deduped, sorted id list, emitted as the nested
 * {study: {host: {resourceType: [ids]}}} document, merging rather than
 * overwriting an existing file.
 */
object StudyIdsSink {

  /** The aggregation: `sorted(list(set(ids)))` per resourceType
   *  (studyids.py:103) — one shuffle on resourceType. The output is the
   *  study-ids JSON document's content: per-type id lists destined for
   *  one driver-written file, so the per-type array is document-sized by
   *  contract (the reference builds the same lists in RAM). */
  def sortedIdSets(resources: DataFrame, typeCol: String, idCol: String,
      ordered: Boolean = true): DataFrame =
    resources
      .groupBy(col(typeCol).as("resource_type"))
      .agg(sort_array(collect_set(col(idCol).cast("string"))).as("ids"))
      .transform(Presented(_, ordered, "resource_type"))

  /** Nested JSON document, merged into `existingJson` (merge-not-
   *  overwrite, ref: tests/test_studyids.py:43-57): other studies/hosts
   *  survive; this study's lists replace per resourceType. */
  def toJson(idSets: DataFrame, studyId: String, host: String,
      existingJson: Option[String] = None): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = existingJson
      .map(mapper.readTree(_).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
      .getOrElse(mapper.createObjectNode())
    val study =
      if (root.has(studyId)) root.get(studyId).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else { val n = mapper.createObjectNode(); root.set(studyId, n); n }
    val hostNode =
      if (study.has(host)) study.get(host).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else { val n = mapper.createObjectNode(); study.set(host, n); n }
    // one row per resourceType streamed through the driver
    // (toLocalIterator, the WhistleInputWriter pattern): the driver
    // holds ONE type's id list plus the growing document instead of
    // double-buffering the whole result set next to it — the last
    // full-result collect() in a sink
    val it = idSets.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val arr = mapper.createArrayNode()
      r.getSeq[String](1).foreach(arr.add)
      hostNode.set[com.fasterxml.jackson.databind.JsonNode](r.getString(0), arr)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}
