package graft.harmony

import graft.model.{CodeEntry, Naming}
import graft.operators.Restructure
import graft.sources.CsvSource
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * The code-harmonization layer: harmony CSVs -> ConceptMap structure +
 * lookup surfaces (ref: wstlr/conceptmap.py, docs/ref/harmony_files.md).
 *
 * Shapes and their scale posture:
 *  - harmony files are *dimension* inputs — every transform below is a
 *    DataFrame op (window dedup, hash agg), so nothing breaks if a
 *    mapping table grows large; the only driver-side steps are the JSON
 *    document assembly and the broadcast-map builders, both documented
 *    dimension-sized by contract;
 *  - the dedup polarity is exactly the reference's: FIRST-wins when
 *    deduping raw mapping rows (ref: conceptmap.py:419-428), LAST-wins
 *    when duplicate target codes overwrite inside ObjectifyHarmony
 *    (ref: conceptmap.py:87-107), with the duplicate report preserved.
 */
object Harmony {

  /** Required (lowercased) harmony columns (ref: docs/ref/harmony_files.md). */
  val RequiredColumns: Seq[String] =
    Seq("local code system", "local code", "code system", "code", "display", "text")

  private val rid = col(Restructure.RowId)

  /**
   * Read one or more harmony CSVs as one logical mapping table
   * (ref: conceptmap.py:396-403 — lowercased headers, multi-file parts
   * of the same harmony file). Adds `_rid` for first-seen-order
   * semantics; a missing `code system` cell becomes '' (ref:
   * conceptmap.py:407-408).
   */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val df = CsvSource.read(spark, paths, headerMode = CsvSource.Lowercased, withRowId = true)
    val missing = RequiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Harmony file missing required column(s): ${missing.mkString(", ")}; " +
        s"found: ${df.columns.mkString(", ")}")
    df.withColumn("code system", coalesce(col("code system"), lit("")))
  }

  /**
   * First-wins dedup on (local code system, local code, code system, code)
   * (ref: conceptmap.py:419-428 `observed_mappings`). One shuffle on the
   * mapping key.
   */
  def firstWins(df: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("local code system"), col("local code"), col("code system"), col("code"))
      .orderBy(rid)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /**
   * Every mapping row belongs to its own target group AND (when its code
   * system is non-empty) to the '' group that becomes the `self` mapping
   * (ref: conceptmap.py:426-428). Row order inside the '' group is file
   * order — both appends happen per row in read order.
   */
  def selfExpand(df: DataFrame): DataFrame = {
    val tagged = df.withColumn("_target_group", col("code system"))
    tagged.unionByName(
      df.filter(trim(col("code system")) =!= "")
        .withColumn("_target_group", lit("")))
  }

  private def curiePrefix(curies: Map[String, String], target: Column): Column =
    if (curies.isEmpty) lit("")
    else {
      val m = map(curies.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v + ":")) }: _*)
      coalesce(element_at(m, target), lit(""))
    }

  /**
   * ConceptMap groups: one row per (source system, target system) with the
   * order-preserved element array (ref: conceptmap.py:438-486). Elements
   * are grouped by local code in first-seen order — the *intended*
   * semantics of the reference's adjacency-run grouping
   * (conceptmap.py:455-469; SURVEY.md §2.6) — with target codings in row
   * order. The '' group surfaces as target `self` whose codings echo the
   * local code with the human-readable text (conceptmap.py:444-483);
   * curie prefixes apply to real target systems only.
   *
   * Output: (source, target, element, _gord) where element is
   * array<struct<code, display, target: array<struct<code, display,
   * equivalence>>>> and _gord orders groups by first appearance.
   */
  def conceptMapGroups(df: DataFrame, curies: Map[String, String] = Map.empty): DataFrame = {
    val expanded = selfExpand(firstWins(df))
    val isSelf = trim(col("_target_group")) === ""
    val theTarget = when(isSelf, lit("self")).otherwise(col("_target_group"))
    val targetEntry = struct(
      when(isSelf, col("local code"))
        .otherwise(concat(curiePrefix(curies, col("_target_group")), col("code"))).as("code"),
      when(isSelf, col("text")).otherwise(col("display")).as("display"),
      lit("equivalent").as("equivalence"))

    val elems = expanded
      .withColumn("_the_target", theTarget)
      .groupBy(col("local code system").as("source"), col("_the_target").as("target"),
        col("local code"))
      .agg(
        min(rid).as("_eord"),
        min_by(col("text"), rid).as("_display"),
        sort_array(collect_list(struct(rid.as("_o"), targetEntry.as("t")))).as("_ts"))
      .withColumn("_targets", expr("transform(_ts, x -> x.t)"))

    elems
      .groupBy(col("source"), col("target"))
      .agg(
        min(col("_eord")).as("_gord"),
        sort_array(collect_list(struct(col("_eord"),
          struct(col("local code").as("code"), col("_display").as("display"),
            col("_targets").as("target")).as("e")))).as("_es"))
      .withColumn("element", expr("transform(_es, x -> x.e)"))
      .select(col("source"), col("target"), col("element"), col("_gord"))
  }

  /**
   * DD-derived identity groups appended to the ConceptMap so variable
   * categoricals harmonize through the same mechanism
   * (ref: conceptmap.py:488-536): source = varname (or table name),
   * target = the CodeSystem URL, each code mapping to itself.
   */
  def identityGroup(source: String, targetUrl: String, values: Seq[CodeEntry]):
      (String, String, Seq[(String, String, Seq[(String, String, String)])]) =
    (source, targetUrl,
      values.map(v => (v.code, v.description, Seq((v.code, v.description, "equivalent")))))

  /**
   * Assemble the harmony ConceptMap JSON document
   * (ref: conceptmap.py:430-540: {id, resourceType, version, group}).
   * Groups are collected to the driver — this is the document *writer*
   * for a dimension-sized mapping, not a data path.
   */
  def conceptMapJson(
      groups: DataFrame,
      namePrefix: String,
      extraGroups: Seq[(String, String, Seq[(String, String, Seq[(String, String, String)])])] = Nil): String = {
    val ordered = groups.orderBy(col("_gord"))
      .select(to_json(struct(col("source"), col("target"), col("element"))).as("g"))
      .collect().map(_.getString(0))
    val extras = extraGroups.map { case (source, target, elements) =>
      val elems = elements.map { case (code, display, targets) =>
        val ts = targets.map { case (c, d, eq) =>
          s"""{"code":${q(c)},"display":${q(d)},"equivalence":${q(eq)}}"""
        }.mkString("[", ",", "]")
        s"""{"code":${q(code)},"display":${q(display)},"target":$ts}"""
      }.mkString("[", ",", "]")
      s"""{"source":${q(source)},"target":${q(target)},"element":$elems}"""
    }
    (ordered ++ extras).mkString(
      s"""{"id":${q(namePrefix)},"resourceType":"ConceptMap","version":"v1","group":[""",
      ",", "]}")
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /**
   * The `local code -> display` map used for `_display` derived columns
   * (ref: wstlr/extractor.py:274-282). LAST-wins on duplicates (dict
   * overwrite in the reference). Driver-side map for
   * [[graft.operators.DisplayColumns]]; dimension-sized by contract.
   */
  def displayMap(df: DataFrame): Map[String, String] =
    df.groupBy(col("local code"))
      .agg(max_by(col("display"), rid).as("display"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /**
   * Harmonize-lookup surface (the $HarmonizeCode hook,
   * ref: wlib/core/_harmonize.wstl:7-9): one row per (local code, local
   * code system) with the full array of harmonized codings
   * {code, display, system} — system is the target system or `self`.
   * Broadcast-join this against data on (code, system); the
   * Self/NonSelf/prefix filters in [[graft.functions.WhistlerFunctions]]
   * then select within the array.
   */
  def codingsLookup(df: DataFrame, curies: Map[String, String] = Map.empty): DataFrame = {
    val expanded = selfExpand(firstWins(df))
    val isSelf = trim(col("_target_group")) === ""
    val coding = struct(
      when(isSelf, col("local code"))
        .otherwise(concat(curiePrefix(curies, col("_target_group")), col("code"))).as("code"),
      when(isSelf, col("text")).otherwise(col("display")).as("display"),
      when(isSelf, lit("self")).otherwise(col("_target_group")).as("system"))
    // sort key: (source row, self-after-target). The self copy shares its
    // source row's rid, so a bare rid sort would tie and fall back to
    // lexicographic struct comparison — the reference's group flattening
    // puts the row's target coding before its self coding
    // (conceptmap.py:425-428: the target-group append precedes the
    // ''-group append, and group insertion order is preserved).
    expanded
      .groupBy(col("local code").as("code"), col("local code system").as("system"))
      .agg(sort_array(collect_list(struct(rid.as("_o"),
        when(isSelf, 1).otherwise(0).as("_s"), coding.as("c")))).as("_cs"))
      .withColumn("codings", expr("transform(_cs, x -> x.c)"))
      .select(col("code"), col("system"), col("codings"))
  }

  /**
   * The harmony ConceptMap's source-side code groups
   * (ref: conceptmap.py:108-118 `vs_sources` + 145-168 emit): per
   * (local code system, table, parent varname), the ordered distinct
   * (code, display-text) pairs, with the group's system a constructed
   * DD CodeSystem URL and curie prefixes applied per local system.
   * Feeds the sources HarmonyValueSet.
   */
  def sourceCodeGroups(df: DataFrame, curies: Map[String, String] = Map.empty,
      consentGroup: Option[String] = None,
      urlBase: String = graft.model.Dd.SystemBase): DataFrame = {
    // ObjectifyHarmony-side columns (the ConceptMap path needs only the 6
    // required ones; the ValueSet path also needs the accounting columns)
    require(Seq("table_name", "parent_varname").forall(df.columns.contains),
      s"source code groups need table_name/parent_varname columns; found: ${df.columns.mkString(", ")}")
    val rows = df.filter(trim(col("table_name")) =!= "")
    val fix = (c: Column) => graft.functions.WhistlerFunctions.fixFieldName(c)
    val consentSeg = consentGroup.filter(_.trim.nonEmpty)
      .map(cg => "/" + Naming.fixFieldName(cg)).getOrElse("")
    val system = concat(lit(s"$urlBase/CodeSystem/data-dictionary$consentSeg/"),
      fix(col("table_name")), lit("/"), fix(col("local code system")))
    val code = concat(curiePrefix(curies, col("local code system")), col("local code"))
    val w = Window.partitionBy(col("local code system"), col("table_name"),
      col("parent_varname"), code, col("text")).orderBy(rid)
    rows
      .withColumn("_dup", row_number().over(w)).filter(col("_dup") === 1)
      .groupBy(col("local code system"), col("table_name"), col("parent_varname"))
      .agg(
        min(rid).as("_gord"),
        min_by(system, rid).as("system"),
        sort_array(collect_list(struct(rid.as("_o"),
          struct(code.as("code"), col("text").as("display")).as("c")))).as("_cs"))
      .withColumn("codes", expr("transform(_cs, x -> x.c)"))
      .select(col("system"), col("table_name"), col("parent_varname"),
        col("codes"), col("_gord"))
  }

  /**
   * The target-side code groups (ref: conceptmap.py:119-127 `targets`
   * last-wins + 169-181 emit): per target system, the distinct target
   * (curie-prefixed code, display) pairs, duplicates overwritten by the
   * last row. Feeds the targets HarmonyValueSet.
   */
  def targetCodeGroups(df: DataFrame, curies: Map[String, String] = Map.empty): DataFrame = {
    val rows = df.filter(trim(col("table_name")) =!= "" && trim(col("code system")) =!= "")
    val code = concat(curiePrefix(curies, col("code system")), col("code"))
    // Python dict overwrite semantics (conceptmap.py:121-127
    // `targets[cs][code] = {...}`): the VALUE is the last row's, but the
    // insertion ORDER is the first occurrence's — so codes sort by the
    // key's MIN rid while the kept row is the max-rid one, and group
    // order likewise uses the system's first occurrence.
    val keyW = Window.partitionBy(col("code system"), code)
    val w = keyW.orderBy(desc(Restructure.RowId))
    rows
      .withColumn("_ord", min(rid).over(keyW))
      .withColumn("_gmin", min(rid).over(Window.partitionBy(col("code system"))))
      .withColumn("_dup", row_number().over(w)).filter(col("_dup") === 1) // last wins
      .groupBy(col("code system").as("system"))
      .agg(
        min("_gmin").as("_gord"),
        sort_array(collect_list(struct(col("_ord").as("_o"),
          struct(code.as("code"), col("display").as("display")).as("c")))).as("_cs"))
      .withColumn("codes", expr("transform(_cs, x -> x.c)"))
      .select(col("system"), lit("").as("table_name"), lit("").as("parent_varname"),
        col("codes"), col("_gord"))
  }

  /**
   * Duplicate-mapping report (ref: conceptmap.py:91-107,128-136): keys
   * whose (target system, target code) repeats, with counts — the
   * reference prints the first 10 then "And N more"; we return the
   * DataFrame and let the caller limit.
   */
  def redundantMappings(df: DataFrame): DataFrame =
    df.groupBy(
        concat_ws(":", col("local code system"), col("local code")).as("local_key"),
        concat_ws(":", col("code system"), col("code")).as("target_key"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy(col("local_key"), col("target_key"))
}
