package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, functions => F}

/**
 * The Whistle-replacement projection function library: every function the
 * shipped `.wstl` code uses, re-expressed as `Column` combinators so the
 * whole projection layer stays inside Catalyst (codegen'd, no UDFs —
 * SURVEY.md §2.9). Document-omission semantics (Whistle skips absent
 * fields) map to nullable struct fields: `to_json` drops nulls, so the
 * emitted resources match the reference's JSON shape.
 *
 * Coding arrays are `array<struct<code, display, system>>` — the shape
 * [[graft.harmony.Harmony.codingsLookup]] produces.
 */
object WhistlerFunctions {

  // --- Whistle built-ins (ref: SURVEY.md §2.8 built-in list) ------------

  /** $StrCat (ref: wlib/core/_key_identifier.wstl:15). */
  def strCat(cols: Column*): Column = concat(cols: _*)

  /** $StrSplit / $StrJoin (ref: wlib/core/_replace_in_string.wstl:4-7). */
  def strSplit(c: Column, sep: String): Column = split(c, java.util.regex.Pattern.quote(sep))
  def strJoin(sep: String, parts: Column): Column = array_join(parts, sep)

  /** $ToLower / $MatchesRegex / $ListLen / $IsNotNil. */
  def toLower(c: Column): Column = lower(c)
  def matchesRegex(c: Column, pattern: String): Column = c.rlike(pattern)
  def listLen(c: Column): Column = size(c)
  def isNotNil(c: Column): Column = c.isNotNull

  /** $ParseInt / $ParseFloat with the reference's try-parse-else-string
   *  discipline (SURVEY.md §1.2): these return the typed value or null;
   *  [[isNumeric]] routes the value to the typed vs string field, exactly
   *  like observation_w_components.wstl:37-63 branches on $Type. */
  def parseInt(c: Column): Column = c.cast("string").try_cast("long")
  def parseFloat(c: Column): Column = c.cast("string").try_cast("double")
  def isNumeric(c: Column): Column = parseFloat(c).isNotNull

  // --- Column twins of the Naming scalar helpers ------------------------
  // (driver-side forms in graft.model.Naming; these are the data-level
  // equivalents for when the value — not the schema — carries a name)

  /** fix_fieldname as a Column (ref: wstlr/__init__.py:153-161). */
  def fixFieldName(c: Column): Column =
    translate(regexp_replace(lower(trim(c)), "[()]", ""), " /", "__")

  /** clean_values as a Column (ref: wstlr/__init__.py:143-150). */
  def cleanValues(c: Column): Column =
    regexp_replace(trim(coalesce(c, lit(""))), ";\\s+", ";")

  /** evaluate_bool as a Column (ref: wstlr/__init__.py:183-194). */
  def evaluateBool(c: Column): Column =
    lower(c.cast("string")).isin("true", "yes", "1")

  // --- Core document constructors ---------------------------------------

  /** BuildCoding (ref: wlib/core/_build_coding.wstl:8-12): display/system
   *  are omitted when empty — empty string maps to null, which to_json
   *  then drops. */
  def buildCoding(code: Column, display: Column, system: Column): Column =
    struct(
      code.as("code"),
      nullif(display, lit("")).as("display"),
      nullif(system, lit("")).as("system"))

  /** Key_Identifier (ref: wlib/core/_key_identifier.wstl:13-16):
   *  {value, system: "<identifier-prefix>/<lower(resourceType)>"}. */
  def keyIdentifier(identifierPrefix: Column, resourceType: Column, value: Column): Column =
    struct(
      value.as("value"),
      concat(identifierPrefix, lit("/"), lower(resourceType)).as("system"))

  /** Reference_Key_Identifier (ref: _reference_key_identifier.wstl:11-13). */
  def referenceKeyIdentifier(identifierPrefix: Column, resourceType: Column, value: Column): Column =
    struct(keyIdentifier(identifierPrefix, resourceType, value).as("identifier"))

  /** StudyMeta (ref: wlib/core/_study_meta.wstl:5-9): the study id as
   *  code under the study's ResearchStudy identifier system. */
  def studyMeta(identifierPrefix: Column, studyId: Column): Column = {
    val ki = keyIdentifier(identifierPrefix, lit("ResearchStudy"), studyId)
    struct(ki.getField("value").as("code"), ki.getField("system").as("system"))
  }

  /** StringReplace (ref: _replace_in_string.wstl:4-7) — literal
   *  split+join, not regex. */
  def stringReplace(c: Column, oldStr: String, newStr: String): Column =
    array_join(split(c, java.util.regex.Pattern.quote(oldStr)), newStr)

  /** ConvertForValueSetURL (ref: _convert_for_valueset_url.wstl:4-6). */
  def convertForValueSetUrl(url: Column): Column =
    stringReplace(url, "/CodeSystem/", "/ValueSet/")

  /** BuildVariableTerminologyId / BuildTableTerminologyId
   *  (ref: _build_terminology_id.wstl:8-20): period-joined composites.
   *  The collision caveat from SURVEY.md §7 applies — reproduced for
   *  compatibility. */
  def buildVariableTerminologyId(studyId: Column, tableName: Column, varname: Column): Column =
    concat_ws(".", studyId, tableName, varname)
  def buildTableTerminologyId(studyId: Column, tableName: Column): Column =
    concat_ws(".", studyId, tableName)

  /** Group key concatenation (ref: wstlr/extractor.py:62): colon-joined. */
  def groupKey(cols: Column*): Column = concat_ws(":", cols: _*)

  // --- Harmonized-coding filters (over array<struct<code,display,system>>)

  /** SelfOnly (ref: wlib/core/_self_only.wstl:7-11): keep codings whose
   *  system is exactly `self`. */
  def selfOnly(codings: Column): Column =
    filter(codings, c => c.getField("system") === "self")

  /** NonSelfOnly (ref: _non_self_harmony.wstl:7-11): drop `self` and any
   *  `*-unharmonized` system. */
  def nonSelfOnly(codings: Column): Column =
    filter(codings, c =>
      c.getField("system") =!= "self" && !c.getField("system").rlike("-unharmonized"))

  /** HarmonizeSelection (ref: _harmonize_selection.wstl:4-8): keep
   *  codings whose system matches the prefix (the reference's
   *  `$MatchesRegex(system, prefix + "*")` is an unanchored substring
   *  match; the intent — and this implementation — is prefix match). */
  def harmonizeSelection(codings: Column, prefix: String): Column =
    filter(codings, c => c.getField("system").startsWith(prefix))

  /** HarmonizeMapped (ref: _harmonize_mapped.wstl:7-10): the non-self
   *  external mappings of a harmonized coding array. */
  def harmonizeMapped(codings: Column): Column = nonSelfOnly(codings)

  /** HarmonizeAsCoding (ref: _harmonize_as_coding.wstl:7-9):
   *  `{coding: [...]}` — the CodeableConcept shell around the mapped
   *  codings. */
  def harmonizeAsCoding(codings: Column): Column =
    struct(nonSelfOnly(codings).as("coding"))

  /** HarmonizedLocalDisplay (ref: _harmonized_local_display.wstl:7-11):
   *  the self coding's display — the original question/description for a
   *  substituted varname. */
  def harmonizedLocalDisplay(codings: Column): Column =
    harmonizeFirst(selfOnly(codings)).getField("display")

  /** First harmonized coding (HarmonizeMappedFirst usage in
   *  _race_extension.wstl:23) — null when no mapping. */
  def harmonizeFirst(codings: Column): Column =
    when(size(codings) > 0, element_at(codings, 1))

  /** HarmonizeAsCode: the first mapped coding's bare code
   *  (pipeline_overview.md:53 `gender: HarmonizeAsCode(...)`). */
  def harmonizeAsCode(codings: Column): Column =
    harmonizeFirst(codings).getField("code")

  /**
   * The $HarmonizeCode hook (ref: wlib/core/_harmonize.wstl:7-9) as a
   * broadcast lookup join: attaches `outCol` =
   * array<struct<code,display,system>> for (codeCol, system) against the
   * [[graft.harmony.Harmony.codingsLookup]] table; misses get [].
   * The lookup side is a mapping dimension — always broadcast.
   */
  def harmonize(
      df: DataFrame,
      lookup: DataFrame,
      codeCol: String,
      system: String,
      outCol: String): DataFrame = {
    val keyed = lookup
      .filter(col("system") === system)
      .select(col("code").as("_hc_code"), col("codings").as("_hc_codings"))
    df.join(F.broadcast(keyed), df(codeCol) === col("_hc_code"), "left")
      .withColumn(outCol, coalesce(col("_hc_codings"), array()))
      .drop("_hc_code", "_hc_codings")
  }

  // --- FHIR extension builders ------------------------------------------

  /** Uniform extension-entry struct: nullable value[x] fields; to_json
   *  drops the nulls so each entry serializes with only its own value
   *  type — the relational answer to Whistle's heterogeneous objects. */
  private def extEntry(
      url: Column,
      valueString: Column = lit(null).cast("string"),
      valueCode: Column = lit(null).cast("string"),
      valueCoding: Column = lit(null).cast("struct<code:string,display:string,system:string>"),
      valueReference: Column = lit(null).cast("struct<identifier:struct<value:string,system:string>>"),
      valueDuration: Column = lit(null).cast("struct<value:double,unit:string,system:string,code:string>")): Column =
    struct(url.as("url"), valueString.as("valueString"), valueCode.as("valueCode"),
      valueCoding.as("valueCoding"), valueReference.as("valueReference"),
      valueDuration.as("valueDuration"))

  /**
   * AgeAtExtension (ref: wlib/core/_age_at_extension.wstl:13-43): an
   * age-at-event as FHIR's cqf-relativeDateTime extension anchored on the
   * patient's birthDate; `years` and `days` branches differ in the
   * duration units (and the reference's years branch omits `unit`).
   * Null when age is null.
   */
  def ageAtExtension(
      identifierPrefix: Column,
      subjectId: Column,
      age: Column,
      ageUnit: String): Column = {
    require(ageUnit == "years" || ageUnit == "days", s"age_unit must be years|days, got $ageUnit")
    val duration =
      if (ageUnit == "years")
        struct(parseInt(age).cast("double").as("value"),
          lit(null).cast("string").as("unit"),
          lit("http://unitsofmeasure.org").as("system"), lit("a").as("code"))
      else
        struct(parseFloat(age).as("value"), lit("d").as("unit"),
          lit("http://unitsofmeasure.org").as("system"), lit("days").as("code"))
    when(age.isNotNull,
      struct(
        lit("http://hl7.org/fhir/StructureDefinition/cqf-relativeDateTime").as("url"),
        array(
          extEntry(lit("target"),
            valueReference = referenceKeyIdentifier(identifierPrefix, lit("Patient"), subjectId)),
          extEntry(lit("targetPath"), valueString = lit("birthDate")),
          extEntry(lit("relationship"), valueCode = lit("after")),
          extEntry(lit("offset"), valueDuration = duration)).as("extension")))
  }

  /**
   * RaceExtension / EthnicityExtension
   * (ref: wlib/core/_race_extension.wstl:21-37, _ethnicty_extension.wstl):
   * the US-core extension with the harmonized OMB coding when the mapping
   * exists, else just the raw text; absent (null / "NA") input yields
   * null (omitted by to_json).
   */
  def ombExtension(extensionUrl: String, raw: Column, codings: Column): Column = {
    val mapped = harmonizeFirst(codings)
    val withCoding = struct(
      lit(extensionUrl).as("url"),
      array(
        extEntry(lit("ombCategory"), valueCoding = mapped),
        extEntry(lit("text"), valueString = raw)).as("extension"))
    val withoutCoding = struct(
      lit(extensionUrl).as("url"),
      array(extEntry(lit("text"), valueString = raw)).as("extension"))
    when(raw.isNotNull && raw =!= "NA",
      when(mapped.isNotNull, withCoding).otherwise(withoutCoding))
  }

  val RaceExtensionUrl = "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race"
  val EthnicityExtensionUrl = "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity"

  def raceExtension(race: Column, codings: Column): Column =
    ombExtension(RaceExtensionUrl, race, codings)
  def ethnicityExtension(ethnicity: Column, codings: Column): Column =
    ombExtension(EthnicityExtensionUrl, ethnicity, codings)
}
