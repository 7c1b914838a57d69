package graft.project

import graft.functions.WhistlerFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The projection layer: per-row document construction replacing the
 * Whistle subprocess (SURVEY.md §3.1/§7.5). Each projection is a pure
 * Column-composition over the extracted table plus broadcast harmony
 * lookups — one codegen'd projection stage per module, no UDFs, no
 * shuffle beyond the broadcast joins.
 *
 * Output contract (shared by every projection):
 * `(module, resourceType, id, resource)` where `resource` is the JSON
 * document — the DataFrame the inspect/sink layers consume
 * (SURVEY.md §1.1 "FHIR resource / bundle").
 */
object Projection {

  /** Study identity carried into resources (ref: wstlr/config.py:91-207:
   *  study_id, identifier_prefix, publisher). */
  final case class StudyInfo(
      id: String,
      identifierPrefix: String,
      publisher: String = "NCPI FHIR Working Group")

  /**
   * The Participant -> Patient projection — the reference's canonical
   * example (ref: docs/ref/pipeline_overview.md:48-58):
   *
   *  - meta.tag[]: StudyMeta
   *  - identifier[]: Key_Identifier(study, "Patient", participant_id),
   *    use "official"
   *  - gender: HarmonizeAsCode(sex, "Sex") when sex is present and not
   *    the "." placeholder
   *  - extension[]: RaceExtension + EthnicityExtension (each omitted when
   *    its input is absent)
   *  - resourceType: Patient
   *
   * `harmonyLookup` is [[graft.harmony.Harmony.codingsLookup]] output;
   * the three lookup joins broadcast the mapping dimension, so the
   * subjects table itself is never shuffled.
   */
  def participant(
      subjects: DataFrame,
      study: StudyInfo,
      harmonyLookup: DataFrame,
      idCol: String = "participant_id",
      sexCol: String = "sex",
      raceCol: String = "race",
      ethnicityCol: String = "ethnicity"): DataFrame = {

    val prefix = lit(study.identifierPrefix)
    val withCodings =
      harmonize(
        harmonize(
          harmonize(subjects, harmonyLookup, sexCol, "Sex", "_sex_codings"),
          harmonyLookup, raceCol, "Race", "_race_codings"),
        harmonyLookup, ethnicityCol, "Ethnicity", "_eth_codings")

    val identifierEntry = struct(
      keyIdentifier(prefix, lit("Patient"), col(idCol)).getField("value").as("value"),
      keyIdentifier(prefix, lit("Patient"), col(idCol)).getField("system").as("system"),
      lit("official").as("use"))

    val gender = when(col(sexCol).isNotNull && col(sexCol) =!= ".",
      harmonizeAsCode(nonSelfOnly(col("_sex_codings"))))

    val extensions = array_compact(array(
      raceExtension(col(raceCol), nonSelfOnly(col("_race_codings"))),
      ethnicityExtension(col(ethnicityCol), nonSelfOnly(col("_eth_codings")))))

    val resource = struct(
      lit("Patient").as("resourceType"),
      struct(array(studyMeta(prefix, lit(study.id))).as("tag")).as("meta"),
      array(identifierEntry).as("identifier"),
      gender.as("gender"),
      when(size(extensions) > 0, extensions).as("extension"))

    withCodings.select(
      lit("patient").as("module"),
      lit("Patient").as("resourceType"),
      col(idCol).as("id"),
      to_json(resource).as("resource"))
  }
}
