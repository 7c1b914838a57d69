package graft.model

/**
 * Study configuration surface (ref: wstlr/config.py:91-207 and
 * docs/ref/project_config.md). The reference reads this from YAML; this
 * engine accepts the same shape constructed programmatically or parsed
 * from JSON via [[graft.sources.ConfigReader]] (YAML parsing is out of
 * scope for the zero-egress build; JSON is isomorphic).
 */
final case class EmbedConfig(
    dataset: String, // parent table to embed into
    colname: String, // join column (pre-normalization name ok)
    /** >1 salts the embed join over this many sub-keys — opt-in hot-key
     *  guard for a skewed join column (see
     *  [[graft.operators.SkewJoin]]); 1 = plain join (default). */
    saltBuckets: Int = 1
) {
  def joinColumn: String = Naming.fixFieldName(colname)
}

final case class DataDictionaryConfig(
    filename: String = "",
    colnames: Map[String, String] = Map.empty // alias -> required-name remap
)

final case class DatasetConfig(
    /** Comma-separated list of CSV files unioned in order
     *  (ref: extractor.py:334-351). */
    filename: String = "",
    dataDictionary: Option[DataDictionaryConfig] = None,
    /** Comma-separated group-by key columns (ref: extractor.py:48-62). */
    groupBy: Option[String] = None,
    embed: Option[EmbedConfig] = None,
    codeHarmonization: Option[String] = None,
    /** new-column -> regex for the aggregator pivot (ref: extractor.py:197-204). */
    aggregators: Map[String, String] = Map.empty,
    aggregatorSplitter: Option[String] = None,
    delimiter: String = ",") {

  def tableType: TableType = TableType.determine(embed.isDefined, groupBy.isDefined)
  def files: Seq[String] = filename.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}

final case class StudyConfig(
    studyId: String,
    studyTitle: String = "",
    studyDesc: String = "",
    studyAccession: String = "",
    identifierPrefix: String = "",
    ddPrefix: String = "",
    url: String = "",
    publisher: String = "NCPI FHIR Working Group",
    idColname: Option[String] = None,
    consentGroup: Option[String] = None,
    /** CURIE prefixes: system-url -> CURIE (ref: conceptmap.py:83-86). */
    curies: Map[String, String] = Map.empty,
    /** Which tables to extract: "ALL" -> true, or per-name flags
     *  (ref: extractor.py:251-253, config.py:157-159). */
    activeTables: Map[String, Boolean] = Map("ALL" -> true),
    dataset: Map[String, DatasetConfig] = Map.empty,
    missingValues: Seq[String] = Naming.DefaultMissing,
    annotations: Map[String, String] = Map.empty) {

  /** Table-level pruning: plan construction simply omits inactive tables
   *  (SURVEY.md §4). */
  def isActive(tableName: String): Boolean =
    activeTables.getOrElse("ALL", false) || activeTables.getOrElse(tableName, false)

  def activeDatasets: Map[String, DatasetConfig] =
    dataset.filter { case (name, _) => isActive(name) }
}
