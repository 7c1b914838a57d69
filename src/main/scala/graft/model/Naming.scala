package graft.model

/**
 * Pure scalar helpers mirroring the reference's field/value normalization
 * semantics (ref: wstlr/__init__.py:143-194). These run driver-side on
 * schema metadata (column renames are zero-cost in Spark) and are also
 * exposed as Column expressions in [[graft.functions.WhistlerFunctions]]
 * for data-level use.
 */
object Naming {

  /** Column-name normalization (ref: wstlr/__init__.py:153-161):
   *  lowercase, trim, space->underscore, drop parens, slash->underscore. */
  def fixFieldName(fieldName: String): String =
    fieldName.toLowerCase.trim
      .replace(" ", "_")
      .replace(")", "")
      .replace("(", "")
      .replace("/", "_")

  private val SemicolonWs = ";\\s+".r

  /** Value cleaning (ref: wstlr/__init__.py:143-150): collapse ";  " -> ";",
   *  trim. Null-safe (null -> ""). */
  def cleanValues(valueString: String): String =
    if (valueString == null) "" else SemicolonWs.replaceAllIn(valueString.trim, ";")

  private val TruthySet = Set("true", "yes", "1")

  /** Truthy-set bool coercion (ref: wstlr/__init__.py:183-194). */
  def evaluateBool(value: Any): Boolean = value match {
    case b: Boolean => b
    case s: String  => TruthySet.contains(s.toLowerCase)
    case i: Int     => i == 1
    case l: Long    => l == 1L
    case _          => false
  }

  /** Data-dictionary system URL assembly (ref: wstlr/__init__.py:164-180):
   *  base/term/data-dictionary[/consentGroup]/table[/var], each path part
   *  fieldname-normalized. */
  def ddSystemUrl(
      urlBase: String,
      termType: String,
      consentGroup: Option[String],
      tableName: String,
      varName: Option[String]): String = {
    val sb = new StringBuilder(s"$urlBase/$termType/data-dictionary")
    consentGroup.filter(_.trim.nonEmpty).foreach(cg => sb ++= "/" + fixFieldName(cg))
    sb ++= "/" + fixFieldName(tableName)
    varName.foreach(v => sb ++= "/" + fixFieldName(v))
    sb.result()
  }

  /** Default missing-value sentinels (ref: wstlr/extractor.py:209). */
  val DefaultMissing: Seq[String] = Seq("NA", "", "Not Provided")
}

/** Unrecognized DD type (ref: wstlr/__init__.py:59-68). */
final case class InvalidDdType(typeName: String)
    extends Exception(s"Unrecognized variable type, $typeName.")

/**
 * Canonical data-dictionary types and accepted spellings
 * (ref: wstlr/__init__.py:17-77). First spelling in each family is
 * canonical; lookup is ordered, so "string" canonicalizes to string
 * (not enumeration) exactly as the reference's OrderedDict does.
 */
object DdType {
  val String = "string"
  val Integer = "int"
  val Boolean = "boolean"
  val Number = "number"
  val Enumeration = "enumeration"
  val Date = "date"

  /** Ordered (family-canonical -> accepted spellings). */
  val families: Seq[(String, Seq[String])] = Seq(
    String -> Seq("string", "", "str", "identifier"),
    Integer -> Seq("int", "integer"),
    Boolean -> Seq("boolean", "bool"),
    Number -> Seq("number", "decimal", "float", "numeric"),
    Enumeration -> Seq("enumeration", "string", "integer, encoded value"),
    Date -> Seq("date")
  )

  /** Spelling -> canonical, hard error on unknown (ref: __init__.py:71-77). */
  def standardize(ddType: String): String = {
    val lower = if (ddType == null) "" else ddType.toLowerCase
    families.collectFirst { case (canon, spellings) if spellings.contains(lower) => canon }
      .getOrElse(throw InvalidDdType(ddType))
  }
}

/** Table restructuring kind (ref: wstlr/__init__.py:53-57, 80-86):
 *  embed takes precedence over group_by. */
sealed trait TableType
object TableType {
  case object Default extends TableType
  case object Embedded extends TableType
  case object Grouped extends TableType

  def determine(hasEmbed: Boolean, hasGroupBy: Boolean): TableType =
    if (hasEmbed) Embedded else if (hasGroupBy) Grouped else Default
}
