package graft.harmony

import graft.model.{DdStudy, DdVariable}

/**
 * Harmony-skeleton writer (ref: wstlr/harmony.py:77-121): emit an empty
 * harmony CSV row for every DD variable and for every enumerated value
 * that needs a mapping, for domain experts to fill in. Skips values
 * whose description is yes/no and numeric-parseable descriptions
 * (harmony.py:75,101-108); extra filters are pluggable functors
 * (harmony.py:92-95).
 *
 * Row shape: (local code, text, local code system) with the target
 * columns left blank — the header matches [[Harmony.RequiredColumns]]
 * plus `comment`, so a filled skeleton reads straight back through
 * [[Harmony.read]].
 */
object HarmonySkeleton {

  /** Values whose description never needs mapping (harmony.py:75). */
  val IgnoredValues: Set[String] = Set("yes", "no")

  final case class SkeletonRow(localCode: String, text: String, localCodeSystem: String)

  /** One row per variable (system = table name) + one per enumerated
   *  value (system = variable name), filtered. A `filter` returning true
   *  drops the row (matching the reference's filter polarity). */
  def rows(dd: DdStudy, filters: Seq[SkeletonRow => Boolean] = Nil): Seq[SkeletonRow] = {
    def keep(r: SkeletonRow): Boolean = !filters.exists(f => f(r))
    dd.tables.flatMap { table =>
      table.variables.flatMap { v =>
        val varRow = SkeletonRow(v.varName, v.desc, table.tableName)
        val varRows = if (keep(varRow)) Seq(varRow) else Nil
        val valueRows =
          if (varRows.isEmpty) Nil // reference only descends into unfiltered vars
          else v.values
            .filterNot(e => IgnoredValues.contains(e.description.toLowerCase))
            .filterNot(e => isNumeric(e.description))
            .map(e => SkeletonRow(e.code, e.description, v.varName))
            .filter(keep)
        varRows ++ valueRows
      }
    }
  }

  /** Numeric descriptions are not mapping targets (harmony.py:104-108). */
  private def isNumeric(s: String): Boolean =
    try { s.toDouble; true } catch { case _: NumberFormatException => false }

  /** The skeleton CSV (header at harmony.py:44-53 + required harmony
   *  columns so the filled file round-trips). */
  def csv(dd: DdStudy, filters: Seq[SkeletonRow => Boolean] = Nil): String = {
    val header = "local code,text,local code system,code,display,code system,comment"
    val body = rows(dd, filters).map { r =>
      Seq(r.localCode, r.text, r.localCodeSystem, "", "", "", "").map(cell).mkString(",")
    }
    (header +: body).mkString("", "\n", "\n")
  }

  private def cell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
