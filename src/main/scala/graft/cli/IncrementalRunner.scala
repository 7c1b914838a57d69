package graft.cli

import graft.model.StudyConfig
import graft.sources.CsvSource

import java.nio.file.{Files, Paths}

/**
 * The mtime dependency-graph incremental runner
 * (ref: wstlr/play.py:79-117 `get_latest_date`/`check_latest_update`,
 * gating at play.py:361-383). Not a Catalyst concern (SURVEY.md §4) —
 * a driver-side rebuild-avoidance check, Makefile-style: an output is
 * fresh iff it is newer than every input it depends on. Harmony is
 * deliberately excluded from freshness (always rebuilt,
 * ref: conceptmap.py:545-550).
 */
object IncrementalRunner {

  /** Millisecond mtime, None for missing/none entries
   *  (ref: play.py:79-93 — a missing data file is a hard error). */
  def mtime(path: String): Option[Long] =
    if (path == null || path.isEmpty || path.toLowerCase == "none") None
    else {
      val p = Paths.get(path)
      require(Files.exists(p), s"Missing file, $path. Unable to continue")
      Some(Files.getLastModifiedTime(p).toMillis)
    }

  /** Latest input mtime across the config's data files, DD files, and
   *  any extra dependencies (projection sources, the config itself). */
  def latestInput(
      config: StudyConfig,
      dataDir: String = "",
      extraDeps: Seq[String] = Nil): Option[Long] = {
    val resolve = CsvSource.resolveUnder(dataDir) _
    val dataFiles = config.dataset.values.flatMap { t =>
      CsvSource.fileList(t.filename) ++
        t.dataDictionary.toSeq.flatMap(d => CsvSource.fileList(d.filename)) ++
        t.codeHarmonization.toSeq.flatMap(CsvSource.fileList)
    }
    val all = (dataFiles.map(resolve) ++ extraDeps).flatMap(mtime(_))
    if (all.isEmpty) None else Some(all.max)
  }

  /** True when `output` must be (re)built: missing, or older than the
   *  newest input, or `force` (ref: play.py:361-371 + --force). */
  def needsRebuild(
      output: String,
      config: StudyConfig,
      dataDir: String = "",
      extraDeps: Seq[String] = Nil,
      force: Boolean = false): Boolean = {
    if (force) return true
    val out = Paths.get(output)
    if (!Files.exists(out)) return true
    val outTime = Files.getLastModifiedTime(out).toMillis
    latestInput(config, dataDir, extraDeps).forall(_ > outTime)
  }
}

/**
 * Dependency-ordered purge ranking (ref: wstlr/purge.py:21-40,105-110):
 * the fixed creation-order list; deletes run in REVERSE order with
 * unknown types first. Exposed as a rank so a purge sink can
 * `orderBy(desc(rank))` — unknown types get the highest rank and go
 * first, then Person back down to CodeSystem.
 */
object PurgeOrder {
  val ResourceOrder: Seq[String] = Seq(
    "CodeSystem", "ValueSet", "ObservationDefinition", "ActivityDefinition",
    "Organization", "Patient", "Group", "Specimen", "Substance", "Encounter",
    "Observation", "Condition", "ResearchStudy", "ResearchSubject",
    "DocumentReference", "List", "Task", "Person")

  private val rankMap = ResourceOrder.zipWithIndex.toMap

  /** Creation rank; unknown types rank above everything (deleted first
   *  when ordered descending). */
  def rank(resourceType: String): Int =
    rankMap.getOrElse(resourceType, ResourceOrder.size)

  /** Delete order for a set of types: unknown first, then reverse
   *  creation order (ref: purge.py:105-110). */
  def deleteOrder(types: Seq[String]): Seq[String] =
    types.distinct.sortBy(t => -rank(t))
}
