package graft.cli

import graft.harmony.HarmonySkeleton
import graft.model._
import graft.sources.ConfigReader
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

import scala.collection.immutable.ListMap

/** Incremental runner, purge ordering, harmony skeleton
 *  (ref: play.py:79-117, purge.py:21-40, harmony.py:77-121). */
class CliSpec extends AnyFunSuite {

  test("needsRebuild: missing output, stale output, fresh output, force") {
    val dir = Files.createTempDirectory("graft-inc")
    val data = dir.resolve("t.csv")
    Files.write(data, "a\n1\n".getBytes)
    val config = ConfigReader.fromJson(
      s"""{"study_id":"S","dataset":{"t":{"filename":"${data}"}}}""")

    val out = dir.resolve("out.json")
    assert(IncrementalRunner.needsRebuild(out.toString, config)) // missing

    Files.write(out, "{}".getBytes)
    Files.setLastModifiedTime(out,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis + 60000))
    assert(!IncrementalRunner.needsRebuild(out.toString, config)) // fresh

    Files.setLastModifiedTime(out, java.nio.file.attribute.FileTime.fromMillis(1000))
    assert(IncrementalRunner.needsRebuild(out.toString, config)) // stale

    Files.setLastModifiedTime(out,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis + 60000))
    assert(IncrementalRunner.needsRebuild(out.toString, config, force = true))
  }

  test("missing data file is a hard error (play.py:84)") {
    val e = intercept[IllegalArgumentException](IncrementalRunner.mtime("/no/such/file.csv"))
    assert(e.getMessage.contains("Missing file"))
  }

  test("purge delete order: unknown types first, then reverse creation order") {
    val order = PurgeOrder.deleteOrder(Seq("Patient", "CodeSystem", "Observation", "Mystery"))
    assert(order == Seq("Mystery", "Observation", "Patient", "CodeSystem"))
  }

  test("harmony skeleton: variable + value rows, yes/no and numeric values skipped") {
    val dd = DdStudy("S", Seq(DdTable("S", "demographics", Seq(
      DdVariable("S", "demographics", "sex", description = "Biological sex",
        dataType = DdType.Enumeration,
        enumerations = ListMap("M" -> "Male", "F" -> "Female")),
      DdVariable("S", "demographics", "smoker", dataType = DdType.Enumeration,
        enumerations = ListMap("Y" -> "yes", "N" -> "no")),
      DdVariable("S", "demographics", "score", dataType = DdType.Enumeration,
        enumerations = ListMap("1" -> "1.5", "2" -> "High"))))))
    val rows = HarmonySkeleton.rows(dd)
    val byCode = rows.map(r => (r.localCode, r.localCodeSystem)).toSet
    // variable rows against the table; value rows against the variable
    assert(byCode.contains(("sex", "demographics")))
    assert(byCode.contains(("M", "sex")) && byCode.contains(("F", "sex")))
    // yes/no values skipped; numeric description skipped; "High" kept
    assert(!byCode.contains(("Y", "smoker")) && !byCode.contains(("N", "smoker")))
    assert(!byCode.contains(("1", "score")))
    assert(byCode.contains(("2", "score")))

    val csv = HarmonySkeleton.csv(dd)
    assert(csv.startsWith("local code,text,local code system,code,display,code system,comment"))
    assert(csv.contains("sex,Biological sex,demographics,,,,"))
  }

  test("harmony skeleton honors pluggable filters") {
    val dd = DdStudy("S", Seq(DdTable("S", "t", Seq(
      DdVariable("S", "t", "keep_me"), DdVariable("S", "t", "drop_me")))))
    val rows = HarmonySkeleton.rows(dd, Seq(r => r.localCode.startsWith("drop")))
    assert(rows.map(_.localCode) == Seq("keep_me"))
  }
}
