package graft.harmony

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Harmony/ConceptMap semantics (ref: wstlr/conceptmap.py): first-wins
 *  raw-row dedup, the self group, curie prefixing, last-wins display map,
 *  duplicate report, and the ConceptMap JSON assembly. */
class HarmonySpec extends AnyFunSuite {
  import TestSpark.spark

  private def harmonyCsv(rows: String*): String = {
    val dir = Files.createTempDirectory("graft-harmony")
    val p = dir.resolve("harmony.csv")
    val header = "local code,text,table_name,parent_varname,local code system,code,display,code system"
    Files.write(p, (header +: rows).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private val fixture = harmonyCsv(
    "M,Male,demographics,sex,Sex,male,Male,http://hl7.org/fhir/administrative-gender",
    "F,Female,demographics,sex,Sex,female,Female,http://hl7.org/fhir/administrative-gender",
    // duplicate of the first mapping: first-wins dedup drops it
    "M,Male Again,demographics,sex,Sex,male,Male,http://hl7.org/fhir/administrative-gender",
    // second target system for M
    "M,Male,demographics,sex,Sex,248153007,Male,http://snomed.info/sct")

  test("read lowercases headers and fills missing code system with ''") {
    val df = Harmony.read(spark, Seq(fixture))
    assert(Harmony.RequiredColumns.forall(df.columns.contains))
    assert(df.count() == 4)
  }

  test("firstWins dedups on the 4-part mapping key keeping the first row") {
    val deduped = Harmony.firstWins(Harmony.read(spark, Seq(fixture)))
    assert(deduped.count() == 3)
    // the surviving M/male row is the FIRST one (text 'Male', not 'Male Again')
    val m = deduped.filter(deduped("local code") === "M" &&
      deduped("code") === "male").collect().head
    assert(m.getAs[String]("text") == "Male")
  }

  test("conceptMapGroups builds real target groups plus the self group") {
    val groups = Harmony.conceptMapGroups(Harmony.read(spark, Seq(fixture)))
    val bySrcTgt = groups.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getSeq[Row](2)).toMap
    assert(bySrcTgt.keySet == Set(
      ("Sex", "http://hl7.org/fhir/administrative-gender"),
      ("Sex", "http://snomed.info/sct"),
      ("Sex", "self")))

    // gender group: M -> male, F -> female, element display from `text`
    val gender = bySrcTgt(("Sex", "http://hl7.org/fhir/administrative-gender"))
    assert(gender.map(e => (e.getString(0), e.getString(1))).toSeq ==
      Seq(("M", "Male"), ("F", "Female")))
    assert(gender.head.getSeq[Row](2) == Seq(Row("male", "Male", "equivalent")))

    // self group: every local code maps to itself with its text as display
    val self = bySrcTgt(("Sex", "self"))
    val mSelf = self.find(_.getString(0) == "M").get
    assert(mSelf.getSeq[Row](2).forall(t => t.getString(0) == "M" && t.getString(1) == "Male"))
  }

  test("curie prefixes apply to real target systems only") {
    val groups = Harmony.conceptMapGroups(
      Harmony.read(spark, Seq(fixture)),
      curies = Map("http://snomed.info/sct" -> "SCT"))
    val snomed = groups.filter(groups("target") === "http://snomed.info/sct")
      .collect().head.getSeq[Row](2)
    assert(snomed.head.getSeq[Row](2).head.getString(0) == "SCT:248153007")
    val self = groups.filter(groups("target") === "self").collect().head.getSeq[Row](2)
    assert(self.flatMap(_.getSeq[Row](2)).forall(!_.getString(0).contains(":")))
  }

  test("conceptMapJson assembles the ConceptMap document with identity groups") {
    val groups = Harmony.conceptMapGroups(Harmony.read(spark, Seq(fixture)))
    val json = Harmony.conceptMapJson(groups, "study-harmony",
      extraGroups = Seq(Harmony.identityGroup("sex", "http://base/CodeSystem/dd/demographics/sex",
        Seq(graft.model.CodeEntry("M", "Male")))))
    assert(json.startsWith("""{"id":"study-harmony","resourceType":"ConceptMap","version":"v1""""))
    assert(json.contains(""""target":"self""""))
    assert(json.contains(""""code":"male""""))
    assert(json.contains("""http://base/CodeSystem/dd/demographics/sex"""))
    // parseable by Spark's JSON reader
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS)
    assert(parsed.columns.contains("group"))
  }

  test("displayMap is last-wins (dict-overwrite semantics)") {
    val dup = harmonyCsv(
      "M,First,t,v,Sex,male,Male display one,http://sys",
      "M,Second,t,v,Sex,male,Male display two,http://sys2")
    val m = Harmony.displayMap(Harmony.read(spark, Seq(dup)))
    assert(m == Map("M" -> "Male display two"))
  }

  test("codingsLookup attaches self and target codings for a (code, system) pair") {
    val lookup = Harmony.codingsLookup(Harmony.read(spark, Seq(fixture)))
    val m = lookup.filter(lookup("code") === "M").collect().head
    val codings = m.getSeq[Row](2).map(c => (c.getString(0), c.getString(2)))
    assert(codings.contains(("male", "http://hl7.org/fhir/administrative-gender")))
    assert(codings.contains(("248153007", "http://snomed.info/sct")))
    assert(codings.contains(("M", "self")))
  }

  test("redundantMappings reports duplicated mapping keys with counts") {
    val report = Harmony.redundantMappings(Harmony.read(spark, Seq(fixture))).collect()
    assert(report.length == 1)
    assert(report.head.getString(0) == "Sex:M")
    assert(report.head.getLong(2) == 2L)
  }

  test("source/target code groups feed the harmony ValueSets with curie + last-wins semantics") {
    val dup = harmonyCsv(
      "M,Male,demographics,sex,Sex,248153007,Male (first),http://snomed.info/sct",
      "F,Female,demographics,sex,Sex,248152002,Female,http://snomed.info/sct",
      // same target code again: LAST display wins on the target side
      "M2,Male2,demographics,sex,Sex,248153007,Male (last),http://snomed.info/sct")
    val df = Harmony.read(spark, Seq(dup))

    val src = Harmony.sourceCodeGroups(df, curies = Map("Sex" -> "SX"),
      urlBase = "http://base").collect()
    assert(src.length == 1)
    assert(src.head.getAs[String]("system")
      == "http://base/CodeSystem/data-dictionary/demographics/sex")
    val srcCodes = src.head.getAs[scala.collection.Seq[Row]]("codes")
      .map(c => (c.getString(0), c.getString(1)))
    assert(srcCodes == Seq(("SX:M", "Male"), ("SX:F", "Female"), ("SX:M2", "Male2")))

    val tgt = Harmony.targetCodeGroups(df).collect()
    assert(tgt.length == 1)
    val tgtCodes = tgt.head.getAs[scala.collection.Seq[Row]]("codes")
      .map(c => (c.getString(0), c.getString(1)))
    // Python dict overwrite: last display wins, FIRST insertion order holds
    // (248153007 was inserted first even though its kept row came last)
    assert(tgtCodes == Seq(("248153007", "Male (last)"), ("248152002", "Female")))

    val vs = graft.project.ResourceBuilders.harmonyValueSet(
      Harmony.sourceCodeGroups(df),
      graft.project.Projection.StudyInfo("S1", "https://s1"), "sources").collect()
    assert(vs.length == 1)
    val j = vs.head.getString(3)
    assert(vs.head.getString(2) == "S1.cm-valueset.sources")
    assert(j.contains(""""compose":{"include":[{"system":"""))
    assert(j.contains(""""code":"M","display":"Male""""))
  }

  test("multi-file harmony reads as parts of one mapping with cross-file dedup") {
    val f1 = harmonyCsv("M,Male,t,v,Sex,male,Male,http://sys")
    val f2 = harmonyCsv(
      "M,Male DUP,t,v,Sex,male,Male,http://sys",
      "F,Female,t,v,Sex,female,Female,http://sys")
    val deduped = Harmony.firstWins(Harmony.read(spark, Seq(f1, f2)))
    assert(deduped.count() == 2)
    // first file wins for M
    assert(deduped.filter(deduped("local code") === "M").collect().head
      .getAs[String]("text") == "Male")
  }
}
