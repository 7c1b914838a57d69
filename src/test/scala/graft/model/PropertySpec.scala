package graft.model

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws (SURVEY.md §5 item 4), via scalacheck's runner. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val asciiish: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '(', ')', '/', '_', '-', ';', '='))).map(_.mkString)

  test("fix_fieldname is idempotent") {
    check(Prop.forAll(asciiish) { s =>
      val once = Naming.fixFieldName(s)
      Naming.fixFieldName(once) == once
    })
  }

  test("clean_values is idempotent") {
    check(Prop.forAll(asciiish) { s =>
      val once = Naming.cleanValues(s)
      Naming.cleanValues(once) == once
    })
  }

  test("parseEnums: first duplicate wins, order preserved, k=v rejoin is a fixpoint") {
    val entry: Gen[(String, String)] = for {
      k <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
      v <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    } yield (k, v)
    check(Prop.forAll(Gen.listOf(entry)) { pairs =>
      val cell = pairs.map { case (k, v) => s"$k=$v" }.mkString(";")
      val parsed = DdVariable.parseEnums(cell)
      val firstWins = pairs.groupBy(_._1).forall { case (k, vs) => parsed(k) == vs.head._2 }
      val orderKept = parsed.keys.toSeq == pairs.map(_._1).distinct
      val rejoined = parsed.map { case (k, v) => s"$k=$v" }.mkString(";")
      firstWins && orderKept && DdVariable.parseEnums(rejoined) == parsed
    })
  }

  test("DdType.standardize is a projection onto canonical types") {
    DdType.families.flatMap(_._2).foreach { s =>
      val canon = DdType.standardize(s)
      assert(DdType.standardize(canon) == canon)
    }
  }

  test("evaluate_bool accepts exactly the truthy spellings regardless of case") {
    check(Prop.forAll(
      Gen.oneOf("true", "yes", "1", "TRUE", "Yes", "no", "false", "0", "banana", "")) { s =>
      Naming.evaluateBool(s) == Set("true", "yes", "1").contains(s.toLowerCase)
    })
  }
}
