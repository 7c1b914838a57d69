package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference scalar-helper suite
 *  (ref: tests/test_wstlr_init.py). */
class NamingSpec extends AnyFunSuite {

  test("StandardizeDdType maps known spellings to canonical form") {
    val cases = Seq(
      "string" -> "string", "Str" -> "string", "" -> "string",
      "identifier" -> "string", "int" -> "int", "Integer" -> "int",
      "bool" -> "boolean", "BOOLEAN" -> "boolean", "number" -> "number",
      "Decimal" -> "number", "float" -> "number", "numeric" -> "number",
      "enumeration" -> "enumeration", "integer, encoded value" -> "enumeration",
      "date" -> "date")
    cases.foreach { case (raw, expected) =>
      assert(DdType.standardize(raw) == expected, s"for input '$raw'")
    }
  }

  test("StandardizeDdType raises InvalidDdType on unknown type, carrying the name") {
    val e = intercept[InvalidDdType](DdType.standardize("not-a-real-type"))
    assert(e.typeName == "not-a-real-type")
    assert(e.getMessage.contains("not-a-real-type"))
  }

  test("determine_table_type: embed > group_by > default precedence") {
    assert(TableType.determine(hasEmbed = true, hasGroupBy = false) == TableType.Embedded)
    assert(TableType.determine(hasEmbed = false, hasGroupBy = true) == TableType.Grouped)
    assert(TableType.determine(hasEmbed = false, hasGroupBy = false) == TableType.Default)
    assert(TableType.determine(hasEmbed = true, hasGroupBy = true) == TableType.Embedded)
  }

  test("clean_values: null -> empty, collapse ';  ' -> ';', trim") {
    assert(Naming.cleanValues(null) == "")
    assert(Naming.cleanValues("a;   b;    c") == "a;b;c")
    assert(Naming.cleanValues("  a; b  ") == "a;b")
  }

  test("fix_fieldname lowercases, trims, drops parens, maps space and slash to _") {
    assert(Naming.fixFieldName("  My Column  ") == "my_column")
    assert(Naming.fixFieldName("Value (Units)/Test") == "value_units_test")
  }

  test("dd_system_url assembles base/term/data-dictionary[/consent]/table[/var]") {
    assert(Naming.ddSystemUrl("http://base", "term", None, "My Table", None)
      == "http://base/term/data-dictionary/my_table")
    assert(Naming.ddSystemUrl("http://base", "term", None, "My Table", Some("My Var"))
      == "http://base/term/data-dictionary/my_table/my_var")
    assert(Naming.ddSystemUrl("http://base", "term", Some("GRU"), "My Table", None)
      == "http://base/term/data-dictionary/gru/my_table")
    assert(Naming.ddSystemUrl("http://base", "term", Some("GRU"), "My Table", Some("My Var"))
      == "http://base/term/data-dictionary/gru/my_table/my_var")
    // blank consent group is treated as absent
    assert(Naming.ddSystemUrl("http://base", "term", Some("   "), "My Table", None)
      == "http://base/term/data-dictionary/my_table")
    assert(Naming.ddSystemUrl("http://base", "term", Some("GRU"), "My Table", None)
      != Naming.ddSystemUrl("http://base", "term", Some("HMB"), "My Table", None))
  }

  test("evaluate_bool truthy/falsy table") {
    assert(Naming.evaluateBool(true))
    assert(!Naming.evaluateBool(false))
    assert(Naming.evaluateBool("true"))
    assert(Naming.evaluateBool("YES"))
    assert(Naming.evaluateBool("1"))
    assert(Naming.evaluateBool(1))
    assert(!Naming.evaluateBool("no"))
    assert(!Naming.evaluateBool("false"))
    assert(!Naming.evaluateBool(0))
    assert(!Naming.evaluateBool(null))
    assert(!Naming.evaluateBool("banana"))
  }

  test("fix_fieldname is idempotent") {
    val inputs = Seq("  My Column  ", "Value (Units)/Test", "already_fixed", "A/B (c) D")
    inputs.foreach { in =>
      val once = Naming.fixFieldName(in)
      assert(Naming.fixFieldName(once) == once, s"for input '$in'")
    }
  }
}
