package graft

import org.scalatest.funsuite.AnyFunSuite

/** Flagship smoke: the driver checks entry() returns rows; so do we. */
class EntrySpec extends AnyFunSuite {

  test("entry() produces nested market-segment groups with rows") {
    val out = SparkEntry.entry(TestSpark.spark)
    assert(out.columns.toSeq == Seq("c_mktsegment", "content"))
    // the nation display column rides inside the nested content structs
    val contentType = out.schema("content").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(contentType.fieldNames.contains("c_nationkey_display"))
    assert(out.count() > 0)
  }

  test("every declared query has oracle SQL (or is explicitly exempt)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
