package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions registering graft's native expressions with the SQL
 * function registry, so `spark.sql("SELECT graft_dot(a, b) ...")` works:
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions) ...
 * // or spark.sql.extensions=graft.plans.GraftExtensions
 * }}}
 *
 * The DataFrame API does not need the registration — `Similarity.dot`
 * builds the expression directly — so library code keeps working on
 * sessions built without the extension.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.GraftDot)
    ext.injectFunction(GraftExtensions.GraftHamming64)
  }
}

object GraftExtensions {

  private val GraftDot = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"graft_dot expects 2 arguments, got ${children.length}")
      LongArrayDot(children.head, children(1)): Expression
    })

  private val GraftHamming64 = (
    new FunctionIdentifier("graft_hamming64"),
    new ExpressionInfo(classOf[HexHamming64].getName, "graft_hamming64"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_hamming64 expects 2 arguments, got ${children.length}")
      HexHamming64(children.head, children(1)): Expression
    })

  /** Register graft's SQL functions on an already-built session (the
   *  class form applies only at `SparkSession.builder().withExtensions`
   *  / `spark.sql.extensions` time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, GraftDot._1, GraftDot._2, GraftDot._3)
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, GraftHamming64._1, GraftHamming64._2, GraftHamming64._3)
  }
}
