package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst expression: exact BIGINT dot product of two
 * `array<bigint>` columns over their common prefix (min length), skipping
 * null elements.
 *
 * This is the codegen'd form of the higher-order fold
 * `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`: Catalyst evaluates
 * higher-order functions interpreted (a lambda closure per element), which
 * measured ~10x slower in pair-scoring loops — see `graft.llm.Similarity`.
 * `doGenCode` emits a primitive `long` loop over the two
 * [[org.apache.spark.sql.catalyst.util.ArrayData]] buffers, so the whole
 * computation stays inside WholeStageCodegen with zero boxing; the
 * interpreted `nullSafeEval` twin keeps identical semantics for
 * non-codegen contexts (and is pinned against the fold form in tests).
 *
 * Registered as SQL function `graft_dot` by [[GraftExtensions]].
 */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<bigint> (callers build them from quantize();
  // ExpectsInputTypes is sql-private, so no analyzer-time coercion — but
  // the check below still fails analysis with a clear message instead of
  // a runtime ClassCastException on, e.g., array<int>)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) d += x.getLong(i) * y.getLong(i)
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $d += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
