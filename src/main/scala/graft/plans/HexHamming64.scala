package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: Hamming distance between two 64-bit
 * signatures spelled as 16 hex characters (the [[graft.llm]] SimHash
 * signature format) — xor of the parsed words, popcount of the result.
 *
 * This is the codegen'd form of the 16-nibble expression tree
 * `Σ bit_count(nib(a,p) ^ nib(b,p))` ([[graft.llm.SimHashNearDup
 * .hammingExpr]]'s original shape): 16 `conv`/`substring`/`bit_count`
 * expression triples allocate a substring UTF8String per nibble and
 * evaluate as ~48 expression nodes per row; `doGenCode` emits one
 * primitive byte loop with zero allocation, staying inside
 * WholeStageCodegen. The interpreted `nullSafeEval` twin keeps
 * identical semantics (pinned against both the nibble tree and the
 * JVM twin in tests).
 *
 * Returns null when either side is not exactly 16 valid hex digits
 * (case-insensitive) — a malformed signature must surface as null, not
 * a junk distance. Registered as SQL `graft_hamming64` by
 * [[GraftExtensions]].
 */
case class HexHamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming64"
  override def nullable: Boolean = true // malformed input -> null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (Seq(left, right).forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** -1 for a non-hex byte, else the nibble value. Hex is ASCII, so
    * byte-wise access is exact; any multi-byte UTF-8 char yields a
    * negative/invalid byte and maps to -1. */
  @inline private def nib(b: Byte): Int = {
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (x.numBytes() != 16 || y.numBytes() != 16) null
    else {
      var h = 0
      var i = 0
      while (i < 16) {
        val na = nib(x.getByte(i))
        val nb = nib(y.getByte(i))
        if (na < 0 || nb < 0) return null
        h += java.lang.Integer.bitCount(na ^ nb)
        i += 1
      }
      h.toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ba = ctx.freshName("ba")
      val bb = ctx.freshName("bb")
      // nibble decode inlined: digits, lower, upper hex; else invalid
      def decode(src: String, b: String, n: String): String =
        s"""byte $b = $src.getByte($i);
           |int $n = ($b >= '0' && $b <= '9') ? $b - '0'
           |  : ($b >= 'a' && $b <= 'f') ? $b - 'a' + 10
           |  : ($b >= 'A' && $b <= 'F') ? $b - 'A' + 10 : -1;""".stripMargin
      s"""
         |if ($a.numBytes() != 16 || $b.numBytes() != 16) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $h = 0;
         |  for (int $i = 0; $i < 16; $i++) {
         |    ${decode(a, ba, na)}
         |    ${decode(b, bb, nb)}
         |    if ($na < 0 || $nb < 0) { ${ev.isNull} = true; break; }
         |    $h += java.lang.Integer.bitCount($na ^ $nb);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = (long) $h;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
