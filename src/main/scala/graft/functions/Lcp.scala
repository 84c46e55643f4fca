package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-prefix length (in characters) of two strings — the
  * adjacent-suffix LCP kernel of q_dedup_substring_max. A custom
  * codegen'd Expression (SURVEY.md §7 preference (b)) because the
  * composable form — a generate_series/filter fold over per-character
  * substr equality — is interpreted and allocates a list per row, and
  * this runs once per corpus suffix. Char-based (not byte-based) so the
  * semantics match SQL substr on any input; the oracle's fold computes
  * the identical integer.
  */
case class Lcp(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcp"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[UTF8String].toString
    val sb = b.asInstanceOf[UTF8String].toString
    val n = math.min(sa.length, sb.length)
    var i = 0
    while (i < n && sa.charAt(i) == sb.charAt(i)) i += 1
    i
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |String $sa = $a.toString();
         |String $sb = $b.toString();
         |int $n = java.lang.Math.min($sa.length(), $sb.length());
         |int $i = 0;
         |while ($i < $n && $sa.charAt($i) == $sb.charAt($i)) $i++;
         |${ev.value} = $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcp =
    copy(left = newLeft, right = newRight)
}
