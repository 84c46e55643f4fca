package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Canonical iterative Hilbert xy→d conversion (the classic
  * d2xy/xy2d pair) over the 2^bits × 2^bits grid. The SQL-composable
  * unrolled rendition of the same walk generates the DuckDB oracle
  * text (graft.ops.MaintenanceQueries.hilbertStep); this tight loop is
  * the Spark-side hot path — one static call per row instead of 16
  * chained CASE projections, whose inlined whole-stage code blows past
  * the JIT-friendly method size and drops the stage to interpreted
  * evaluation (~10× slower measured at sf0.1). HilbertSpec proves the
  * loop, the generated chain, and injectivity agree point-by-point. */
object HilbertKernel {
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    val nM1 = (1L << bits) - 1
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = nM1 - x; y = nM1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `graft_hilbert(x, y, bits)` — Hilbert curve position of the point
  * (x, y), both already masked into [0, 2^bits). Codegen'd to one
  * static call. */
case class HilbertExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKernel.xy2d($bits, $a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertExpr = copy(left = l, right = r)
}
