package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid assignment whose codebook travels as a BROADCAST
  * VARIABLE (the [[IntervalSlotBroadcast]] device, applied to k-means):
  * given a quantized vector (array<bigint>) and K centroids, return the
  * cid of the centroid with the smallest EXACT integer squared-L2
  * distance, ties to the smallest cid (centroids are fed sorted by cid
  * ascending; strict `<` keeps the first minimum — the same tie-break
  * as the oracle's `ROW_NUMBER() OVER (ORDER BY dist2, cid)`).
  *
  * Why not the centroid-literal `array(...)` projection the fixed-K
  * k-means queries use: that device inlines K×dims literals into one
  * selectExpr, which is fine at K=8 but at corpus-adaptive K (hundreds
  * to thousands of centroids at 10–100× corpora) the expression tree
  * blows past codegen limits and parse time grows with K. Here the
  * codebook is one broadcast array moved once per executor — K×dims×8
  * bytes — and the per-row cost is a tight O(K·d) long loop inside
  * whole-stage codegen, with an early exit once a partial sum exceeds
  * the best distance so far. The reference analog is a broadcast edge
  * feeding per-task lookup state
  * (`tez-runtime-library/src/main/java/org/apache/tez/runtime/library/conf/UnorderedKVEdgeConfig.java`).
  */
case class CentroidArgminBroadcast(
    cents: Broadcast[(Array[Int], Array[Array[Long]])],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_centroid_argmin"

  @transient private lazy val cids = cents.value._1
  @transient private lazy val codebook = cents.value._2

  /** Executor-side probe; also the codegen entry point. */
  def argmin(v: ArrayData): Int = {
    val x = v.toLongArray()
    var best = 0
    var bestD = Long.MaxValue
    var i = 0
    while (i < codebook.length) {
      val c = codebook(i)
      var d = 0L
      var j = 0
      while (j < x.length && d < bestD) {
        val t = x(j) - c(j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    cids(best)
  }

  override def nullSafeEval(v: Any): Any = argmin(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCentroidArgmin", this,
      classOf[CentroidArgminBroadcast].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.argmin($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgminBroadcast =
    copy(child = newChild)
}
