package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SUPER-level routing for the DISTRIBUTED trained codebook
  * (ops.SimilarityQueries.trainedCellsDist): given a 1e-6-quantized
  * vector, return the vec_id of the nearest SUPER seed — exact integer
  * squared-L2, ties to the smallest seed id (seeds fed sorted
  * ascending; strict `<` keeps the first minimum — the identical tie
  * law as [[TwoLevelArgminBroadcast]]'s outer level and the oracle's
  * `ROW_NUMBER() OVER (ORDER BY dist2, sid)`).
  *
  * This kernel is the piece of the codebook that IS allowed to transit
  * the driver: only the ⌈√c⌉ super seeds ride the broadcast (O(√c·d)
  * driver/executor state), while the c child seeds stay a DataFrame —
  * the answer to the trained-codebook growth ceiling (seeds ∝ N/125
  * meant a ~40 GB driver collect at 10¹⁰ rows on the one-broadcast
  * path). Reference analog: broadcast edges feeding per-task lookup
  * state (`tez-runtime-library/src/main/java/org/apache/tez/runtime/library/conf/UnorderedKVEdgeConfig.java`).
  */
case class SuperArgminBroadcast(
    supers: Broadcast[(Array[Long], Array[Array[Long]])],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_super_argmin"

  @transient private lazy val sids = supers.value._1
  @transient private lazy val vecs = supers.value._2

  /** Executor-side probe; also the codegen entry point. */
  def argmin(v: ArrayData): Long = {
    val x = v.toLongArray()
    var best = 0
    var bestD = Long.MaxValue
    var i = 0
    while (i < vecs.length) {
      val c = vecs(i)
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
    sids(best)
  }

  override def nullSafeEval(v: Any): Any = argmin(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSuperArgmin", this,
      classOf[SuperArgminBroadcast].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.argmin($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SuperArgminBroadcast =
    copy(child = newChild)
}

/** CHILD-level routing against a JOINED block — the second half of the
  * distributed trained codebook: `argmin(qv, block)` over
  * `block: array<struct<cid bigint, cv array<bigint>>>` (sorted
  * ascending by cid — `sort_array` on the struct sorts by the leading
  * field) returns the cid of the nearest child seed, exact integer
  * squared-L2, strict-`<` first-minimum = smallest-cid ties. The block
  * arrives through a SHUFFLE join keyed on the super id, so each task
  * holds only its partition's child blocks and the full codebook never
  * materializes in any single JVM — the shape that survives c ∝ N.
  * Distances read the struct's array in place (no per-child copy);
  * the early exit abandons a child once its partial sum exceeds the
  * best so far, exactly like the broadcast kernels. */
case class ChildBlockArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_block_argmin"

  /** Executor-side probe; also the codegen entry point. Returns -1 on
    * an empty block (unreachable through trainedCellsDist's inner join
    * — a group only exists when a child seed routed to it). */
  def argmin(qv: ArrayData, block: ArrayData): Long = {
    val x = qv.toLongArray()
    var best = -1L
    var bestD = Long.MaxValue
    var i = 0
    val n = block.numElements()
    while (i < n) {
      val row = block.getStruct(i, 2)
      val cv = row.getArray(1)
      var d = 0L
      var j = 0
      while (j < x.length && d < bestD) {
        val t = x(j) - cv.getLong(j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = row.getLong(0) }
      i += 1
    }
    best
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    argmin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBlockArgmin", this,
      classOf[ChildBlockArgmin].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.argmin($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChildBlockArgmin =
    copy(left = newLeft, right = newRight)
}
