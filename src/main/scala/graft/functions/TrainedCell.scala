package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Two-level TRAINED-codebook cell assignment (the data-seeded IVF of
  * ops.SimilarityQueries.trainedCells): given a 1e-6-quantized vector
  * (array<bigint>) and a broadcast codebook of (superIds, superVecs,
  * childIdsBySuper, childVecsBySuper), return the vec_id of the nearest
  * CHILD seed within the nearest SUPER seed. All distances are exact
  * integer squared-L2; both argmins tie to the smallest seed id (seed
  * arrays are fed sorted ascending; strict `<` keeps the first
  * minimum) — the same total order the DuckDB oracle's
  * `ROW_NUMBER() OVER (ORDER BY dist2, sid)` CTE chain evaluates, so
  * cell ids are bit-identical across engines.
  *
  * Cost: O((√c + children-of-super)·d) per row in tight long loops with
  * a running-best early exit, inside whole-stage codegen; the codebook
  * (≤65536 seeds × 64 longs) moves once per executor as a broadcast —
  * the same device as [[IntervalSlotBroadcast]] and
  * [[SuperArgminBroadcast]]. Reference analog: broadcast edges
  * feeding per-task lookup state
  * (`tez-runtime-library/src/main/java/org/apache/tez/runtime/library/conf/UnorderedKVEdgeConfig.java`).
  */
case class TwoLevelArgminBroadcast(
    codebook: Broadcast[(Array[Long], Array[Array[Long]],
      Array[Array[Long]], Array[Array[Array[Long]]])],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_trained_cell"

  @transient private lazy val superIds = codebook.value._1
  @transient private lazy val superVecs = codebook.value._2
  @transient private lazy val childIds = codebook.value._3
  @transient private lazy val childVecs = codebook.value._4

  private def argminIdx(x: Array[Long], vecs: Array[Array[Long]]): Int = {
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
    best
  }

  /** Executor-side probe; also the codegen entry point. */
  def cellOf(v: ArrayData): Long = {
    val x = v.toLongArray()
    val si = argminIdx(x, superVecs)
    val kids = childVecs(si)
    // a probed super always has children: every super seed is its own
    // nearest child (ss is a multiple of sc), and exact-integer ties
    // route rows to the smallest duplicate id on both engines
    childIds(si)(argminIdx(x, kids))
  }

  override def nullSafeEval(v: Any): Any = cellOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTrainedCell", this,
      classOf[TwoLevelArgminBroadcast].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.cellOf($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelArgminBroadcast =
    copy(child = newChild)
}

/** nprobe=2 companion of [[TwoLevelArgminBroadcast]]: the best child of
  * the SECOND-nearest super seed — under two-level routing, the recall
  * that parent-flips lose sits exactly across the super boundary, so
  * that is where the second probe goes (the trained-codebook twin of
  * `graft_ivf_cell_h2`). Tie semantics match the oracle's
  * `ROW_NUMBER() ... WHERE rn = 2`: exclude the nearest super (first
  * minimum over ascending seed ids), then take the first minimum of
  * the rest. Normally returns a cell id from a DIFFERENT super's child
  * block than the home cell; in the two degenerate cases it returns
  * the HOME cell instead — a single-super codebook, and a
  * second-nearest super with an EMPTY child block (two super seeds
  * with identical quantized vectors tie every child to the smaller id,
  * leaving the larger-id super childless — in-distribution on a dedup
  * corpus). Both fallbacks mirror the oracle twin's
  * `LEFT JOIN … COALESCE(cell2, cell)`; callers that fan probes out
  * must therefore drop `cell2 = cell` rows to keep pairs disjoint
  * (the declared probe2 query filters that branch). */
case class TwoLevelArgmin2Broadcast(
    codebook: Broadcast[(Array[Long], Array[Array[Long]],
      Array[Array[Long]], Array[Array[Array[Long]]])],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_trained_cell2"

  @transient private lazy val superVecs = codebook.value._2
  @transient private lazy val childIds = codebook.value._3
  @transient private lazy val childVecs = codebook.value._4

  private def argminIdxExcl(x: Array[Long], vecs: Array[Array[Long]],
      excl: Int): Int = {
    var best = -1
    var bestD = Long.MaxValue
    var i = 0
    while (i < vecs.length) {
      if (i != excl) {
        val c = vecs(i)
        var d = 0L
        var j = 0
        while (j < x.length && d < bestD) {
          val t = x(j) - c(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = i }
      }
      i += 1
    }
    best
  }

  /** Executor-side probe; also the codegen entry point. Falls back to
    * the home cell on a single-super codebook AND on an empty
    * second-super child block (duplicate super vectors) — both are the
    * oracle's LEFT JOIN + COALESCE twin. The home-block scan runs ONLY
    * on those fallback paths: the common case pays one super scan plus
    * one si2-block scan, exactly the pre-guard cost. */
  def cellOf(v: ArrayData): Long = {
    val x = v.toLongArray()
    val si = argminIdxExcl(x, superVecs, -1)
    def home: Long = childIds(si)(argminIdxExcl(x, childVecs(si), -1))
    if (superVecs.length < 2) home
    else {
      val si2 = argminIdxExcl(x, superVecs, si)
      if (childVecs(si2).isEmpty) home
      else childIds(si2)(argminIdxExcl(x, childVecs(si2), -1))
    }
  }

  override def nullSafeEval(v: Any): Any = cellOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTrainedCell2", this,
      classOf[TwoLevelArgmin2Broadcast].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.cellOf($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelArgmin2Broadcast =
    copy(child = newChild)
}

/** Third probe of the trained-codebook family: the SECOND-best child
  * WITHIN the home super — the intra-super boundary, complementing
  * [[TwoLevelArgmin2Broadcast]]'s cross-super boundary (a near-dup
  * pair lost by single-probe blocking sits across one of exactly those
  * two seams). Tie semantics are the home ranking's `rn = 2`: first
  * minimum excluded, first minimum of the rest, ascending-id arrays +
  * strict `<`. Falls back to the HOME cell when the home super has a
  * single child — the oracle's LEFT JOIN + COALESCE twin — so probe
  * fan-out must drop `cell3 = cell` rows exactly like cell2's. */
case class TwoLevelArgminH2Broadcast(
    codebook: Broadcast[(Array[Long], Array[Array[Long]],
      Array[Array[Long]], Array[Array[Array[Long]]])],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_trained_cell_h2"

  @transient private lazy val superVecs = codebook.value._2
  @transient private lazy val childIds = codebook.value._3
  @transient private lazy val childVecs = codebook.value._4

  private def argminIdxExcl(x: Array[Long], vecs: Array[Array[Long]],
      excl: Int): Int = {
    var best = -1
    var bestD = Long.MaxValue
    var i = 0
    while (i < vecs.length) {
      if (i != excl) {
        val c = vecs(i)
        var d = 0L
        var j = 0
        while (j < x.length && d < bestD) {
          val t = x(j) - c(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = i }
      }
      i += 1
    }
    best
  }

  /** Executor-side probe; also the codegen entry point. */
  def cellOf(v: ArrayData): Long = {
    val x = v.toLongArray()
    val si = argminIdxExcl(x, superVecs, -1)
    val kids = childVecs(si)
    // every builder keeps supers a SUBSET of children, so the home
    // super always has ≥1 child (a super seed is its own nearest
    // child; duplicate-vector ties route to the smaller id on both
    // engines, and so does the row's home-super choice) — fail loudly
    // if a future builder breaks that invariant instead of throwing
    // AIOOBE off argminIdxExcl's -1 sentinel
    require(kids.nonEmpty,
      "TwoLevelArgminH2Broadcast: empty home child block — the " +
        "codebook violates the supers-subset-of-children invariant")
    val ci = argminIdxExcl(x, kids, -1)
    if (kids.length < 2) childIds(si)(ci) // single child: home fallback
    else childIds(si)(argminIdxExcl(x, kids, ci))
  }

  override def nullSafeEval(v: Any): Any = cellOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTrainedCellH2", this,
      classOf[TwoLevelArgminH2Broadcast].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.cellOf($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelArgminH2Broadcast =
    copy(child = newChild)
}
