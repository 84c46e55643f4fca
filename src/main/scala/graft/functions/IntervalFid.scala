package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Sorted-interval SLOT lookup whose interval bounds travel as a
  * BROADCAST VARIABLE (the [[BloomMightContainBroadcast]] device): given
  * a key and a version's per-file key ranges `[mins(i), maxs(i)]`
  * (sorted by min, non-overlapping), return
  *
  *  - `i >= 0` — the index of the ONE file whose range contains the key
  *    (a merge must rewrite that file), or
  *  - `-(g + 1) < 0` — the key falls in GAP `g ∈ [0, n]` between file
  *    ranges (before file 0, between files g-1 and g, or after the last
  *    file): no existing file holds it, and new rows append into a
  *    per-gap file whose span stays disjoint from every file range.
  *
  * This is the file-pruning probe of [[graft.sources.KeyedTable]]: the
  * intervals are a table version's per-file key ranges read from parquet
  * footers. A change batch maps each key to exactly one slot, so a merge
  * touches exactly the files its keys intersect — the footer-statistics
  * analog of the reference committing only the outputs a DAG actually
  * produced (`tez-mapreduce/src/main/java/org/apache/tez/mapreduce/committer/MROutputCommitter.java`).
  *
  * At 100 TB the manifest holds millions of file ranges: a broadcast
  * pair of sorted long arrays is ~16 MB per million files, moved once
  * per executor, and the per-row cost is one binary search — never a
  * row × file join. Codegen calls `slot(k)` on the per-executor
  * instance directly, keeping the probe inside whole-stage codegen.
  */
case class IntervalSlotBroadcast(
    ranges: Broadcast[(Array[Long], Array[Long])],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_interval_slot"

  @transient private lazy val mins = ranges.value._1
  @transient private lazy val maxs = ranges.value._2

  /** Executor-side probe; also the codegen entry point. Binary search
    * for the last interval with min <= k: containment gives the file
    * index, otherwise the key sits in gap (last + 1). */
  def slot(k: Long): Int = {
    var lo = 0
    var hi = mins.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (mins(mid) <= k) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans >= 0 && k <= maxs(ans)) ans else -(ans + 1) - 1
  }

  override def nullSafeEval(k: Any): Any = slot(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIntervalSlot", this,
      classOf[IntervalSlotBroadcast].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $ref.slot($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): IntervalSlotBroadcast =
    copy(child = newChild)
}
