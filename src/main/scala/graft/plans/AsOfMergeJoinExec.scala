package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}

/** AS-OF join as a custom PHYSICAL operator — the deepest tier of the
  * SURVEY §7 preference order (custom `SparkPlan` + `SparkStrategy`),
  * complementing [[AsOfJoinPlan]]'s analysis-time lowering with an
  * operator the planner schedules directly.
  *
  * Same semantics as [[RewriteAsOfJoin.expand]] (latest right payload
  * with rightTs ≤ leftTs, inclusive; payload tie-break at equal ts;
  * NULL payloads skipped), same network cost (each side shuffles ONCE on
  * the keys — declared via `requiredChildDistribution`, so
  * EnsureRequirements co-partitions the children exactly as it would a
  * sort-merge join and AQE still coalesces the exchanges), but a cheaper
  * local pass than the window composition: instead of materializing the
  * tagged UNION and running a window aggregate over it, each partition
  * does ONE interleaved merge of the two sorted streams with O(1) state
  * (the current held payload) and emits left rows as they stream through.
  * No union materialization, no per-frame aggregate machinery, no
  * row-buffer: at 100 TB the sort is the cost and that is unchanged, but
  * the merge's constant factor and memory floor (one 1-column row held
  * per partition) beat the window operator's WindowExec buffering.
  */
case class AsOfExecPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Attribute,
    outAttr: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfExecPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfExecPlan]] into [[AsOfMergeJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfExecPlan =>
      AsOfMergeJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.payload, p.outAttr, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sorted merge: left sorted on (keys, ts), right on
  * (keys, ts, payload). Per left row, all right rows at-or-before it in
  * that order have been folded into the held payload (last non-null
  * wins), which IS the as-of value. */
case class AsOfMergeJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Attribute,
    outAttr: Attribute,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs :+ payload).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType) :+ leftTs.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = (leftKeys :+ leftTs).map(a => a: Expression)
    val rKeyExprs = (rightKeys :+ rightTs).map(a => a: Expression)
    val payloadExpr: Expression = payload
    val payloadType = payload.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (keys, ts) of each side projected to one comparable shape
      val lKT = UnsafeProjection.create(lKeyExprs, lOut)
      val rKT = UnsafeProjection.create(rKeyExprs, rOut)
      // codegen'd comparators (interpreted orderings dominate the merge
      // loop otherwise — this inner loop runs once per row per side)
      val keySchema = keyTypes.zipWithIndex.map { case (dt, i) =>
        AttributeReference(s"c$i", dt)()
      }
      val ord = codegen.GenerateOrdering.generate(
        keySchema.map(SortOrder(_, Ascending)), keySchema)
      val keyOnlyOrd = codegen.GenerateOrdering.generate(
        keySchema.dropRight(1).map(SortOrder(_, Ascending)),
        keySchema.dropRight(1))
      val pProj = UnsafeProjection.create(Seq(payloadExpr), rOut)
      val lKeyOnly = UnsafeProjection.create(leftKeys.map(a => a: Expression), lOut)
      val result = UnsafeProjection.create(
        lOut.map(a => a: Expression) :+
          BoundReference(lOut.length, payloadType, nullable = true),
        lOut :+ outAttr)
      val nullPayload = InternalRow(null)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var held: InternalRow = nullPayload
        private var prevKey: UnsafeRow = _
        private var rRow: InternalRow = _
        private var rK: UnsafeRow = _
        private def advanceRight(): Unit = {
          if (rRow == null && rIter.hasNext) {
            rRow = rIter.next()
            rK = rKT(rRow)
          }
        }
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lK = lKT(lRow)
          // new key group → the held payload belongs to the old group
          val keyNow = lKeyOnly(lRow)
          if (prevKey == null || keyOnlyOrd.compare(keyNow, prevKey) != 0) {
            held = nullPayload
            prevKey = keyNow.copy()
          }
          // fold in every right row at-or-before this left row; rows of
          // EARLIER keys are drained and ignored, rows of THIS key update
          // the held payload (right side is payload-sorted at equal ts,
          // so the last fold is the tie-winner); NULL payloads skipped
          advanceRight()
          while (rRow != null && ord.compare(rK, lK) <= 0) {
            if (keyOnlyOrd.compare(rK, keyNow) == 0) {
              val p = pProj(rRow)
              if (!p.isNullAt(0)) held = p.copy()
            }
            rRow = null
            advanceRight()
          }
          joined(lRow, held)
          result(joined)
        }
      }
    }
  }
}

/** Public DataFrame API over the physical as-of path. */
object AsOfMerge {

  /** Same contract as [[AsOfJoin.asof]], executed by
    * [[AsOfMergeJoinExec]]. Installs [[AsOfJoinStrategy]] into the
    * session's experimental strategies when the extension didn't. */
  def asof(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      payload: String, outName: String): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[SparkSession]
    if (!spark.experimental.extraStrategies.exists(_ eq AsOfJoinStrategy) &&
      !spark.sessionState.planner.strategies.exists(_ eq AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val l = left.queryExecution.analyzed
    val r0 = right.queryExecution.analyzed
    // fresh aliases on the right child: a self-join shares exprIds across
    // both sides, and DeduplicateRelations would re-id the right child
    // underneath the attribute references this node stores (same fix as
    // RewriteRangeJoin's probe aliases)
    val rAliases = r0.output.map(a =>
      Alias(a, a.name)(): NamedExpression)
    val r = org.apache.spark.sql.catalyst.plans.logical.Project(rAliases, r0)
    def attrOf(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof merge: column '$name' not found in ${p.output.map(_.name)}"))
    require(!l.output.exists(_.name == outName),
      s"asof merge: output column '$outName' already exists in the left input")
    val payloadAttr = attrOf(r, payload)
    val node = AsOfExecPlan(l, r,
      on.map(attrOf(l, _)), on.map(attrOf(r, _)),
      attrOf(l, leftTs), attrOf(r, rightTs), payloadAttr,
      AttributeReference(outName, payloadAttr.dataType, nullable = true)())
    GraftSqlBridge.ofRows(spark, node)
  }
}
