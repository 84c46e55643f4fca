package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}

/** AS-OF join as a first-class Catalyst operator (SURVEY.md §7 preference
  * order (c): custom `LogicalPlan` + `Rule[LogicalPlan]`, registered via
  * `graft.GraftExtensions`).
  *
  * Semantics: for every left row, attach the `payload` of the LATEST right
  * row with the same `on` keys whose `rightTs` ≤ the left row's `leftTs`
  * (inclusive; ties among right rows broken by largest payload; right rows
  * whose payload is NULL are skipped — see [[RewriteAsOfJoin.expand]]).
  * This is
  * the operator the reference cannot express as a single edge — Tez
  * would need a custom secondary-sorted SCATTER_GATHER edge
  * (tez-runtime-library/.../OrderedPartitionedKVOutput.java:67 with a
  * per-edge secondary comparator, TezRuntimeConfiguration.java:503) plus a
  * stateful processor; here it lowers at analysis time to the proven
  * union-sort composition of q_asof_join (graft.ops.TemporalJoinQueries):
  * tag both inputs, ONE shuffle on the keys, one sort on
  * (ts, side, payload), running `last(ignoreNulls)` — linear and
  * single-shuffle at any scale, never a per-row range probe.
  *
  * The node itself never resolves (`resolved = false`); the analyzer
  * reaches a fixed point only after [[RewriteAsOfJoin]] — injected by
  * GraftExtensions as a resolution rule — replaces it with standard
  * operators, which Catalyst then optimizes as usual (pushdown through
  * the projections, AQE on the shuffle).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    on: Seq[String],
    leftTs: String,
    rightTs: String,
    payload: String,
    outName: String)
  extends BinaryNode {

  // output is only known post-rewrite; stay unresolved so the analyzer
  // must fire RewriteAsOfJoin before anything above can resolve
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[AsOfJoinPlan]] into the union-sort composition. Pure
  * plan-to-plan function, shared by the injected resolution rule and the
  * no-extension fallback in [[AsOfJoin]]. */
object RewriteAsOfJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j: AsOfJoinPlan if j.childrenResolved => expand(j)
    }

  private val TsCol = "__graft_asof_ts"
  private val SideCol = "__graft_asof_side"
  private val PvalCol = "__graft_asof_pval"

  /** NULL-payload note: the running aggregate is `last(payload, ignoreNulls
    * = true)` because left rows carry a NULL payload slot that must be
    * skipped — a consequence is that a RIGHT row whose payload is NULL is
    * also invisible (the previous non-null payload wins, not NULL). The
    * DuckDB oracle mirrors this; callers needing "matched row with NULL
    * payload" ≠ "no match" should select a non-null payload (e.g. a struct
    * of the row).
    *
    * All intermediate references are bound by exprId (never re-resolved by
    * name), so duplicate column names in the left input are legal and user
    * columns may share the helper names. The single name-level restriction
    * is `outName`, which must not collide with a left column.
    */
  def expand(j: AsOfJoinPlan): LogicalPlan = {
    def attrOf(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: column '$name' not found in ${p.output.map(_.name)}"))
    require(!j.left.output.exists(_.name == j.outName),
      s"asof join: output column '${j.outName}' already exists in the left input")

    val payloadAttr = attrOf(j.right, j.payload)
    val pt = payloadAttr.dataType

    // Tagged union, positionally aligned: all left columns (right side
    // NULL-fills non-key left columns), then ts / side / payload helpers.
    // Union derives its output exprIds from the FIRST child, so the
    // aliases created for leftProj are the post-union attributes.
    val tsAlias = Alias(attrOf(j.left, j.leftTs), TsCol)()
    val sideAlias = Alias(Literal(1, IntegerType), SideCol)()
    val pvalAlias = Alias(Cast(Literal(null), pt), PvalCol)()
    val leftProj = Project(
      j.left.output.map(a => a: NamedExpression) ++
        Seq(tsAlias, sideAlias, pvalAlias),
      j.left)
    val rightProj = Project(
      j.left.output.map { a =>
        if (j.on.contains(a.name)) Alias(attrOf(j.right, a.name), a.name)()
        else Alias(Cast(Literal(null), a.dataType), a.name)(): NamedExpression
      } ++ Seq(
        Alias(attrOf(j.right, j.rightTs), TsCol)(),
        Alias(Literal(0, IntegerType), SideCol)(),
        Alias(payloadAttr, PvalCol)()),
      j.right)
    val union = Union(leftProj, rightProj)
    val tsAttr = tsAlias.toAttribute
    val sideAttr = sideAlias.toAttribute
    val pvalAttr = pvalAlias.toAttribute

    // last(payload ignore nulls) over (partition by keys
    //   order by ts, side, payload rows unbounded preceding..current row):
    // right rows sort before left rows at equal ts → inclusive as-of.
    val orderSpec = Seq(
      SortOrder(tsAttr, Ascending),
      SortOrder(sideAttr, Ascending),
      SortOrder(pvalAttr, Ascending))
    val partSpec = j.on.map(attrOf(j.left, _): Expression)
    val frame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val lastAgg = AggregateExpression(
      Last(pvalAttr, ignoreNulls = true), Complete, isDistinct = false)
    val winExpr = Alias(
      WindowExpression(lastAgg, WindowSpecDefinition(partSpec, orderSpec, frame)),
      j.outName)()
    val win = Window(Seq(winExpr), partSpec, orderSpec, union)

    val onlyLeft = Filter(EqualTo(sideAttr, Literal(1, IntegerType)), win)
    Project(
      j.left.output.map(a => a: NamedExpression) :+ winExpr.toAttribute,
      onlyLeft)
  }
}

/** Public DataFrame API over [[AsOfJoinPlan]]. */
object AsOfJoin {

  /** `left` gains `outName` = payload of the latest right row with equal
    * `on` keys and `rightTs` ≤ `leftTs`. Uses the session's injected
    * resolution rule when GraftExtensions is installed; otherwise lowers
    * eagerly through the same [[RewriteAsOfJoin.expand]]. */
  def asof(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      payload: String, outName: String): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[SparkSession]
    val node = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      on, leftTs, rightTs, payload, outName)
    val installed = spark.sessionState.analyzer.extendedResolutionRules
      .exists(_ eq RewriteAsOfJoin)
    GraftSqlBridge.ofRows(spark, if (installed) node else RewriteAsOfJoin.expand(node))
  }
}
