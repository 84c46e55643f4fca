package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}

/** Bounded RANGE join as a first-class Catalyst operator — the second
  * custom logical node next to [[AsOfJoinPlan]] (SURVEY.md §7 preference
  * order (c)), registered through `graft.GraftExtensions`.
  *
  * Semantics: inner-join every left row to the right rows with equal
  * `on` keys whose `rightTs` lies in the half-open window
  * `(leftTs, leftTs + range]` (timestamps as non-negative integral
  * values, e.g. epoch seconds — the reference's DAG would need a custom
  * CartesianProduct CUSTOM edge + filter for this,
  * tez-runtime-library/.../cartesianproduct/CartesianProductVertexManager.java:62).
  *
  * Lowering (analysis time, [[RewriteRangeJoin]]): the inequality is
  * banded into an EQUI-join on `(on, ts div range)` buckets — the right
  * side probes its own bucket and the previous one, so a qualifying pair
  * matches EXACTLY ONE probe row (no dedup shuffle) and the exact
  * predicate filters inside the equi-join. Candidate pairs are bounded
  * by band density instead of quadratic; both sides stay
  * hash-partitioned at any scale. This is the same provably-lossless
  * banding the composed `q_range_join` uses (graft.ops
  * .TemporalJoinQueries) — the node makes it a reusable operator.
  *
  * The node never resolves itself; the analyzer reaches a fixed point
  * only after the injected rule replaces it with standard operators,
  * which Catalyst then optimizes (pushdown, AQE skew handling) as usual.
  */
case class RangeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    on: Seq[String],
    leftTs: String,
    rightTs: String,
    range: Long)
  extends BinaryNode {

  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[RangeJoinPlan]] into the bucket±1 banded equi-join. All
  * intermediate references are bound by exprId (mirroring
  * [[RewriteAsOfJoin]]), so duplicate names across the inputs are legal;
  * output is every left column followed by the right columns minus the
  * join keys. */
object RewriteRangeJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j: RangeJoinPlan if j.childrenResolved => expand(j)
    }

  private val BucketCol = "__graft_range_bucket"

  def expand(j: RangeJoinPlan): LogicalPlan = {
    require(j.range > 0, s"range join: range must be positive, got ${j.range}")
    def attrOf(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"range join: column '$name' not found in ${p.output.map(_.name)}"))

    val lTs = attrOf(j.left, j.leftTs)
    val rTs = attrOf(j.right, j.rightTs)
    val rangeLit = Literal(j.range)

    def bucketOf(ts: Expression): Expression = IntegralDivide(ts, rangeLit)

    // Left rows carry their own bucket; right rows are emitted twice —
    // once in their bucket, once in the previous one — so the window
    // (leftTs, leftTs + range] is covered by exactly one probe row per
    // qualifying pair (rTs div range ∈ {bucket, bucket + 1}).
    //
    // Every right column is RE-ALIASED (fresh exprIds) in the probe
    // projections: left and right may derive from the same base relation
    // (self-joins are the common case for temporal ranges), and without
    // fresh ids the analyzer's DeduplicateRelations would rewrite the
    // probe branch underneath the references this rewrite just bound.
    val lBucket = Alias(bucketOf(lTs), BucketCol)()
    val leftProj = Project(
      j.left.output.map(a => a: NamedExpression) :+ lBucket, j.left)

    val ownAliases = j.right.output.map(a => Alias(a, a.name)()) :+
      Alias(bucketOf(rTs), BucketCol)()
    val probeOwn = Project(ownAliases, j.right)
    val probePrev = Project(
      j.right.output.map(a => Alias(a, a.name)(): NamedExpression) :+
        Alias(Subtract(bucketOf(rTs), Literal(1L)), BucketCol)(), j.right)
    val probes = Union(probeOwn, probePrev)
    // Union output derives from the FIRST child: bind to its aliases
    val rightOut = ownAliases.map(_.toAttribute)

    val lBucketAttr = lBucket.toAttribute
    val rBucketAttr = rightOut.last
    val rTsU = rightOut(j.right.output.indexWhere(_.exprId == rTs.exprId))

    val keyCond = j.on.map { k =>
      EqualTo(attrOf(j.left, k),
        rightOut(j.right.output.indexWhere(_.name == k))): Expression
    }
    val cond = (keyCond :+ (EqualTo(lBucketAttr, rBucketAttr): Expression) :+
      (GreaterThan(rTsU, lTs): Expression) :+
      (LessThanOrEqual(Subtract(rTsU, lTs), rangeLit): Expression))
      .reduce(And(_, _))

    val joined = Join(leftProj, probes, Inner, Some(cond), JoinHint.NONE)
    val keep = j.left.output.map(a => a: NamedExpression) ++
      j.right.output.indices.collect {
        case i if !j.on.contains(j.right.output(i).name) =>
          rightOut(i): NamedExpression
      }
    Project(keep, joined)
  }
}

/** Public DataFrame API over [[RangeJoinPlan]]. */
object RangeJoin {

  /** Pairs of (left row, right row) with equal `on` keys and
    * `rightTs ∈ (leftTs, leftTs + range]`. Uses the session's injected
    * resolution rule when GraftExtensions is installed; otherwise lowers
    * eagerly through the same [[RewriteRangeJoin.expand]]. */
  def range(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rangeAmount: Long): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[SparkSession]
    val node = RangeJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      on, leftTs, rightTs, rangeAmount)
    val installed = spark.sessionState.analyzer.extendedResolutionRules
      .exists(_ eq RewriteRangeJoin)
    GraftSqlBridge.ofRows(
      spark, if (installed) node else RewriteRangeJoin.expand(node))
  }
}
