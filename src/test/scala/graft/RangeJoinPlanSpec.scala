package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{RangeJoin, RangeJoinPlan, RewriteRangeJoin}

/** Custom bounded-RANGE join node (graft.plans.RangeJoinPlan): semantics
  * on a hand-checked fixture, self-join exprId safety, plan shape, and
  * equality with the composed q_range_join. */
class RangeJoinPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def toyFrames(s: SparkSession) = {
    import s.implicits._
    val left = Seq(("a", 0L, 1L), ("a", 95L, 2L), ("b", 40L, 3L),
      ("c", 7L, 4L)).toDF("k", "lts", "lid")
    val right = Seq(
      ("a", 0L, 10L),   // == lts of lid 1 -> excluded (strict lower bound)
      ("a", 10L, 11L),  // == lts+10 of lid 1 -> included (inclusive upper)
      ("a", 5L, 12L),   // in (0, 10] of lid 1
      ("a", 101L, 13L), // in (95, 105] of lid 2, crosses bucket 9->10
      ("b", 51L, 14L),  // > 40+10 -> excluded
      ("d", 1L, 15L)    // key with no left rows
    ).toDF("k", "rts", "rid")
    (left, right)
  }

  // expected (lid, rid) pairs for range = 10
  private val expected = Set((1L, 11L), (1L, 12L), (2L, 13L))

  test("fallback path (no extension) computes (lts, lts+range] semantics") {
    val (l, r) = toyFrames(spark)
    val out = RangeJoin.range(l, r, Seq("k"), "lts", "rts", 10L)
    val got = out.collect().map(x =>
      (x.getLong(x.fieldIndex("lid")), x.getLong(x.fieldIndex("rid")))).toSet
    assert(got == expected)
    assert(!out.queryExecution.analyzed.exists(_.isInstanceOf[RangeJoinPlan]))
  }

  test("extension path resolves the node via the injected rule") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      assert(ext.sessionState.analyzer.extendedResolutionRules
        .exists(_ eq RewriteRangeJoin), "rule not injected")
      val (l, r) = toyFrames(ext)
      val out = RangeJoin.range(l, r, Seq("k"), "lts", "rts", 10L)
      val got = out.collect().map(x =>
        (x.getLong(x.fieldIndex("lid")), x.getLong(x.fieldIndex("rid")))).toSet
      assert(got == expected)
      assert(!out.queryExecution.analyzed.exists(_.isInstanceOf[RangeJoinPlan]))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("self-join over one base relation survives relation deduplication") {
    import spark.implicits._
    // both sides project the SAME DataFrame — the rewrite's fresh probe
    // aliases must keep references valid when the analyzer deduplicates
    val ev = Seq(("a", 1L, 100L), ("a", 8L, 101L), ("a", 30L, 102L))
      .toDF("k", "ts", "id")
    val out = RangeJoin.range(
      ev.selectExpr("k", "ts AS lts", "id AS lid"),
      ev.selectExpr("k", "ts AS rts", "id AS rid"),
      Seq("k"), "lts", "rts", 10L)
    val got = out.collect().map(x =>
      (x.getLong(x.fieldIndex("lid")), x.getLong(x.fieldIndex("rid")))).toSet
    assert(got == Set((100L, 101L)))
  }

  test("banded plan: equi-join only, never a cartesian/nested-loop") {
    val (l, r) = toyFrames(spark)
    val out = RangeJoin.range(l, r, Seq("k"), "lts", "rts", 10L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("q_range_plan equals the composed q_range_join exactly") {
    val a = SparkEntry.queries("q_range_join")(spark, sf).collect()
    val b = SparkEntry.queries("q_range_plan")(spark, sf).collect()
    // identical column set, identical total ORDER BY, deterministic
    // contents -> exact row-for-row equality
    assert(a.toSeq == b.toSeq)
  }
}
