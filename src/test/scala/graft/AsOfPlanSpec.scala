package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoin, AsOfJoinPlan, RewriteAsOfJoin}

/** Custom Catalyst operator: AsOfJoinPlan + RewriteAsOfJoin
  * (SURVEY.md §7 preference order (c)). Covers both entry paths —
  * the analyzer-injected resolution rule (spark.sql.extensions=
  * graft.GraftExtensions) and the eager no-extension fallback — and
  * checks semantics against a hand-computed oracle.
  */
class AsOfPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def toyFrames(s: SparkSession) = {
    import s.implicits._
    // left: (key, ts); right: (key, ts, payload)
    val left = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 5L, 3L),
      ("b", 15L, 4L), ("c", 9L, 5L)).toDF("k", "ts", "row_id")
    val right = Seq(("a", 10L, 1.5), ("a", 18L, 2.5), ("b", 1L, 9.0),
      ("b", 15L, 7.0), ("b", 15L, 8.0)).toDF("k", "rts", "v")
    (left, right)
  }

  // expected: latest right v with rts <= ts per key; ties at equal rts
  // resolved to the largest payload (the node's documented total order)
  private val expected = Map(
    1L -> Some(1.5), // a@10 -> right a@10
    2L -> Some(2.5), // a@20 -> right a@18
    3L -> None,      // a@5  -> nothing at or before
    4L -> Some(8.0), // b@15 -> tie at 15 -> max payload
    5L -> None)      // c has no right rows

  private def check(rows: Array[Row]): Unit = {
    val got = rows.map(r =>
      r.getLong(r.fieldIndex("row_id")) ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None
         else Some(r.getDouble(r.fieldIndex("asof_v"))))).toMap
    assert(got == expected)
  }

  test("fallback path (no extension) computes inclusive as-of semantics") {
    val (l, r) = toyFrames(spark)
    val out = AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", "v", "asof_v")
    check(out.collect())
    // the fallback must have lowered eagerly: no AsOfJoinPlan survives
    assert(!out.queryExecution.analyzed.exists(_.isInstanceOf[AsOfJoinPlan]))
  }

  test("extension path resolves the node via the injected rule") {
    // a new session over the same SparkContext, with extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a static conf read at SparkContext creation,
    // so on a shared test context we use builder.withExtensions — the same
    // injection a cluster user gets from the conf on a fresh context.
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      assert(ext.sessionState.analyzer.extendedResolutionRules
        .exists(_ eq RewriteAsOfJoin), "rule not injected")
      val (l, r) = toyFrames(ext)
      val out = AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", "v", "asof_v")
      check(out.collect())
      assert(!out.queryExecution.analyzed.exists(_.isInstanceOf[AsOfJoinPlan]))
    } finally {
      // do NOT ext.stop(): it would stop the shared SparkContext;
      // just point the active/default session back at the suite session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("single shuffle: one exchange below the window") {
    val (l, r) = toyFrames(spark)
    val out = AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", "v", "asof_v")
    val plan = out.queryExecution.executedPlan.toString
    // union-sort composition: exactly one shuffle (on the keys), no join
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q_asof_plan equals the composed q_asof_join on shared columns") {
    val a = SparkEntry.queries("q_asof_join")(spark, sf)
      .select("user_id", "event_id", "last_purchase_val")
      .orderBy("user_id", "event_id").collect()
    val b = SparkEntry.queries("q_asof_plan")(spark, sf)
      .select("user_id", "event_id", "last_purchase_val")
      .orderBy("user_id", "event_id").collect()
    // same keys; payload may differ only where the composed query's
    // event_id tiebreak and the node's payload tiebreak pick different
    // equal-ts purchases — values still must come from the same ts set.
    assert(a.length == b.length)
    val diff = a.zip(b).count { case (x, y) => x != y }
    assert(diff.toDouble / a.length < 0.01, s"$diff of ${a.length} differ")
  }
}
