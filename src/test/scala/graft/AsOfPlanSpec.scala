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

  test("helper-name collisions and duplicate left columns are tolerated") {
    val (l0, r) = toyFrames(spark)
    // a user column named like an internal helper must not be shadowed or
    // cause ambiguity — references are bound by exprId, not name
    val l1 = l0.withColumn("__graft_asof_ts", lit(99))
    check(AsOfJoin.asof(l1, r, Seq("k"), "ts", "rts", "v", "asof_v").collect())
    // duplicate column names in the left input (legal after joins)
    val l2 = l0.select(col("k"), col("ts"), col("row_id"), col("ts"))
    check(AsOfJoin.asof(l2, r, Seq("k"), "ts", "rts", "v", "asof_v").collect())
    // outName colliding with an existing left column is rejected up front
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l0, r, Seq("k"), "ts", "rts", "v", "row_id")
    }
    assert(e.getMessage.contains("row_id"))
  }

  test("single shuffle: one exchange below the window") {
    val (l, r) = toyFrames(spark)
    val out = AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", "v", "asof_v")
    val plan = out.queryExecution.executedPlan.toString
    // union-sort composition: exactly one shuffle (on the keys), no join
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q_asof_plan equals the composed q_asof_join up to equal-ts ties") {
    val a = SparkEntry.queries("q_asof_join")(spark, sf)
      .select("user_id", "event_id", "last_purchase_val")
      .orderBy("user_id", "event_id").collect()
    val b = SparkEntry.queries("q_asof_plan")(spark, sf)
      .select("user_id", "event_id", "last_purchase_val")
      .orderBy("user_id", "event_id").collect()
    assert(a.length == b.length)
    // EXACT tie normalization (no row-difference budget): the two queries
    // use different tiebreaks among purchases at the same qualifying ts
    // (event_id vs payload), so for every event we compute the full set of
    // valid payloads — the purchases at the MAXIMUM ts ≤ the event's ts —
    // and assert each side's answer is a member (None iff the set is empty).
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("event_type"), col("value")).collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
      .groupBy(_._1)
    val valid: Map[(Long, Long), Set[Option[Double]]] = ev.map { r =>
      val (u, es, eid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val qual = purchases.getOrElse(u, Array.empty[(Long, Long, Double)])
        .filter(_._2 <= es)
      val vs: Set[Option[Double]] =
        if (qual.isEmpty) Set(None)
        else {
          val m = qual.map(_._2).max
          qual.filter(_._2 == m).map(p => Option(p._3)).toSet
        }
      (u, eid) -> vs
    }.toMap
    def payload(r: Row): Option[Double] =
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1),
        s"key mismatch: $x vs $y")
      val vs = valid((x.getLong(0), x.getLong(1)))
      assert(vs.contains(payload(x)), s"q_asof_join row $x not in valid set $vs")
      assert(vs.contains(payload(y)), s"q_asof_plan row $y not in valid set $vs")
    }
  }
}
