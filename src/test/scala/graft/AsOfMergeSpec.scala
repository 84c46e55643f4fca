package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoin, AsOfMerge, AsOfMergeJoinExec}

/** The custom physical as-of operator (AsOfMergeJoinExec): plan shape,
  * shuffle budget, and semantic parity with the analysis-time rewrite
  * path on adversarial edge cases (ties, NULL payloads, empty sides).
  */
class AsOfMergeSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def events = {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("event_type"), col("value"))
    (ev.select("user_id", "event_id", "es"),
      ev.filter(col("event_type") === "purchase")
        .select("user_id", "es", "value"))
  }

  test("physical plan contains the custom exec and exactly one exchange per side") {
    val (l, r) = events
    val df = AsOfMerge.asof(l, r, Seq("user_id"), "es", "es", "value", "lpv")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) { case e: AsOfMergeJoinExec => e }
    assert(execs.size == 1, plan.toString.take(600))
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size == 2,
      s"wanted 2 exchanges (one per side), got ${exchanges.size}:\n${plan.toString.take(800)}")
    // no window aggregate and no union: this is the merge path
    assert(!plan.toString.contains("Window"), plan.toString.take(600))
    assert(!plan.toString.contains("Union"), plan.toString.take(600))
  }

  test("exec path equals the rewrite path on the fixture") {
    val (l, r) = events
    val viaExec = AsOfMerge
      .asof(l, r, Seq("user_id"), "es", "es", "value", "lpv")
      .orderBy("user_id", "event_id").collect().toSeq
    val viaRewrite = AsOfJoin
      .asof(l, r, Seq("user_id"), "es", "es", "value", "lpv")
      .orderBy("user_id", "event_id").collect().toSeq
    assert(viaExec.size == viaRewrite.size)
    viaExec.zip(viaRewrite).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("edge cases: equal-ts ties, NULL payloads, keys missing on either side") {
    import spark.implicits._
    // key 1: tie at ts 10 (payloads 5.0 and 7.0 -> larger wins), NULL at 20
    // key 2: right rows only (left absent) — must not leak into key 3
    // key 3: left rows only -> NULL payload
    // key 4: right ts AFTER every left ts -> NULL
    val left = Seq(
      (1L, 100L, 9L), (1L, 101L, 10L), (1L, 102L, 15L), (1L, 103L, 25L),
      (3L, 300L, 10L), (4L, 400L, 5L))
      .toDF("k", "id", "ts")
    val right = Seq(
      (1L, 10L, Some(5.0)), (1L, 10L, Some(7.0)), (1L, 20L, None: Option[Double]),
      (2L, 1L, Some(99.0)), (4L, 50L, Some(42.0)))
      .toDF("k", "ts", "p")
    val out = AsOfMerge.asof(left, right, Seq("k"), "ts", "ts", "p", "v")
      .orderBy("id").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (100L, null), // before any purchase
      (101L, 7.0), // inclusive tie -> larger payload
      (102L, 7.0), // NULL payload at 20 not yet reached
      (103L, 7.0), // NULL payload skipped, previous non-null wins
      (300L, null), // key with no right rows; key 2's rows must not leak
      (400L, null)), // right exists but only in the future
      out.mkString(","))
    // and the rewrite path agrees on every edge case
    val viaRewrite = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts", "p", "v")
      .orderBy("id").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(viaRewrite.toSeq == out.toSeq)
  }
}
