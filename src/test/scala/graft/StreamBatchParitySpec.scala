package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Categorical streaming-ingest drift detector — the round-4 lesson:
  * a fixture-layout change made every streaming query return silently
  * wrong results (timestamps decoded 1000× small, windows collapsed)
  * while each individual spec still "passed" against itself. This spec
  * cross-checks every DECLARED streaming query against its batch twin
  * computed from the same fixture through the batch read path, inside
  * the suite, on sf0.001 — any schema/ingest divergence between the
  * two paths (the only two read paths in the repo) fails loudly here
  * no matter which one drifted.
  *
  * Contracts: tumbling/sliding/session and the as-of join are exact
  * batch-equality (complete-mode re-emission / append over a single
  * in-order AvailableNow batch); the stream-stream join equals the
  * batch interval join; dedup equals batch DISTINCT; the running
  * totals cover every event row; the watermark-gated variants
  * (running_wm, session_v2, join_outer) equal their characterized
  * batch restrictions.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // --- exact batch-equality pairs -----------------------------------
  Seq(
    "q_stream_tumbling"      -> "q_window_tumbling",
    "q_stream_sliding"       -> "q_window_sliding",
    "q_stream_session"       -> "q_window_session",
    "q_stream_asof"          -> "q_asof_join",
    "q_stream_contamination" -> "q_contamination",
    "q_stream_funnel"        -> "q_event_funnel"
  ).foreach { case (s, b) =>
    test(s"$s equals batch twin $b on sf0.001") {
      val got = run(s).collect().toSeq
      val want = run(b).collect().toSeq
      assert(got.size == want.size,
        s"$s rows ${got.size} vs $b rows ${want.size} — streaming ingest drifted")
      assert(got.toSet == want.toSet, s"$s content differs from $b")
    }
  }

  test("q_stream_dedup equals batch DISTINCT (event_type, hour)") {
    val got = run("q_stream_dedup").count()
    val want = Tables.events(spark, sf)
      .select(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .distinct().count()
    assert(got == want, s"stream dedup $got vs batch distinct $want")
  }

  test("q_stream_join_semi equals the batch EXISTS") {
    val got = run("q_stream_join_semi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: distinct purchases with >=1 same-user follow-up in
    // 10 minutes — the inner join's left side, deduplicated
    val want = run("q_stream_join").select("user_id", "purchase_id")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"semi ${got.size} vs distinct-inner ${want.size}")
  }

  test("q_stream_dedup_wm drops the injected duplicates exactly") {
    // The batch twin is the rollup over the PLAIN events table: the
    // streaming side unions in a duplicate copy of every third id, so
    // equality here proves dropDuplicatesWithinWatermark removed each
    // injected row (counts would inflate by the copy fraction if not).
    val got = run("q_stream_dedup_wm").collect().toSet
    val want = Tables.events(spark, sf)
      .selectExpr("event_type",
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .collect().toSet
    assert(got == want, "watermarked dedup output differs from batch rollup")
  }

  test("q_stream_join equals the batch interval join") {
    val events = Tables.events(spark, sf)
    val want = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .join(events.select(col("user_id").as("e_user"), col("ts").as("e_ts"),
          col("event_id")),
        col("p_user") === col("e_user") &&
          col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .count()
    val got = run("q_stream_join").count()
    assert(got == want, s"stream join $got rows vs batch $want")
  }

  test("q_stream_running covers every event row") {
    assert(run("q_stream_running").count() == Tables.events(spark, sf).count())
  }

  test("q_stream_running_wm covers every row strictly before the final second") {
    val es = Tables.events(spark, sf).select(unix_timestamp(col("ts")).as("es"))
    val maxEs = es.agg(max("es")).head().getLong(0)
    val want = es.filter(col("es") < maxEs).count()
    assert(run("q_stream_running_wm").count() == want)
  }

  test("q_stream_session_v2 equals batch sessions closed below the final watermark") {
    val batch = run("q_window_session") // (user_id, start, duration, n, sum)
    val maxEs = Tables.events(spark, sf)
      .agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val want = batch.filter(col("session_start_epoch") + col("duration_sec")
      + lit(1801L) <= lit(maxEs)).count()
    assert(run("q_stream_session_v2").count() == want)
  }

  test("q_stream_join_outer matched rows equal the inner stream join") {
    val outer = run("q_stream_join_outer")
    val matched = outer.filter(col("event_id").isNotNull).count()
    val inner = run("q_stream_join").count()
    assert(matched == inner,
      s"outer-join matched rows $matched vs inner join $inner")
  }

  test("q_stream_enrich equals the batch enrichment rollup") {
    val events = Tables.events(spark, sf)
    val want = events
      .withColumn("cents", expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
      .join(events.groupBy("event_type").agg(count(lit(1)).as("w")), "event_type")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(expr("cents * w")).as("weighted_cents"))
      .select(unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("event_type"), col("n_events"), col("weighted_cents"))
      .collect().toSet
    val got = run("q_stream_enrich").collect().toSet
    assert(got == want, "stream enrichment differs from batch rollup")
  }
}
