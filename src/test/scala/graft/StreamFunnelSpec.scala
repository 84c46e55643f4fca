package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming funnel (EventStream.funnelStates) vs the batch
  * q_event_funnel under a genuinely incremental replay: the events
  * fixture split into 4 time-ranged files, streamed one file per
  * micro-batch, so per-user (t1, t2, t3) state must carry correctly
  * ACROSS batches — e.g. a user whose view lands in batch 0 and click
  * in batch 2 completes the stage only through the carried state (the
  * declared q_stream_funnel's AvailableNow run is a single batch and
  * never exercises this path). Snapshots are update-mode (one per
  * touched user per batch); the last-per-user snapshot is collapsed
  * with max() exactly as the declared query does.
  */
class StreamFunnelSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming funnel equals batch funnel across a 4-batch time-split replay") {
    val events = Tables.events(spark, sf)
    val watch = StreamReplay.writeSlices(events,
      StreamReplay.slicePredicates(events, 4), "funnel")
    val stream = StreamReplay.streamDir(spark, watch.getPath)
    val q = EventStream.funnelStates(stream).toDF()
      .writeStream.format("memory").queryName("graft_stream_funnel_replay")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fedBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(fedBatches >= 4, s"expected >=4 non-empty micro-batches, saw $fedBatches")

    val snaps = spark.table("graft_stream_funnel_replay")
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
    val got = snaps.agg(
      expr("CAST(sum(CASE WHEN t1 >= 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("n_view"),
      expr("CAST(sum(CASE WHEN t2 >= 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("n_click"),
      expr("CAST(sum(CASE WHEN t3 >= 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("n_purchase"),
      expr("round(CAST(CAST(sum(CASE WHEN t3 >= 0 THEN t3 - t1 ELSE 0 END)" +
        " AS BIGINT) AS DOUBLE)" +
        " / sum(CASE WHEN t3 >= 0 THEN 1 ELSE 0 END), 6)")
        .as("avg_funnel_secs"))
      .collect()(0)
    val want = SparkEntry.queries("q_event_funnel")(spark, sf).collect()(0)
    assert(got == want, s"replayed funnel $got vs batch $want")

    // and at least one user's funnel completes across DIFFERENT batches
    // (otherwise this replay would not be exercising the carry path)
    val perUser = spark.table("graft_stream_funnel_replay")
    val multiStep = perUser
      .groupBy("user_id")
      .agg(countDistinct(expr(
        "CASE WHEN t3 >= 0 THEN 3 WHEN t2 >= 0 THEN 2 WHEN t1 >= 0 THEN 1 ELSE 0 END"))
        .as("distinct_stages"))
      .filter(col("distinct_stages") >= 2)
      .count()
    assert(multiStep > 0,
      "no user advanced stages across batches — replay split too coarse")
  }
}
