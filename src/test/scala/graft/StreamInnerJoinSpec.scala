package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Stream-stream INNER interval join (EventStream.purchaseFollowUps, the
  * declared q_stream_join) under a genuinely incremental replay that
  * PROVES cross-batch state carry: the events fixture is split into two
  * time-ranged files cut deliberately BETWEEN one matched purchase and
  * its follow-up event, so that pair can only appear in the output if
  * the purchase was held in join state across the micro-batch boundary
  * (the single-batch AvailableNow run of the declared query never
  * exercises that path). The 1-hour watermark on both sides covers the
  * 10-minute join window with a 6× margin, so the time-ordered replay
  * must lose nothing: the streamed result equals the batch inner join
  * exactly.
  */
class StreamInnerJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private val WindowUs = 600L * 1000000L // 10 minutes in µs

  test("inner interval join equals batch join across a batch-boundary cut") {
    val raw = Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))

    // find a matched (purchase, follow-up) pair to cut between — widest
    // gap first so the cut point cannot collide with either timestamp
    val pp = raw.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"))
    val pair = pp.join(
        raw.select(col("user_id").as("e_user"), col("us").as("e_us")),
        col("p_user") === col("e_user") &&
          col("e_us") > col("p_us") &&
          col("e_us") <= col("p_us") + lit(WindowUs))
      .orderBy((col("e_us") - col("p_us")).desc, col("p_user"))
      .select("p_us", "e_us").limit(1).collect()
    assert(pair.nonEmpty, "fixture has no matched pair at all")
    val cut = pair(0).getLong(0) / 2 + pair(0).getLong(1) / 2
    assert(pair(0).getLong(0) < cut && cut < pair(0).getLong(1))

    val watch = StreamReplay.writeSlices(raw.drop("us"),
      Seq(unix_micros(col("ts")) <= cut, unix_micros(col("ts")) > cut), "sjoin")
    val stream = StreamReplay.streamDir(spark, watch.getPath)
    val q = EventStream.purchaseFollowUps(stream)
      .writeStream.format("memory").queryName("graft_stream_join_replay")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fedBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(fedBatches >= 2, s"expected >=2 non-empty micro-batches, saw $fedBatches")

    val got = spark.table("graft_stream_join_replay")
      .select("user_id", "purchase_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val events = Tables.events(spark, sf)
    val want = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .join(events.select(col("user_id").as("e_user"), col("ts").as("e_ts"),
          col("event_id")),
        col("p_user") === col("e_user") &&
          col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .select("p_user", "purchase_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.length == want.length,
      s"rowcount ${got.length} vs batch ${want.length}")
    assert(got.sameElements(want))
  }
}
