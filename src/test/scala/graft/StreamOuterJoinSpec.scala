package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** LEFT OUTER stream-stream interval join: the emission contract, pinned.
  *
  * Matched rows must equal the batch inner join exactly. Null-extended
  * rows are watermark-driven: a purchase with no follow-up can only be
  * emitted once the event-side watermark (max event time − 1 h delay)
  * passes its 10-minute window, so the expected null set is exactly the
  * no-follow-up purchases with p_ts + 10 min < final watermark — not
  * "all unmatched purchases", which an unbounded stream can never know.
  */
class StreamOuterJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("left-outer interval join: matched rows = batch inner; nulls gated by watermark") {
    val q = EventStream.purchaseFollowUpsOuter(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("outer_join_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("outer_join_out")

    // matched rows equal the batch inner interval join
    val gotMatched = out.filter(col("event_id").isNotNull)
      .select("user_id", "purchase_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val events = Tables.events(spark, sf)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val wantMatched = purchases.join(
        events.select(col("user_id").as("e_user"), col("ts").as("e_ts"),
          col("event_id")),
        col("p_user") === col("e_user") &&
          col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .select("p_user", "purchase_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(gotMatched.sameElements(wantMatched),
      s"matched rows ${gotMatched.length} vs batch inner ${wantMatched.length}")

    // null rows: exactly the unmatched purchases whose window closed
    // under the final watermark (max event ts − 1 h delay)
    val maxTs = events.agg(max(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    val watermark = maxTs - 3600L
    val gotNulls = out.filter(col("event_id").isNull)
      .select("purchase_id").collect().map(_.getLong(0)).sorted
    val matchedIds = wantMatched.map(_._2).toSet
    val wantNulls = purchases
      .filter(unix_timestamp(col("p_ts")) + 600L < watermark)
      .select("purchase_id").collect().map(_.getLong(0))
      .filterNot(matchedIds).sorted
    assert(gotNulls.sameElements(wantNulls),
      s"null rows ${gotNulls.length} vs expected ${wantNulls.length} " +
        s"(watermark=$watermark)")
  }
}
