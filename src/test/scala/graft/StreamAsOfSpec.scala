package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming AS-OF join (EventStream.streamingAsOf) vs the batch
  * q_asof_join, under a genuinely incremental replay: the events fixture
  * split into 4 time-ranged files, streamed one file per micro-batch, so
  * per-user purchase state must be carried correctly ACROSS batches (a
  * single-batch run — how the declared q_stream_asof executes under
  * AvailableNow — never exercises the carry path).
  */
class StreamAsOfSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming as-of equals batch as-of across a 4-batch time-split replay") {
    val events = Tables.events(spark, sf)
    val watch = StreamReplay.writeSlices(events,
      StreamReplay.slicePredicates(events, 4), "asof")
    val stream = StreamReplay.streamDir(spark, watch.getPath)
    val q = EventStream.streamingAsOf(stream).toDF()
      .writeStream.format("memory").queryName("graft_stream_asof_replay")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fedBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(fedBatches >= 4, s"expected >=4 non-empty micro-batches, saw $fedBatches; " +
      s"progress=${q.recentProgress.map(p => (p.batchId, p.numInputRows)).mkString(",")}")

    val got = spark.table("graft_stream_asof_replay")
      .orderBy("user_id", "event_id").collect().toSeq
    val want = ops.TemporalJoinQueries.defs("q_asof_join")
      .fn(spark, sf).collect().toSeq
    assert(got.size == want.size, s"rowcount ${got.size} vs ${want.size}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: $g vs $w")
    }
  }
}
