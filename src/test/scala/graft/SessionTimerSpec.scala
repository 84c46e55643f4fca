package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Timer-based sessionization (EventStream.sessionizeWithTimers) under a
  * 4-batch time-split replay: sessions closed by a data gap emit inline;
  * sessions whose user goes quiet emit when a LATER batch's watermark
  * passes end+gap (the event-time timer). Every emitted session must be
  * bit-identical to a batch q_window_session row, all non-final sessions
  * must be emitted, and nothing may emit twice.
  */
class SessionTimerSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Gap = 1800L

  test("timer sessionizer matches batch session windows across a replayed stream") {
    val events = Tables.events(spark, sf)
    val watch = StreamReplay.writeSlices(events,
      StreamReplay.slicePredicates(events, 4), "sess")
    val stream = StreamReplay.streamDir(spark, watch.getPath)
    val q = EventStream.sessionizeWithTimers(stream, Gap).toDF()
      .writeStream.format("memory").queryName("graft_session_timers")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emitted = spark.table("graft_session_timers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(emitted.nonEmpty)
    assert(emitted.distinct.size == emitted.size, "a session emitted twice")

    val batch = SparkEntry.queries("q_window_session")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val batchSet = batch.toSet
    emitted.foreach { s =>
      assert(batchSet.contains(s), s"emitted session not in batch result: $s")
    }
    // completeness floor: every non-final session of each user is closed
    // by later data of that same user, so it MUST have been emitted
    // (timers may additionally close final sessions mid-replay)
    val nonFinal = batch.groupBy(_._1).values.map(_.size - 1).sum
    assert(emitted.size >= nonFinal,
      s"emitted ${emitted.size} < non-final session count $nonFinal")
  }
}
