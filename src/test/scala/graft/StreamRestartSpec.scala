package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart recovery — the streaming half of the
  * fault-tolerance story (FaultToleranceSpec covers task retry inside a
  * job; this covers a whole QUERY dying between micro-batches): a
  * stateful aggregation processes part of its input, the query is
  * stopped cold, and a NEW query object resumes from the checkpoint —
  * the offset log replays nothing, state is restored, and the final
  * result equals the batch answer with no loss and no double counting.
  * At 100 TB this is the property that makes a 24/7 ingest pipeline
  * restartable at all.
  */
class StreamRestartSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("stateful query resumes from checkpoint with no loss or double counting") {
    val events = Tables.events(spark, sf)
    val watch = StreamReplay.writeSlices(events,
      StreamReplay.slicePredicates(events, 4), "restart")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt").toFile

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))

    def startQuery() = agg(StreamReplay.streamDir(spark, watch.getPath))
      .writeStream.format("memory").queryName("graft_restart_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.getPath)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    // phase 1: process at least 2 micro-batches, then die cold
    val q1 = startQuery()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
          System.nanoTime() < deadline) Thread.sleep(100)
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
        "phase 1 never processed 2 batches")
    } finally q1.stop()

    // phase 2: a NEW query resumes from the same checkpoint
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.table("graft_restart_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val want = agg(Tables.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.length == want.length, s"${got.length} users vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"restart broke exactly-once: $g vs $w")
    }
  }
}
