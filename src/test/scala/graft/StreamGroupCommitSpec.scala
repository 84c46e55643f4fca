package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GroupCommit
import graft.streaming.EventStream

/** Streaming ingest through the vertex-group commit
  * (EventStream.sinkToGroupCommitted): every micro-batch publishes
  * purchases + other events + per-type counts as ONE all-or-nothing
  * group, and the composition is exactly-once across crash/replay.
  *
  * Three contracts pinned here:
  *  1. End-to-end parity: after a 2-batch replay, the union of the
  *     published batch dirs equals the corresponding batch-mode split
  *     of the whole fixture (no loss, no duplication, consistent
  *     stats sink).
  *  2. Restart idempotence: restarting the stream on the same
  *     checkpoint replays nothing and changes no published bytes.
  *  3. Crash-mid-publish: a group that failed between sink publishes
  *     is invisible-or-recovered — after recover(), all three sinks
  *     of the affected batch are present and consistent.
  */
class StreamGroupCommitSpec extends AnyFunSuite {
  import SparkTestSession._

  private def runStream(src: String, base: String): Unit = {
    val stream = StreamReplay.streamDir(spark, src)
    val q = EventStream.sinkToGroupCommitted(stream, base)
    q.processAllAvailable()
    q.stop()
  }

  test("per-batch group commit: parity, restart idempotence, crash recovery") {
    val raw = Tables.events(spark, sf)
    val src = StreamReplay.writeSlices(raw,
      StreamReplay.slicePredicates(raw, 2), "gc")
    val base = java.nio.file.Files.createTempDirectory("graft_gc_base")
      .toFile.getPath

    // 1. run to completion: 2 micro-batches, each a 3-sink group
    runStream(src.getPath, base)
    val purchases = spark.read.parquet(s"$base/purchases/batch_0",
      s"$base/purchases/batch_1")
    val others = spark.read.parquet(s"$base/others/batch_0",
      s"$base/others/batch_1")
    val wantP = raw.filter(col("event_type") === "purchase").count()
    val wantO = raw.count() - wantP
    assert(purchases.count() == wantP, "purchases union != batch filter")
    assert(others.count() == wantO, "others union != batch filter")
    // stats sinks sum to the global per-type counts
    val stats = spark.read.parquet(s"$base/stats/batch_0", s"$base/stats/batch_1")
      .groupBy("event_type").agg(sum("n_events").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantStats = raw.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == wantStats, s"stats $stats vs $wantStats")

    // 2. restart on the same checkpoint: nothing replays, bytes unchanged
    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(base))
        .filterNot(_.getPath.contains("_checkpoint"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = snapshot()
    runStream(src.getPath, base)
    assert(snapshot() == before, "restart republished data")

    // 3. crash between sink publishes, then recover: all-or-nothing
    val batch = raw.limit(100)
    val p3 = batch.filter(col("event_type") === "purchase")
    val o3 = batch.filter(col("event_type") =!= "purchase")
    val st3 = batch.groupBy("event_type").agg(count(lit(1)).as("n_events"))
    val sinks = Seq(
      GroupCommit.Sink(p3, s"$base/purchases/batch_99"),
      GroupCommit.Sink(o3, s"$base/others/batch_99"),
      GroupCommit.Sink(st3, s"$base/stats/batch_99"))
    intercept[Exception] {
      GroupCommit.commitGroup(spark, base, sinks,
        injectFailure = Some(GroupCommit.FailPoint.AfterFirstPublish))
    }
    // post-decision crash: recover() must roll the whole group forward
    GroupCommit.recover(spark, base)
    Seq("purchases", "others", "stats").foreach { s =>
      assert(new java.io.File(s"$base/$s/batch_99").exists(),
        s"$s/batch_99 missing after recover()")
    }
    assert(spark.read.parquet(s"$base/purchases/batch_99").count() ==
      p3.count())
  }
}
