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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventStream.rawSchema)
      .parquet(s"$sf/events.parquet")
    val mm = raw.agg(min("ts"), max("ts")).collect()(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1

    val watch = java.nio.file.Files.createTempDirectory("graft_asof_watch").toFile
    val scratch = java.nio.file.Files.createTempDirectory("graft_asof_scratch").toFile
    // 4 equal-width time ranges; equal-ts rows can never straddle a file
    // boundary, which is the contract the carry path needs
    (0 until 4).foreach { i =>
      val outDir = new java.io.File(scratch, s"b$i")
      // integer div (Column./ is floating-point division)
      raw.filter(expr(s"((ts - ${lo}L) * 4) div ${span}L") === i)
        .coalesce(1).write.mode("overwrite").parquet(outDir.getPath)
      val part = outDir.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(watch, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // FileStreamSource picks oldest-modified first: pin mtimes ascending
      // so replay order equals event-time order
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }

    val stream = spark.readStream.schema(EventStream.rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.getPath)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
