package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Sessionization on the transformWithState API with event-time timers
  * (EventStream.sessionizeV2), under the same 4-batch time-split replay
  * contract as the v1 SessionTimerSpec: every emitted session
  * bit-matches a batch q_window_session row, nothing emits twice, and
  * every session that should have closed below the final watermark is
  * present — including timer-closed sessions of users silent in later
  * batches.
  */
class SessionTimerV2Spec extends AnyFunSuite {
  import SparkTestSession._

  private val Gap = 1800L

  test("v2 timer sessionizer matches batch session windows across a replayed stream") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val raw = spark.read.schema(EventStream.rawSchema)
        .parquet(s"$sf/events.parquet")
      val mm = raw.agg(min("ts"), max("ts")).collect()(0)
      val (lo, span) = (mm.getLong(0), mm.getLong(1) - mm.getLong(0) + 1)
      val watch = java.nio.file.Files.createTempDirectory("graft_sessv2_watch").toFile
      val scratch = java.nio.file.Files.createTempDirectory("graft_sessv2_scratch").toFile
      (0 until 4).foreach { i =>
        val outDir = new java.io.File(scratch, s"b$i")
        raw.filter(expr(s"((ts - ${lo}L) * 4) div ${span}L") === i)
          .coalesce(1).write.mode("overwrite").parquet(outDir.getPath)
        val part = outDir.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(watch, f"batch_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        assert(dst.setLastModified(1700000000000L + i * 60000L))
      }

      val stream = spark.readStream.schema(EventStream.rawSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(watch.getPath)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val q = EventStream.sessionizeV2(stream, Gap).toDF()
        .writeStream.format("memory").queryName("graft_session_v2")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val emitted = spark.table("graft_session_v2").collect()
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

      // completeness below the final watermark: any batch session whose
      // close condition (end + gap) sits under max event time must have
      // been emitted — inline by a successor or by its timer
      val maxEs = raw.agg(max(expr("ts div 1000000000"))).collect()(0).getLong(0)
      val mustEmit = batch.filter { case (_, start, dur, _, _) =>
        start + dur + Gap < maxEs
      }
      val emittedSet = emitted.toSet
      mustEmit.foreach { s =>
        assert(emittedSet.contains(s),
          s"closed session not emitted (timer failed to fire): $s")
      }
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }
}
