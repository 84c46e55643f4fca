package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** transformWithState (the v2 arbitrary-state API) under a genuinely
  * incremental replay: events split into 4 time-ranged files streamed
  * one per micro-batch, so the processor's ValueState running total
  * must carry correctly ACROSS batches. Expected values come from the
  * batch window query the declared q_stream_running shares its oracle
  * with.
  */
class TransformWithStateSpec extends AnyFunSuite {
  import SparkTestSession._

  test("transformWithState running totals carry across a 4-batch replay") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val raw = spark.read.schema(EventStream.rawSchema)
        .parquet(s"$sf/events.parquet")
      val mm = raw.agg(min("ts"), max("ts")).collect()(0)
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val span = hi - lo + 1

      val watch = java.nio.file.Files.createTempDirectory("graft_tws_watch").toFile
      val scratch = java.nio.file.Files.createTempDirectory("graft_tws_scratch").toFile
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
      val q = EventStream.runningSpend(stream).toDF()
        .writeStream.format("memory").queryName("graft_tws_replay")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val fedBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(fedBatches >= 4, s"expected >=4 non-empty micro-batches, saw $fedBatches")

      val got = spark.table("graft_tws_replay")
        .orderBy("user_id", "event_id").collect().toSeq
      val want = Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"),
          sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy("user_id")
              .orderBy(unix_timestamp(col("ts")), col("event_id"))
              .rowsBetween(Long.MinValue, 0))
            .as("running_cents"))
        .orderBy("user_id", "event_id").collect().toSeq
      assert(got.size == want.size, s"rowcount ${got.size} vs ${want.size}")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"row $i: $g vs $w")
      }
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }
}
