package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.BinaryPipeline
import graft.streaming.EventStream

/** Multimodal binary plumbing: schema, batch shape, determinism. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("decode pipeline produces fixed-width typed stats (real audio)") {
    val media = BinaryPipeline.mediaWav(spark, sf).repartition(4)
    val stats = BinaryPipeline.audioStats(media)
    assert(stats.schema == BinaryPipeline.audioStatSchema)
    val rows = stats.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getLong(3) == 64 + r.getLong(0) % 192))
  }

  test("frame sampling yields n frames per media row") {
    val media = BinaryPipeline.mediaFromDocuments(spark, sf)
    val frames = BinaryPipeline.frameSample(media, 4)
    assert(frames.count() == 500 * 4)
    assert(frames.groupBy("media_id").count().filter(col("count") =!= 4).count() == 0)
  }

  test("decode is deterministic across partitionings") {
    val media = BinaryPipeline.mediaWav(spark, sf)
    val a = BinaryPipeline.audioStats(media).orderBy("media_id").collect()
    val b = BinaryPipeline.audioStats(media.repartition(7))
      .orderBy("media_id").collect()
    assert(a.sameElements(b), "decode must not depend on partitioning")
  }

  test("REAL audio codec: PCM decode recovers the generator's samples exactly") {
    // the declared query gates this against DuckDB; here the law is
    // pinned locally across ids (PCM is lossless — exact, no tolerance)
    for (id <- Seq(0L, 1L, 42L, 499L, 123456789L)) {
      val (rate, ch, nf, sum, abs) =
        BinaryPipeline.decodeAudio(BinaryPipeline.synthWav(id))
      assert(rate === 8000 + (id % 4).toInt * 4000)
      assert(ch === 1 + (id % 2).toInt)
      assert(nf === 64 + id % 192)
      var (esum, eabs) = (0L, 0L)
      for (i <- 0L until nf; c <- 0 until ch) {
        val s = (id * 7 + i * 31 + c * 101 + 13) % 65536 - 32768
        esum += s
        eabs += math.abs(s)
      }
      assert((sum, abs) === ((esum, eabs)), s"id=$id amplitude sums")
    }
    // a non-audio payload fails loudly, not silently
    intercept[Exception] {
      BinaryPipeline.decodeAudio("not a wav".getBytes("UTF-8"))
    }
  }

  test("REAL image codec: ImageIO decode recovers the generator's pixels exactly") {
    // the declared queries gate this against DuckDB; here the law is
    // pinned locally across ids (PNG is lossless — exact, no tolerance)
    for (id <- Seq(0L, 1L, 42L, 499L, 123456789L)) {
      val (w, h, rs, gs, bs) =
        BinaryPipeline.decodeImage(BinaryPipeline.synthPng(id))
      assert(w === 8 + (id % 24).toInt)
      assert(h === 8 + (id % 16).toInt)
      var (ers, egs, ebs) = (0L, 0L, 0L)
      for (x <- 0 until w; y <- 0 until h) {
        ers += (id + x + y) % 256
        egs += (id + 2 * x + 3 * y + 7) % 256
        ebs += (3 * id + 5 * x + 11 * y + 13) % 256
      }
      assert((rs, gs, bs) === ((ers, egs, ebs)), s"id=$id channel sums")
    }
    // a non-image payload fails loudly, not silently
    intercept[IllegalArgumentException] {
      BinaryPipeline.decodeImage("not a png".getBytes("UTF-8"))
    }
  }

  test("id framing is binary-safe and lossless") {
    val payload = Array.tabulate(300)(i => (i * 31 % 256).toByte)
    for (id <- Seq(0L, 1L, Long.MaxValue, 0x0102030405060708L)) {
      val framed = BinaryPipeline.frameId(id, payload)
      assert(BinaryPipeline.unframeId(framed) === id)
      assert(BinaryPipeline.unframePayload(framed).toSeq === payload.toSeq)
    }
  }
}

/** Structured Streaming: batch/stream window parity on the fixture. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming tumbling counts equal the batch oracle") {
    val q = EventStream.tumblingCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_out")
      .select(unix_timestamp(col("window_start")).as("window_start_epoch"),
        col("event_type"), col("n_events"))
      .orderBy("window_start_epoch", "event_type").collect()
    val batch = SparkEntry.queries("q_window_tumbling")(spark, sf)
      .select("window_start_epoch", "event_type", "n_events").collect()
    assert(streamed.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      batch.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
  }

  test("streaming session windows produce sane sessions") {
    val q = EventStream.sessionAgg(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("session_out").count()
    assert(n > 0)
  }
}
