package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decoded by partition-local batched workers.
  *
  * The Spark-side mechanics here are real and tested — schema, partition
  * sizing, batch shape, typed feature output. The actual media decode is
  * STUBBED behind `decodeStub` (this container has no image/audio codecs):
  * a deterministic fake that derives "features" from the bytes, so tests
  * are reproducible. Swapping in a real decoder is a one-function change;
  * everything around it (the expensive part at 100 TB) stays.
  *
  * Scale design:
  *  - payloads stay opaque `BinaryType` end to end — never stringified,
  *    never collected;
  *  - decode runs in `mapPartitions`, one worker init per PARTITION (the
  *    model/codec load is amortized over every row in the partition, the
  *    same batching Pandas-UDF pipelines get);
  *  - partition row targets are controlled by the caller via
  *    `repartition(n)` before decode so a 100 TB corpus sizes decode
  *    tasks by payload bytes, not file count;
  *  - feature output is a fixed-width struct → columnar downstream.
  */
object BinaryPipeline {

  /** Typed media record: opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta_source", StringType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decoder — deterministic fake features from payload bytes.
    * Replace with a real codec (image resize / audio resample / video
    * frame-sample) without touching the surrounding plumbing. */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val feat = new Array[Float](8)
    var h = 7L
    var i = 0
    while (i < n) {
      h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
      feat(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (n % 640, n % 480, feat.map(f => f + (h % 97) / 97.0f))
  }

  /** STUB frame sampler: n evenly-spaced "frames" (byte slices) hashed
    * deterministically — the video-frame-sampling plumbing with the codec
    * replaced by arithmetic. Returns min(n, payload-length) hashes. */
  def sampleFrameHashes(payload: Array[Byte], n: Int): Array[Long] = {
    val len = math.max(payload.length, 1)
    val k = math.min(n, len)
    Array.tabulate(k) { f =>
      val start = (f.toLong * len / k).toInt
      val end = math.min(((f + 1).toLong * len / k).toInt, payload.length)
      var h = 17L
      var i = start
      while (i < end) { h = (h * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
      h
    }
  }

  /** Build a media table from `documents` (text bytes standing in for an
    * image/audio payload — the fixture set carries no real media). */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        col("text").cast(BinaryType).as("payload"),
        col("source").as("meta_source"))

  /** Frame-sample surface: one row per sampled frame (media_id,
    * frame_idx, frame_hash), the exploded shape a downstream embedding
    * stage consumes. Runs partition-local like decodeFeatures. */
  def frameSample(media: DataFrame, nFrames: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .map { r =>
        (r.getLong(0), sampleFrameHashes(r.getAs[Array[Byte]]("payload"), nFrames))
      }
      .toDF("media_id", "hashes")
      .select(col("media_id"), posexplode(col("hashes")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_hash")
  }

  /** Partition-local batched decode: binary in, fixed-width features out. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      // one-time per-partition worker init would go here (codec/model load)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, feat) = decodeStub(payload)
        Row(r.getLong(0), r.getString(1), payload.length.toLong, w, h, feat.toSeq)
      }
    }(enc)
  }
}
