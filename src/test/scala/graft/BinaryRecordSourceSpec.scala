package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-binrec splittable binary container: SequenceFile-style
  * sync-marker splits proven over a split-size sweep — every binary
  * record read exactly once wherever the byte-range boundaries fall,
  * including records that embed sentinel-shaped bytes. The binary half
  * of MRInput's "any InputFormat" extensibility claim (§2a), on the
  * same connector skeleton as LineTextSourceSpec.
  */
class BinaryRecordSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  private val dir = "/tmp/graft_binrec/data"

  /** Deterministic payloads of varied size, some containing the -1
    * sentinel int and marker-like bytes mid-payload. */
  private def payloads = {
    import spark.implicits._
    (0 until 500).map { i =>
      val rnd = new java.util.Random(i)
      val n = 1 + (i * 37) % 300
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (i % 7 == 0 && n >= 8) {
        // embed a fake sync sentinel (-1 int + garbage "marker" prefix)
        b(0) = -1; b(1) = -1; b(2) = -1; b(3) = -1
      }
      (i.toLong, b)
    }.toDF("id", "value")
  }

  test("write + sweep: every record read exactly once at any split size") {
    rmrf(new java.io.File("/tmp/graft_binrec"))
    payloads.select("value").repartition(3)
      .write.mode("overwrite")
      .option("syncIntervalBytes", "512") // force many syncs per file
      .format("graft-binrec").save(dir)

    val want = payloads.select("value").collect()
      .map(r => java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](0)))
      .sorted
    Seq(64L, 257L, 1031L, 8192L, 1L << 30).foreach { sz =>
      val got = spark.read.format("graft-binrec")
        .option("splitSize", sz.toString).load(dir)
        .collect()
        .map(r => java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](0)))
        .sorted
      assert(got.length == want.length,
        s"splitSize=$sz: ${got.length} records, expected ${want.length}")
      assert(got.sameElements(want), s"splitSize=$sz: content diverged")
    }
  }

  test("splitSize drives the planned task count") {
    val small = spark.read.format("graft-binrec")
      .option("splitSize", "512").load(dir).rdd.getNumPartitions
    val big = spark.read.format("graft-binrec")
      .option("splitSize", (1L << 30).toString).load(dir).rdd.getNumPartitions
    assert(big == 3, s"one split per file expected, got $big")
    assert(small > 6, s"512 B splits should plan many tasks, got $small")
  }

  test("connector output composes with DataFrame ops (length histogram)") {
    val got = spark.read.format("graft-binrec").load(dir)
      .selectExpr("length(value) AS n")
      .groupBy("n").agg(count(lit(1)).as("c"))
      .agg(sum(expr("n * c")), sum("c")).collect()(0)
    val want = payloads.selectExpr("length(value) AS n")
      .agg(sum("n"), count(lit(1))).collect()(0)
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getLong(1) == want.getLong(1))
  }

  test("overwrite truncates stale container files") {
    val sub = "/tmp/graft_binrec/trunc"
    import spark.implicits._
    Seq(Array[Byte](1, 2, 3), Array[Byte](4)).toDF("value")
      .repartition(2).write.mode("overwrite").format("graft-binrec").save(sub)
    Seq(Array[Byte](9)).toDF("value")
      .repartition(1).write.mode("overwrite").format("graft-binrec").save(sub)
    assert(spark.read.format("graft-binrec").load(sub).count() == 1)
  }
}
