package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-text DataSource V2 connector: TextInputFormat's byte-range
  * split contract proven over a sweep of split sizes — every line read
  * exactly once no matter where the boundaries fall, parity with the
  * built-in text source, and task count responding to the splitSize
  * knob (§2a MRInput/TezSplitGrouper parity at the connector layer).
  */
class LineTextSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("byte-range splits read every line exactly once across split-size sweep") {
    val dir = "/tmp/graft_linetext/data"
    rmrf(new java.io.File("/tmp/graft_linetext"))
    Tables.documents(spark, sf)
      .selectExpr("concat(doc_id, '|', lang, '|', n_chars) AS value")
      .coalesce(1).write.text(dir)

    val want = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(want.length == Tables.documents(spark, sf).count())

    // sweep odd split sizes so boundaries land mid-line in many places
    Seq(64L, 257L, 1031L, 8192L, 1L << 30).foreach { sz =>
      val got = spark.read.format("graft-text")
        .option("splitSize", sz.toString).load(dir)
        .collect().map(_.getString(0)).sorted
      assert(got.length == want.length,
        s"splitSize=$sz: ${got.length} lines, expected ${want.length}")
      assert(got.sameElements(want), s"splitSize=$sz: content diverged")
    }
  }

  test("splitSize drives the planned task count") {
    val dir = "/tmp/graft_linetext/data"
    val small = spark.read.format("graft-text")
      .option("splitSize", "512").load(dir).rdd.getNumPartitions
    val big = spark.read.format("graft-text")
      .option("splitSize", (1L << 30).toString).load(dir).rdd.getNumPartitions
    assert(big == 1, s"one giant split expected, got $big")
    assert(small > 4, s"512 B splits should plan many tasks, got $small")
  }

  test("connector write path: attempt files commit atomically, overwrite truncates") {
    val dir = "/tmp/graft_linetext/written"
    rmrf(new java.io.File(dir))
    val df = Tables.documents(spark, sf)
      .selectExpr("concat(doc_id, ':', lang) AS value")
    df.repartition(4).write.mode("overwrite").format("graft-text").save(dir)

    // committed: no temp dir remains, one part file per task
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(!files.exists(_.startsWith("_temporary")), files.mkString(","))
    assert(files.count(_.startsWith("part-")) == 4, files.mkString(","))

    // read back through the builtin source: content identical
    val got = spark.read.text(dir).collect().map(_.getString(0)).sorted
    val want = df.collect().map(_.getString(0)).sorted
    assert(got.sameElements(want))

    // overwrite truncates: second write with fewer rows leaves no stale data
    df.limit(10).repartition(1).write.mode("overwrite").format("graft-text").save(dir)
    assert(spark.read.text(dir).count() == 10)
  }

  test("CRLF input: trailing \\r is stripped (LineRecordReader parity)") {
    val dir = new java.io.File("/tmp/graft_linetext/crlf")
    rmrf(dir); dir.mkdirs()
    val w = new java.io.FileOutputStream(new java.io.File(dir, "a.txt"))
    w.write("alpha\r\nbeta\r\ngamma\r\n".getBytes("UTF-8")); w.close()
    val got = spark.read.format("graft-text").load(dir.toString)
      .collect().map(_.getString(0)).sorted
    assert(got.sameElements(Array("alpha", "beta", "gamma")),
      got.map(s => s.map(_.toInt).mkString("[", ",", "]")).mkString(" "))
  }

  test("append-mode writes never collide: final names are job-unique") {
    val dir = "/tmp/graft_linetext/appended"
    rmrf(new java.io.File(dir))
    val df = Tables.documents(spark, sf)
      .selectExpr("concat(doc_id, '#', lang) AS value").limit(20)
    df.repartition(2).write.mode("append").format("graft-text").save(dir)
    df.repartition(2).write.mode("append").format("graft-text").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("part-"))
    // two jobs x two tasks, all four files present (a partitionId-only
    // naming scheme would silently drop the second job's renames)
    assert(files.length == 4, files.mkString(","))
    assert(files.distinct.length == 4)
    assert(spark.read.text(dir).count() == 40)
  }

  test("contains/startsWith filters push into the connector scan") {
    val dir = "/tmp/graft_linetext/data"
    val df = spark.read.format("graft-text")
      .option("splitSize", "2048").load(dir)
      .filter(col("value").contains("|en|"))
    // the connector accepted the filter EXACTLY (empty residual), so the
    // optimizer removes the post-scan Filter node entirely...
    val hasFilter = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(hasFilter.isEmpty,
      s"filter not absorbed by the scan:\n${df.queryExecution.optimizedPlan}")
    // ...and the physical scan advertises it
    val scanStr = df.queryExecution.executedPlan.toString
    assert(scanStr.contains("StringContains"),
      s"pushed filter not visible on the physical scan:\n$scanStr")
    val want = spark.read.text(dir)
      .filter(col("value").contains("|en|")).count()
    assert(df.count() == want)
  }

  test("connector output feeds normal DataFrame ops") {
    val dir = "/tmp/graft_linetext/data"
    val parsed = spark.read.format("graft-text")
      .option("splitSize", "2048").load(dir)
      .selectExpr("split(value, '\\\\|') AS parts")
      .selectExpr("CAST(parts[0] AS BIGINT) AS doc_id", "parts[1] AS lang")
    val got = parsed.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val want = Tables.documents(spark, sf).groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.sameElements(want))
  }
}
