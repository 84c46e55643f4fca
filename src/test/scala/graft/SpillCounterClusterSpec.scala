package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.TaskCounters

/** Spill-counter parity under a REAL forced spill — the
  * SPILLED_RECORDS / ADDITIONAL_SPILLS_BYTES_WRITTEN half of the
  * reference's TaskCounter surface (tez-api/.../counters/
  * TaskCounter.java:26-140; its SpillAnalyzerImpl reads exactly these).
  * `spark.shuffle.spill.numElementsForceSpillThreshold` is static per
  * SparkContext, so this suite owns its JVM (the *ClusterSpec test
  * group) and pins the threshold to 1000 elements: a 200k-row global
  * sort then MUST overflow its in-memory sorter many times, spilling to
  * both tiers. Asserts: both spill counters move, the shuffle byte/
  * record counters are self-consistent (local-mode fetch reads exactly
  * what the map side wrote; records conserved across the boundary), and
  * the sorted result is bit-identical to the in-memory answer — spills
  * must never change results, only memory residency.
  */
class SpillCounterClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-counters")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "1000")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    TaskCounters.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("forced spill moves both spill counters and never changes the result") {
    import spark.implicits._
    TaskCounters.reset()
    val n = 200000
    // keys descend so the sort genuinely reorders; payload pads each
    // row so spilled bytes are non-trivial
    val df = spark.range(n).select(
      ((org.apache.spark.sql.functions.lit(n) - $"id") % 9973).as("k"),
      org.apache.spark.sql.functions.concat_ws("_",
        org.apache.spark.sql.functions.lit("x" * 64), $"id").as("payload"))
    val sorted = df.orderBy("k", "payload").collect()
    val c = TaskCounters.snapshot()

    assert(sorted.length == n)
    val resorted = sorted.map(r => (r.getLong(0), r.getString(1)))
    assert(resorted.sameElements(resorted.sorted),
      "forced spill produced an out-of-order result")

    assert(c.memorySpilledBytes > 0,
      s"no in-memory spill recorded (SPILLED_RECORDS parity): $c")
    assert(c.diskSpilledBytes > 0,
      s"no disk spill recorded (ADDITIONAL_SPILLS_BYTES_WRITTEN parity): $c")
    // conservation across the shuffle boundary (local mode: every fetch
    // is a local-disk read — the SHUFFLE_BYTES_DISK_DIRECT path)
    assert(c.shuffleRecordsWritten == n.toLong &&
      c.shuffleRecordsRead == n.toLong,
      s"shuffle records not conserved: $c")
    assert(c.shuffleLocalBytes == c.shuffleBytesWritten,
      s"local fetch bytes != bytes written: $c")
    assert(c.shuffleRemoteBytes == 0L, s"remote fetch in local mode: $c")
    assert(c.peakExecutionMemory > 0 && c.tasks > 0)
  }
}
