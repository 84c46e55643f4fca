package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Split grouping (TezSplitGrouper parity — SURVEY §2a "untested knob"
  * rows): Tez groups raw splits to a task count bounded by 50 MB–1 GB
  * per task (tez-mapreduce/src/main/java/org/apache/tez/mapreduce/grouper/TezSplitGrouper.java:72-85);
  * Spark's FilePartition packing is governed by
  * `spark.sql.files.maxPartitionBytes` + `openCostInBytes`. This spec
  * drives the knob both ways over a multi-file table and asserts (a) the
  * planned task count responds — smaller cap → more partitions, larger
  * cap → files packed together — and (b) results are identical under
  * every grouping, which is the actual TezSplitGrouper contract
  * (grouping is an execution-cost decision, never a semantics one).
  */
class SplitGrouperSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("maxPartitionBytes regroups file splits without changing results") {
    // a many-small-files table, so packing has something to pack
    val dir = new java.io.File("/tmp/graft_split_grouper")
    rmrf(dir)
    Tables.lineitem(spark, sf).repartition(16)
      .write.parquet(dir.getPath)

    def scanPartitions(maxBytes: String): (Int, Long) = {
      val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
        // openCost pads each file; pin it small so maxBytes dominates
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        val df = spark.read.parquet(dir.getPath)
        val scan = collectWithSubqueries(df.queryExecution.executedPlan) {
          case s: FileSourceScanExec => s
        }.head
        (scan.inputRDD.getNumPartitions, df.count())
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
        spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
      }
    }

    val (fine, nFine) = scanPartitions("16384") // 16 KB cap: splits stay apart
    val (coarse, nCoarse) = scanPartitions("1073741824") // 1 GB cap: packed
    assert(fine > coarse,
      s"16KB cap should plan more tasks than 1GB cap: $fine vs $coarse")
    assert(coarse < 16, s"1GB cap should pack the 16 files, got $coarse")
    assert(nFine == nCoarse && nFine == Tables.lineitem(spark, sf).count(),
      "grouping must never change results")
  }
}
