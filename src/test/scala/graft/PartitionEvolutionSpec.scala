package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Physical evidence for q_partition_evolution's claim: under a layout
  * change (epoch 1 by year, epoch 2 by (year, returnflag)) the union
  * read PRUNES DIRECTORIES per-epoch — a year filter collapses both
  * epochs' scans to that year's files, and a returnflag filter
  * additionally collapses the epoch-2 scan to one flag directory while
  * epoch 1 (which never encoded the flag in its layout) correctly
  * falls back to row-level parquet filtering. The reference analog is
  * split pruning at DAG build (TezSplitGrouper feeds only matching
  * splits): partition directories ARE the split universe here, and
  * evolution must not cost old data its correctness nor new data its
  * skipping.
  */
class PartitionEvolutionSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private val root = "/tmp/graft_pevo_spec"

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    df.collect() // materialize so AQE finalizes the plan
    collect(df.queryExecution.executedPlan) { case s: FileSourceScanExec => s }
  }

  test("per-epoch directory pruning under the evolved layout") {
    val s = spark
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val li = Tables.lineitem(s, sf).selectExpr(
      "year(l_shipdate) AS y", "l_returnflag",
      "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents")
    li.filter(col("y") < 1999)
      .write.mode("overwrite").partitionBy("y").parquet(s"$root/epoch1")
    li.filter(col("y") >= 1999)
      .write.mode("overwrite").partitionBy("y", "l_returnflag")
      .parquet(s"$root/epoch2")
    val e1 = s.read.parquet(s"$root/epoch1")
    val e2 = s.read.parquet(s"$root/epoch2")
    val evolved = e1.unionByName(e2)

    // Baseline: unfiltered read touches every partition directory.
    val allFiles = scans(evolved).map(_.metrics("numFiles").value).sum
    assert(allFiles >= 2, "expected multiple partition files")

    // A year filter inside epoch 2's range prunes epoch 1 to ZERO
    // files and epoch 2 to that year's directories only.
    val y2000 = evolved.filter(col("y") === 2000)
    val files2000 = scans(y2000).map(_.metrics("numFiles").value).sum
    val expect2000 =
      fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$root/epoch2/y=2000/*/part-*")).length
    assert(files2000 == expect2000,
      s"year filter read $files2000 files, want epoch-2 y=2000's $expect2000")

    // A flag filter prunes DIRECTORIES in epoch 2 (only l_returnflag=R
    // subdirs are listed) but must NOT drop epoch-1 rows, where the
    // flag is a data column: equality with the raw fixture proves it.
    val flagged = evolved.filter(col("l_returnflag") === "R")
    val epoch2Scan = scans(flagged).find(
      _.metadata.get("Location").exists(_.contains("epoch2"))).get
    val epoch2R = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$root/epoch2/y=*/l_returnflag=R/part-*")).length
    assert(epoch2Scan.metrics("numFiles").value == epoch2R,
      "epoch-2 scan did not prune to the R directories")
    val want = Tables.lineitem(s, sf).filter(col("l_returnflag") === "R").count()
    assert(flagged.count() == want, "evolved union lost rows under flag filter")
  }
}
