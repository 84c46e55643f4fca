package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full sort-merge-bucket story: bucketed AND sorted tables with
  * exactly one file per bucket join with ZERO exchanges and ZERO sorts
  * — the read side consumes the write-time layout end to end. This is
  * the strongest form of the reference's reusable-edge idea (keep both
  * sides of a recurring join partitioned AND ordered so the runtime
  * does no data movement at all); Spark gates the sorted-scan property
  * behind `spark.sql.legacy.bucketedTableScan.outputOrdering` because
  * it only holds with one file per bucket — which the writer guarantees
  * here by pre-partitioning on the bucket key (repartition(n, key) uses
  * the same murmur-hash pmod as the bucket router, so each task holds
  * exactly one bucket's rows).
  */
class SortedBucketSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("one-file-per-bucket sorted tables join with no exchange and no sort") {
    Seq("orders_sb", "customer_sb").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    // pre-partition on the bucket key so each task writes exactly its
    // own bucket → one file per bucket → scan can claim the sort order
    Tables.orders(spark, sf).repartition(8, col("o_custkey"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("orders_sb")
    Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
      .repartition(8, col("o_custkey"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("customer_sb")

    (0 until 8).foreach { _ => () } // (buckets fixed at 8 below)
    Seq("orders_sb", "customer_sb").foreach { t =>
      val files = new java.io.File(s"/tmp/graft_warehouse/$t")
        .listFiles().count(f => f.getName.endsWith(".parquet"))
      assert(files == 8, s"$t: expected 1 file per bucket (8), got $files")
    }

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = spark.table("orders_sb")
        .join(spark.table("customer_sb"), "o_custkey")
      joined.collect()
      val nodes = collect(joined.queryExecution.executedPlan) { case p => p.nodeName }
      assert(nodes.exists(_.contains("SortMergeJoin")), nodes.mkString(","))
      assert(!nodes.exists(_.contains("ShuffleExchange")),
        s"sorted-bucket join must not shuffle: ${nodes.mkString(",")}")
      assert(!nodes.exists(_ == "Sort"),
        s"sorted-bucket join must not re-sort: ${nodes.mkString(",")}")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
