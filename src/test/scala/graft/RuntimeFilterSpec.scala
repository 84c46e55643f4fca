package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filtering — the engine's two data-driven scan-pruning
  * mechanisms, the Spark rendition of the reference's runtime DAG
  * re-optimization surface (VertexManagerPlugin reconfiguring
  * downstream work from runtime stats,
  * tez-api/src/main/java/org/apache/tez/dag/api/VertexManagerPlugin.java:40):
  *
  *  - DYNAMIC PARTITION PRUNING: a join against a filtered dimension
  *    prunes the fact scan's PARTITIONS at runtime — the dim-side
  *    values are computed first and become a partition filter on the
  *    fact side, so a 100 TB date/priority-partitioned fact table reads
  *    only the matching directories, not everything.
  *  - RUNTIME BLOOM FILTER: for non-partition join keys, the selective
  *    side's keys are collected into a bloom filter that is pushed into
  *    the probe-side scan as a `might_contain` predicate — rows that
  *    cannot join die at the scan instead of traveling through the
  *    shuffle.
  *
  * Both assert the PLAN mechanism and bit-equal RESULTS vs the
  * unfiltered plan — pruning must never change the answer.
  */
class RuntimeFilterSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = "/tmp/graft_dpp/orders_by_priority"
    rmrf(new java.io.File(dir))
    Tables.orders(spark, sf).write.partitionBy("o_orderpriority").parquet(dir)

    // dim with a non-pushable-to-fact predicate on a DIFFERENT column,
    // so only DPP (not static predicate pushdown) can prune the scan
    val dim = spark.range(5)
      .selectExpr("concat(CAST(id + 1 AS STRING), '-X') AS dim_tag",
        s"element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), CAST(id + 1 AS INT)) AS o_orderpriority")
    val fact = spark.read.parquet(dir)
    val joined = fact.join(dim.filter(col("dim_tag") === "1-X"), "o_orderpriority")

    val n = joined.count()
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(n == expected, s"DPP join returned $n, expected $expected")

    val scans = collect(joined.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val factScan = scans.find(_.metadata.get("Location").exists(_.contains("graft_dpp")))
    assert(factScan.isDefined, "fact scan not found")
    assert(factScan.get.partitionFilters.mkString(",").contains("dynamicpruning"),
      s"no dynamic pruning filter on fact scan: ${factScan.get.partitionFilters}")
    // runtime metric: only 1 of 5 partition directories was read
    assert(factScan.get.metrics("numFiles").value <=
      spark.read.parquet(dir).inputFiles.length / 5 + 1,
      "DPP should have pruned to ~1/5 of the files")
  }

  test("runtime bloom filter: selective build side prunes probe scan rows") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      // selective orders side (high-value only) joined to lineitem on a
      // NON-partition key: the optimizer builds a bloom filter from the
      // orders keys and injects might_contain(l_orderkey) above the
      // lineitem scan
      val hot = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey")
      val joined = Tables.lineitem(spark, sf)
        .join(hot, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))

      val planStr = joined.queryExecution.optimizedPlan.toString
      assert(planStr.contains("might_contain"),
        s"no runtime bloom filter injected:\n$planStr")

      // results are identical with the rule disabled
      val withFilter = joined.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val without = Tables.lineitem(spark, sf)
          .join(hot, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).sorted
        assert(withFilter.sameElements(without),
          "bloom-filtered join changed the result")
      }
    }
  }
}
