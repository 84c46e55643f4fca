package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the runtime half of the skew story
  * (FairShuffleEdgeManager parity, SURVEY.md §2e): graft.ops.SkewJoin
  * covers WRITE-TIME salting; this asserts the engine's RUNTIME path,
  * where the optimizer detects an oversized post-shuffle partition at
  * the sort-merge join and splits it into parallel sub-partitions
  * (replicating the matching build rows) with no query rewrite at all.
  */
class SkewAqeSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the fixture's hot key trips the detector
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key: ~70% of lineitem rows collapse onto join key 1. The
      // round-robin repartition gives the join shuffle MANY map tasks —
      // AQE splits a skewed reduce partition at map-output granularity,
      // so a single-mapper stage (one fixture file → one scan task)
      // would leave nothing to split
      val skewed = Tables.lineitem(spark, sf)
        .repartition(16)
        .select(expr("CASE WHEN l_orderkey % 10 < 7 THEN 1 ELSE l_orderkey END")
          .as("jk"), col("l_extendedprice"))
      val dim = Tables.orders(spark, sf)
        .select(col("o_orderkey").as("jk"), col("o_orderpriority"))
      val joined = skewed.join(dim, "jk")

      // collect() executes THIS DataFrame's queryExecution (count()
      // would build and run a different plan), finalizing the AQE plan
      val rows = joined.collect()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"no skew-split SMJ in the adaptive plan:\n$planStr")

      // splitting must not change the result
      val expected = {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        skewed.join(dim, "jk").count()
      }
      assert(rows.length.toLong == expected,
        s"skew-split join returned ${rows.length}, plain join $expected")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
