package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime join-strategy conversion — the §2e runtime-replan story
  * in its purest form (ShuffleVertexManager reconfigures downstream
  * work from observed source stats; AQE replaces the planned join
  * algorithm from observed shuffle sizes): the STATIC plan chooses a
  * sort-merge join (static broadcasting disabled, mirroring a
  * compile-time size estimate too large to broadcast), then the
  * materialized shuffle reveals a small build side and the FINAL
  * adaptive plan runs a broadcast join — no query change, no hints.
  */
class AqeBroadcastSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  test("AQE converts the planned sort-merge join to broadcast from runtime sizes") {
    val confs = Seq(
      // static planner may NOT broadcast; AQE may, from runtime stats
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val smallAtRuntime = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val joined = Tables.lineitem(spark, sf)
        .join(smallAtRuntime, col("l_orderkey") === col("o_orderkey"))

      val rows = joined.collect()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("== Initial Plan =="), planStr.take(500))
      val finalPart = planStr.substring(0, planStr.indexOf("== Initial Plan =="))
      val initialPart = planStr.substring(planStr.indexOf("== Initial Plan =="))
      assert(initialPart.contains("SortMergeJoin"),
        s"static plan should be SMJ:\n$initialPart")
      assert(finalPart.contains("BroadcastHashJoin"),
        s"final adaptive plan should have converted to broadcast:\n$finalPart")

      // conversion must not change the result
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val expected = Tables.lineitem(spark, sf)
        .join(smallAtRuntime, col("l_orderkey") === col("o_orderkey")).count()
      assert(rows.length.toLong == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
