package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exchange reuse — when one logical subplan feeds a plan twice (the
  * self-join-of-an-aggregate shape: compare each group to the global
  * distribution, join a rollup to itself, etc.), Spark plans ONE
  * shuffle and wires the second consumer to it (ReusedExchange /
  * reused query stage under AQE). The reference analog is a shared
  * vertex output consumed by two downstream vertices instead of
  * running the producer twice. At 100 TB this halves the dominant
  * cost of every "metric vs its own aggregate" query, and it only
  * happens when both sides are literally the same plan — which is why
  * the queries in graft.ops build shared frames once (ScratchCache)
  * instead of re-deriving them per branch.
  */
class ReuseExchangeSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  test("self-join of one aggregate reuses the shuffle") {
    val agg = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
    val left = agg.select(col("l_returnflag").as("f1"), col("n").as("n1"))
    val right = agg.select(col("l_returnflag").as("f2"), col("n").as("n2"))
    val joined = left.join(right, col("f1") === col("f2"))
    assert(joined.collect().nonEmpty) // materialize THIS frame: its own
    // QueryExecution must finalize (count() would plan a different one)
    // Structural assertion (not a toString match, which is brittle
    // across Spark/AQE renderings): AdaptiveSparkPlanHelper.collect
    // descends through adaptive plans and query stages.
    val reused = collect(joined.queryExecution.executedPlan) {
      case r: ReusedExchangeExec => r
    }
    assert(reused.nonEmpty,
      "expected a ReusedExchangeExec node in:\n" +
        joined.queryExecution.executedPlan.toString.take(800))
  }
}
