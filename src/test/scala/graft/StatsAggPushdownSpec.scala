package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level evidence for q_stats_only_agg: with
  * spark.sql.parquet.aggregatePushdown on (NOTE the Spark 4 key is
  * lower-case `Pushdown`; the Spark 3.x `PushDown` spelling is a
  * silently-ignored no-op key — asserting on the PLAN here is exactly
  * what catches that class of mistake) and parquet served by the DSv2
  * scan, an unfiltered ungrouped COUNT/MIN/MAX is answered from
  * row-group FOOTER STATISTICS — the executed plan carries a
  * PushedAggregation clause and each task emits one pre-aggregated row
  * per split instead of scanning rows. The reference-side analog is a
  * scan whose InputFormat serves metadata instead of records; at
  * 100 TB the difference is a metadata sweep vs a full read.
  */
class StatsAggPushdownSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private val kPush = "spark.sql.parquet.aggregatePushdown"
  private val kV1 = "spark.sql.sources.useV1SourceList"

  private def withConfs[T](f: => T): T = {
    val prevPush = spark.conf.getOption(kPush)
    val prevV1 = spark.conf.getOption(kV1)
    spark.conf.set(kPush, "true")
    spark.conf.set(kV1, "avro,csv,json,kafka,orc,text")
    try f
    finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore(kPush, prevPush)
      restore(kV1, prevV1)
    }
  }

  test("COUNT/MIN/MAX pushes into the parquet scan and stays exact") {
    val (gotRow, planStr) = withConfs {
      val df = Tables.lineitem(spark, sf).agg(
        count(lit(1)).as("n_rows"),
        min("l_orderkey").as("min_key"),
        max("l_orderkey").as("max_key"))
      val row = df.collect()(0)
      (row, df.queryExecution.executedPlan.toString)
    }
    assert(planStr.contains(
      "PushedAggregation: [COUNT(*), MIN(l_orderkey), MAX(l_orderkey)]"),
      s"aggregate was not pushed into the scan:\n${planStr.take(600)}")
    val want = Tables.lineitem(spark, sf).agg(
      count(lit(1)), min("l_orderkey"), max("l_orderkey")).collect()(0)
    assert(gotRow == want, "pushed-down stats diverge from the row-read aggregate")
  }

  test("declared q_stats_only_agg restores session confs after running") {
    val beforePush = spark.conf.getOption(kPush)
    val beforeV1 = spark.conf.getOption(kV1)
    val out = SparkEntry.queries("q_stats_only_agg")(spark, sf).collect()
    assert(out.length == 1 && out(0).getLong(0) > 0)
    assert(spark.conf.getOption(kPush) == beforePush, "pushdown conf leaked")
    assert(spark.conf.getOption(kV1) == beforeV1, "useV1SourceList conf leaked")
  }
}
