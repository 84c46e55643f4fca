package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Broadcast-threshold edges — the engine-side answer to the
  * reference's broadcast stress harness
  * (`tez-tests/src/main/java/org/apache/tez/mapreduce/examples/BroadcastLoadGen.java`:
  * a generator that pushes UnorderedKV BROADCAST edges to their memory
  * limits). Tez ships every broadcast regardless of size and the task
  * either fits it or dies; Spark's planner instead SIZES the decision:
  * a side is broadcast only under `autoBroadcastJoinThreshold`, and the
  * same join text downgrades to a shuffle join when the "small" side
  * isn't small — the property that keeps a 100 TB dim-join from
  * OOMing every executor. This spec pins that downgrade in both
  * directions plus the -1 kill switch.
  */
class BroadcastThresholdSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def joinPlan() = {
    val df = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    df.collect()
    df
  }
  private def broadcasts(df: org.apache.spark.sql.DataFrame): Seq[String] =
    collect(df.queryExecution.executedPlan) {
      case p if p.nodeName.contains("BroadcastExchange") => p.nodeName
    }
  private def withThreshold[A](v: String)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      // AQE has its own runtime threshold that would re-upgrade the
      // join from materialized stats — pin both for the downgrade test
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
      f
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(p) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", p)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("under the threshold the dim side broadcasts") {
    val bs = withThreshold("10485760")(broadcasts(joinPlan()))
    assert(bs.nonEmpty, "expected a broadcast under a 10MB threshold")
  }

  test("over the threshold the SAME join downgrades to a shuffle join") {
    val bs = withThreshold("1024")(broadcasts(joinPlan()))
    assert(bs.isEmpty,
      s"a >1KB side must not broadcast (would OOM at scale): $bs")
  }

  test("threshold -1 disables broadcasting outright (the kill switch)") {
    val bs = withThreshold("-1")(broadcasts(joinPlan()))
    assert(bs.isEmpty, bs.mkString(","))
  }

  test("rows are identical whichever strategy the threshold picks") {
    val a = withThreshold("10485760")(joinPlan().collect().sortBy(_.toString))
    val b = withThreshold("-1")(joinPlan().collect().sortBy(_.toString))
    assert(a.sameElements(b))
  }
}
