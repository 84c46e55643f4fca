package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table/column statistics driving the cost-based optimizer — the Spark
  * rendition of the stats-driven compilation the reference's SQL
  * frontend performs (Hive collects table/column stats and sizes its
  * Tez DAGs — join algorithm choice, parallelism — from them; the DAG
  * API itself is stats-blind). Spark's form: ANALYZE TABLE persists
  * row counts + per-column NDV/min/max into the catalog, and with CBO
  * enabled the optimizer propagates them through filters/joins instead
  * of assuming file-size heuristics.
  */
class CboStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("ANALYZE TABLE feeds exact rowCount and column NDV into plan stats") {
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist — clear both before writing
    spark.sql("DROP TABLE IF EXISTS customer_stats")
    rmrf(new java.io.File("/tmp/graft_warehouse/customer_stats"))
    Tables.customer(spark, sf).write.mode("overwrite")
      .saveAsTable("customer_stats")
    spark.sql("ANALYZE TABLE customer_stats COMPUTE STATISTICS FOR ALL COLUMNS")

    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val actual = spark.table("customer_stats").count()

      // exact row count from the catalog, not a size guess
      val full = spark.table("customer_stats")
      assert(full.queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(actual)),
        s"rowCount stat missing/wrong: ${full.queryExecution.optimizedPlan.stats}")

      // per-column stats present (NDV for the key column)
      val attrStats = full.queryExecution.optimizedPlan.stats.attributeStats
      val keyStat = attrStats.find(_._1.name == "c_custkey").map(_._2)
      assert(keyStat.exists(_.distinctCount.isDefined),
        s"no NDV for c_custkey: $attrStats")

      // selectivity: a 1-of-5-segments filter estimate must shrink the
      // rowCount to well under the table count (CBO uses the column NDV)
      val filtered = full.filter(col("c_mktsegment") === "BUILDING")
      val est = filtered.queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined && est.get < BigInt(actual / 2),
        s"filter selectivity not estimated from stats: $est of $actual")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }
}
