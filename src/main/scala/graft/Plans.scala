package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Plan auditor: executes every declared query on a small SF and prints a
  * one-line physical summary — shuffle/sort/join node counts and scan
  * column width — the ".explain and iterate" loop (SURVEY.md §7) made
  * repeatable. Run: `sbt "runMain graft.Plans [sfDir]"`. */
object Plans extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan
        val nodes = collect(plan) { case p => p.nodeName }
        def n(sub: String) = nodes.count(_.contains(sub))
        val joins = nodes.filter(_.contains("Join")).distinct.mkString("+")
        val scans = collect(plan) {
          case p if p.nodeName.contains("Scan") => p.schema.fields.length
        }
        println(f"$name%-24s exchanges=${n("Exchange")} sorts=${n("Sort")} " +
          f"aggs=${n("Aggregate")} scanCols=${scans.mkString(",")} " +
          (if (joins.nonEmpty) s"joins=$joins" else ""))
      } catch {
        case e: Throwable => println(s"$name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
