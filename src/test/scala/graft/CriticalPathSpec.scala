package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-query critical-path chain (StageAnalyzer.criticalPaths —
  * CriticalPathAnalyzer parity). Key property under AQE: every
  * materialized query stage runs as its OWN job, so the chain must be
  * stitched across jobs via StageInfo.parentIds — a per-job view
  * would report chain=1 for every query (the r06 first-cut bug this
  * spec pins).
  */
class CriticalPathSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a shuffle agg query chains at least scan->final across AQE jobs") {
    val analyzer = new metrics.StageAnalyzer
    spark.sparkContext.addSparkListener(analyzer)
    try {
      analyzer.setLabel("cp_probe")
      Tables.lineitem(spark, sf)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
        .collect()
      analyzer.setLabel("_untracked")
      // listener bus is async
      val deadline = System.currentTimeMillis() + 10000
      var cp = analyzer.criticalPaths().get("cp_probe")
      while (cp.forall(_._2 < 2) && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        cp = analyzer.criticalPaths().get("cp_probe")
      }
      val (secs, chain, jobs) = cp.get
      assert(chain >= 2,
        s"shuffle agg must chain map->reduce stages, got chain=$chain " +
          s"(jobs=$jobs) — per-job flattening regression")
      assert(secs > 0.0)
      assert(jobs >= 1)
    } finally spark.sparkContext.removeSparkListener(analyzer)
  }
}
