package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.GraftMetrics
import graft.ops.Narrow

/** ONE_TO_ONE narrow-dependency semantics (no shuffle) + counters. */
class NarrowSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("mapPartitions chain stays in one stage (no Exchange)") {
    val ds = spark.range(0, 1000).as[Long]
    val chained = Narrow.chain[Long](ds, Seq(
      it => it.map(_ * 2),
      it => it.filter(_ % 3 == 0),
      it => it.map(_ + 1)))
    assert(Narrow.isShuffleFree(chained.toDF()))
    val got = chained.collect().sorted
    val want = (0L until 1000L).map(_ * 2).filter(_ % 3 == 0).map(_ + 1).sorted
    assert(got.sameElements(want))
  }

  test("zipPartitions pairs task i with task i (ONE_TO_ONE routing)") {
    val left = spark.sparkContext.parallelize(0 until 100, 8)
    val right = spark.sparkContext.parallelize(100 until 200, 8)
    val both = Narrow.oneToOne(left, right) { (a, b) => a.zip(b) }
    val rows = both.collect()
    assert(rows.length == 100)
    // parallelize splits ranges contiguously → pairs align index-by-index
    assert(rows.forall { case (a, b) => b - a == 100 })
  }

  test("partition-count mismatch is rejected") {
    val left = spark.sparkContext.parallelize(0 until 10, 2)
    val right = spark.sparkContext.parallelize(0 until 10, 3)
    intercept[IllegalArgumentException] {
      Narrow.oneToOne(left, right)((a, _) => a)
    }
  }
}

class MetricsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("listener captures per-query output rows (TaskCounter parity)") {
    GraftMetrics.register(spark)
    GraftMetrics.clear()
    Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n")).collect()
    // listener delivery is async; poll briefly
    var tries = 0
    while (GraftMetrics.snapshot().isEmpty && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val recs = GraftMetrics.snapshot()
    assert(recs.nonEmpty, "expected at least one query record")
    assert(recs.exists(_.outputRows > 0))
    assert(recs.exists(_.durationNs > 0))
  }
}
