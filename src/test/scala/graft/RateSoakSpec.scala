package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unbounded-ingest soak surface (SURVEY §8 round-4 item 5): the rate
  * source drives the windowed-aggregation path with the RocksDB state
  * store provider — the configuration an unbounded corpus ingest runs
  * with at scale, where the default heap-backed provider caps state at
  * executor memory while RocksDB spills keyed state to local disk and
  * bounds recovery via changelog/snapshot files.
  */
class RateSoakSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rate-source windowed agg runs stateful batches on RocksDB") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", 500).load() // (timestamp, value)
      val agg = rate
        .withWatermark("timestamp", "0 seconds")
        .groupBy(window(col("timestamp"), "1 second"),
          (col("value") % 10).as("k"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
      val q = agg.writeStream.format("memory").queryName("soak_out")
        .outputMode("update").start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("soak_out").isEmpty &&
          System.currentTimeMillis() < deadline) Thread.sleep(250)
        assert(!spark.table("soak_out").isEmpty,
          "no micro-batch produced windowed output within the deadline")
        // provider evidence: the state operator must report RocksDB
        // custom metrics (the heap provider reports none of these)
        val rocksMetrics = q.recentProgress
          .flatMap(_.stateOperators)
          .flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
          .filter(_.toLowerCase.contains("rocksdb"))
        assert(rocksMetrics.nonEmpty,
          "state operator exposes no rocksdb* metrics — provider not engaged")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
