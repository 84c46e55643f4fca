package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing
import graft.streaming.EventStream

/** Co-located bucketed joins: zero exchanges on the bucket key. */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("join of bucketed tables runs without a shuffle exchange") {
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist — clear both before writing
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sf), "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(
      Tables.customer(spark, sf)
        .withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey")
      joined.collect()
      val nodes = collect(joined.queryExecution.executedPlan) { case p => p.nodeName }
      assert(nodes.exists(_.contains("SortMergeJoin")), nodes.mkString(","))
      assert(!nodes.exists(_.contains("ShuffleExchange")),
        s"bucketed join must not shuffle: ${nodes.mkString(",")}")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("foreachBatch sink lands a bucketed table with exchange-free follow-up joins") {
    spark.sql("DROP TABLE IF EXISTS events_b")
    rmrf(new java.io.File("/tmp/graft_warehouse/events_b"))
    val q = EventStream.sinkToBucketedTable(
      EventStream.readEvents(spark, sf), "events_b", "user_id", 8)
    try q.processAllAvailable() finally q.stop()

    assert(spark.table("events_b").count() == Tables.events(spark, sf).count())

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // per-user totals joined back to the bucketed events: BOTH the
      // aggregation and the join ride the bucket distribution — the plan
      // must contain no shuffle exchange at all
      val totals = spark.table("events_b").groupBy("user_id")
        .agg(org.apache.spark.sql.functions.sum("value").as("total"))
      val joined = spark.table("events_b").join(totals, "user_id")
      joined.collect()
      val nodes = collect(joined.queryExecution.executedPlan) { case p => p.nodeName }
      assert(!nodes.exists(_.contains("ShuffleExchange")),
        s"bucketed ingest must make downstream agg+join shuffle-free: ${nodes.mkString(",")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stream-stream interval join matches the batch range join") {
    val q = EventStream.purchaseFollowUps(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("followups_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("followups_out")
      .select("user_id", "purchase_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = SparkEntry.queries("q_range_join")(spark, sf)
      .select("user_id", "purchase_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.sameElements(batch))
  }

  test("streaming dedup within watermark preserves distinct events") {
    val q = EventStream.dedupedEvents(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("dedup_out").count()
    // fixture event_ids are unique → dedup is lossless there
    assert(n == Tables.events(spark, sf).count())
  }
}
