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

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

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

  test("rate-source soak through the foreachBatch bucketed sink joins exchange-free") {
    spark.sql("DROP TABLE IF EXISTS rate_events_b")
    rmrf(new java.io.File("/tmp/graft_warehouse/rate_events_b"))
    // unbounded ingest: EACH micro-batch appends in the bucket layout, so
    // the accumulated table (many files per bucket) still serves
    // shuffle-free keyed reads — the continuous-ingest half of the
    // BucketingSpec fixture test
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 2000).load()
      .select((col("value") % 64).as("user_id"), col("value"), col("timestamp"))
    val q = graft.streaming.EventStream
      .sinkToBucketedTable(rate, "rate_events_b", "user_id", 8)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (q.recentProgress.count(_.numInputRows > 0) < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"wanted >=3 non-empty micro-batches, got ${q.recentProgress.length}")
    } finally q.stop()

    val t = spark.table("rate_events_b")
    val n = t.count()
    assert(n > 0)
    // every rate value is unique: append-per-batch must not double-write
    assert(t.select("value").distinct().count() == n)
    // keyed aggregation over the multi-append bucketed table: no shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = t.groupBy("user_id").agg(count(lit(1)).as("n"))
      agg.collect()
      val aggNodes = agg.queryExecution.executedPlan.toString
      assert(!aggNodes.contains("ShuffleExchange"),
        s"bucket-key agg must not shuffle: ${aggNodes.take(500)}")
      val joined = t.join(spark.table("rate_events_b").groupBy("user_id")
        .agg(max("value").as("mx")), "user_id")
      joined.collect()
      val joinNodes = joined.queryExecution.executedPlan.toString
      assert(!joinNodes.contains("ShuffleExchange"),
        s"bucket-key join must not shuffle: ${joinNodes.take(500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rate-source soak through the group-committed sink stays all-or-nothing") {
    // a REAL unbounded source (not a file replay) through
    // EventStream.sinkToGroupCommitted, stopped mid-flight: after
    // recover(), every published batch must be a complete 3-sink group,
    // no pending manifests, and no row lost or duplicated (rate values
    // are unique).
    val base = java.nio.file.Files.createTempDirectory("graft_gc_rate")
      .toFile.getPath
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 2000).load()
      .select(col("value").as("event_id"), col("timestamp").as("ts"),
        (col("value") % 64).as("user_id"),
        when(col("value") % 4 === 0, "purchase").otherwise("view")
          .as("event_type"),
        (col("value") % 100).cast("double").as("value"))
    val q = graft.streaming.EventStream.sinkToGroupCommitted(rate, base)
    // COMMITTED batch dirs only: `.__staging__` names are invisible by
    // the GroupCommit contract (a stop/crash legitimately orphans one)
    def ids(sub: String): Set[String] = {
      val d = new java.io.File(s"$base/$sub")
      if (!d.isDirectory) Set.empty
      else d.listFiles().filter(_.isDirectory).map(_.getName)
        .filter(n => n.startsWith("batch_") && !n.contains(".__staging__"))
        .toSet
    }
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (ids("stats").size < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(ids("stats").size >= 2,
        "fewer than 2 group-committed batches within the deadline")
    } finally q.stop()
    graft.sources.GroupCommit.recover(spark, base)
    val (pIds, oIds, sIds) = (ids("purchases"), ids("others"), ids("stats"))
    assert(pIds == oIds && oIds == sIds,
      s"partial group visible: purchases=$pIds others=$oIds stats=$sIds")
    assert(pIds.nonEmpty)
    // nothing left pending
    val pending = new java.io.File(s"$base/_group_commits")
    assert(!pending.isDirectory || pending.listFiles().isEmpty,
      "pending group-commit manifests remain after recover()")

    // no loss, no duplication across the published groups
    val paths = pIds.map(b => s"$base/purchases/$b").toSeq ++
      oIds.map(b => s"$base/others/$b").toSeq
    val rows = spark.read.parquet(paths: _*)
    val total = rows.count()
    assert(total > 0)
    assert(rows.select("event_id").distinct().count() == total,
      "duplicate event_ids across published groups")
    // the committed batches are a contiguous prefix of the rate stream:
    // ids are 0..total-1 exactly (a gap would mean a lost batch)
    assert(rows.agg(max("event_id")).collect()(0).getLong(0) == total - 1,
      "gap in committed event_ids — a published batch is missing rows")
    // stats sinks agree with the row sinks per event type
    val stats = spark.read.parquet(sIds.map(b => s"$base/stats/$b").toSeq: _*)
      .groupBy("event_type").agg(sum("n_events").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rows.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == want, s"stats $stats vs rows $want")
  }
}
