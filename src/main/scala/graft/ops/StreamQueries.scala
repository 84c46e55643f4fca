package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryDef
import graft.oracle.DuckSql
import graft.streaming.EventStream

/** Declared queries that execute through Structured Streaming itself —
  * not batch twins, the actual incremental engine: `readStream` over the
  * events fixture, `Trigger.AvailableNow` (process everything available,
  * then terminate — the batch-over-stream execution mode), memory sink,
  * and the materialized sink table is the returned result. That puts the
  * streaming runtime under the same bit-exact DuckDB oracle gate as
  * every batch query, instead of only under spec-level parity checks.
  *
  * The memory sink is the oracle-gate materialization only; production
  * streams sink via foreachBatch into bucketed tables
  * (EventStream.sinkToBucketedTable, asserted exchange-free in
  * BucketingSpec).
  */
object StreamQueries {

  private def moneySumSql(c: String) =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** Run a streaming DataFrame to completion (AvailableNow) into a
    * memory sink and return the sink table. `complete` mode re-emits
    * full aggregate state each trigger, so the final table equals the
    * batch result with no watermark-holdback of trailing windows. */
  private def runToTable(s: SparkSession, df: DataFrame, name: String,
      mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  val defs: Map[String, QueryDef] = Map(
    // Tumbling 1-hour aggregate computed BY the streaming engine;
    // identical output contract (and oracle) as q_window_tumbling.
    "q_stream_tumbling" -> QueryDef(
      (s, d) =>
        runToTable(s,
          EventStream.tumblingCountsEpoch(EventStream.readEvents(s, d)),
          "graft_stream_tumbling", "complete")
          .orderBy("window_start_epoch", "event_type"),
      s"""SELECT ${DuckSql.epochTrunc("hour", "ts")} AS window_start_epoch,
         |  event_type, count(*) AS n_events, ${moneySumSql("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Streaming dedup (one event per type per hour — throttling-style
    // dedup) run through dropDuplicates state. Output is the surviving
    // KEY SET, which is deterministic regardless of which arrival won
    // the race, so the oracle is a plain DISTINCT. No watermark here:
    // AvailableNow over a finite fixture needs none, and an eviction
    // horizon could admit a late duplicate and break key-set equality;
    // the unbounded-stream variant (dropDuplicates WITH watermark, state
    // ages out) is EventStream.dedupedEvents, spec-covered.
    "q_stream_dedup" -> QueryDef(
      (s, d) => {
        val keys = EventStream.readEvents(s, d)
          .select(col("event_type"),
            (unix_timestamp(date_trunc("hour", col("ts")))).as("hour_epoch"))
          .dropDuplicates("event_type", "hour_epoch")
        runToTable(s, keys, "graft_stream_dedup", "append")
          .orderBy("event_type", "hour_epoch")
      },
      s"""SELECT DISTINCT event_type,
         |  ${DuckSql.epochTrunc("hour", "ts")} AS hour_epoch
         |FROM events ORDER BY event_type, hour_epoch""".stripMargin)
  )
}
