package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.oracle.DuckSql
import graft.{QueryDef, Tables}

/** Event-time windowing + JSON extraction over the `events` table.
  *
  * Tez is batch-only (SURVEY.md §1 — "pipelined shuffle" is not stream
  * processing); these are the extension operators a pipeline needs for
  * event streams, expressed as batch queries here and as Structured
  * Streaming in graft.streaming.EventStream (same window semantics,
  * `readStream` + watermark).
  *
  * Oracle-parity note: `events.ts` is NANOSECOND precision in parquet.
  * Spark truncates to microseconds on read; DuckDB keeps ns. Every
  * declared output therefore goes through whole-second epoch values
  * (BIGINT) so both engines agree exactly; window membership at 30-min
  * boundaries is unaffected by sub-second truncation.
  */
object EventQueries {

  private def moneySumSql(c: String) =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  val defs: Map[String, QueryDef] = Map(
    // Tumbling 1-hour window via Spark's native window() operator.
    "q_window_tumbling" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
          .select(
            unix_timestamp(col("window.start")).as("window_start_epoch"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("window_start_epoch", "event_type"),
      s"""SELECT ${DuckSql.epochTrunc("hour", "ts")} AS window_start_epoch,
         |  event_type, count(*) AS n_events, ${moneySumSql("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Sliding 1-hour window, 30-minute slide (each event in 2 windows).
    "q_window_sliding" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
          .select(
            unix_timestamp(col("window.start")).as("window_start_epoch"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("window_start_epoch", "event_type"),
      s"""WITH e AS (SELECT ${DuckSql.epochSec("ts")} AS es, event_type, value FROM events),
         |w AS (
         |  SELECT ((es // 1800) * 1800) AS ws, event_type, value FROM e
         |  UNION ALL
         |  SELECT ((es // 1800) * 1800 - 1800) AS ws, event_type, value FROM e
         |)
         |SELECT ws AS window_start_epoch, event_type,
         |  count(*) AS n_events, ${moneySumSql("value")} AS sum_value
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Sessionization: per-user sessions split on >30-minute gaps
    // (lag + running sum of session-break flags — one shuffle on user_id).
    "q_window_session" -> QueryDef(
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("es")
        Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
            col("value"))
          .withColumn("prev_es", lag("es", 1).over(byUser))
          .withColumn("is_new",
            when(col("prev_es").isNull || col("es") - col("prev_es") > 1800, 1)
              .otherwise(0))
          .withColumn("session_seq", sum("is_new").over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_seq")
          .agg(
            min("es").as("session_start_epoch"),
            max("es").minus(min("es")).cast(LongType).as("duration_sec"),
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
          .select("user_id", "session_start_epoch", "duration_sec", "n_events", "sum_value")
          .orderBy("user_id", "session_start_epoch")
      },
      s"""WITH e AS (SELECT user_id, ${DuckSql.epochSec("ts")} AS es, value FROM events),
         |flagged AS (
         |  SELECT user_id, es, value,
         |    CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
         |           OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e
         |),
         |sess AS (
         |  SELECT user_id, es, value,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY es
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         |  FROM flagged
         |)
         |SELECT user_id, min(es) AS session_start_epoch,
         |  CAST(max(es) - min(es) AS BIGINT) AS duration_sec,
         |  count(*) AS n_events, ${moneySumSql("value")} AS sum_value
         |FROM sess GROUP BY user_id, session_seq
         |ORDER BY user_id, session_start_epoch""".stripMargin),

    // JSON property extraction + aggregation.
    "q_json_extract" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum("k").as("sum_k"),
            min("k").as("min_k"),
            max("k").as("max_k"))
          .orderBy("event_type"),
      s"""SELECT event_type, count(*) AS n_events,
         |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
         |FROM (SELECT event_type,
         |        CAST(${DuckSql.jsonGetStr("props", "k")} AS BIGINT) AS k
         |      FROM events)
         |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // SEQUENTIAL FUNNEL ANALYSIS: view → click → purchase, per user,
    // strictly time-ordered (each stage's event must be at-or-after the
    // user's EARLIEST completion of the previous stage — the standard
    // product-analytics funnel). Plan shape: three per-user min
    // aggregates chained by equi-joins on user_id, so every shuffle is
    // keyed on user_id and AQE collapses the chain onto ONE exchange
    // reused across stages; per-stage state is one timestamp per user.
    // The window-function alternative (ordering all events per user)
    // shuffles and sorts the full event payload; this shape shuffles
    // per-user scalars only — the difference at 100 TB/day of events.
    // Exactness: stage times are whole-second BIGINT epochs; the only
    // double is the final avg, computed from an exact BIGINT sum in one
    // division, identical in both engines.
    "q_event_funnel" -> QueryDef(
      (s, d) => {
        val e = Tables.events(s, d).select(col("user_id"),
          unix_timestamp(col("ts")).as("es"), col("event_type"))
        // each stage frame is consumed twice (next stage + its rollup);
        // scratch-caching the tiny one-row-per-user frames keeps the
        // event scans at one per stage (each with its event_type filter
        // pushed to parquet) instead of duplicating whole stage subtrees
        val s1 = graft.ScratchCache.scratch(
          e.filter(col("event_type") === "view")
            .groupBy("user_id").agg(min("es").as("t1")))
        val s2 = graft.ScratchCache.scratch(
          e.filter(col("event_type") === "click")
            .join(s1, "user_id").filter(col("es") >= col("t1"))
            .groupBy("user_id").agg(min("es").as("t2"), min("t1").as("t1")))
        val s3 = graft.ScratchCache.scratch(
          e.filter(col("event_type") === "purchase")
            .join(s2, "user_id").filter(col("es") >= col("t2"))
            .groupBy("user_id").agg(min("es").as("t3"), min("t1").as("t1")))
        s1.agg(count(lit(1)).as("n_view"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click")))
          .crossJoin(s3.agg(
            count(lit(1)).as("n_purchase"),
            expr("round(CAST(CAST(sum(t3 - t1) AS BIGINT) AS DOUBLE)" +
              " / count(*), 6)").as("avg_funnel_secs")))
      },
      s"""WITH e AS (SELECT user_id, ${DuckSql.epochSec("ts")} AS es, event_type
         |  FROM events),
         |s1 AS (SELECT user_id, min(es) AS t1 FROM e
         |  WHERE event_type = 'view' GROUP BY user_id),
         |s2 AS (SELECT e.user_id, min(es) AS t2, min(t1) AS t1
         |  FROM e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE event_type = 'click' AND es >= t1 GROUP BY e.user_id),
         |s3 AS (SELECT e.user_id, min(es) AS t3, min(t1) AS t1
         |  FROM e JOIN s2 ON e.user_id = s2.user_id
         |  WHERE event_type = 'purchase' AND es >= t2 GROUP BY e.user_id)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase,
         |  (SELECT round(CAST(CAST(sum(t3 - t1) AS BIGINT) AS DOUBLE)
         |     / count(*), 6) FROM s3) AS avg_funnel_secs""".stripMargin),

    // TIME-SERIES GAP FILL + FORWARD FILL — regularize an irregular
    // event stream onto each user's hourly grid: missing hours are
    // materialized (sequence() explode over the user's [first, last]
    // hour span) and carry the LAST OBSERVED hourly spend forward
    // (last(_, ignoreNulls) over an unbounded-preceding row frame —
    // the standard LOCF treatment). The declared output is the
    // per-user rollup (grid size, gap count, and the exact BIGINT sum
    // of the forward-filled values ON the gap hours), which pins the
    // fill values themselves while keeping the result compact at any
    // SF. The first grid hour always has events (the span comes FROM
    // the observed hours), so a fill value always exists.
    //
    // Scale shape: the grid explode is per-user bounded (span hours,
    // never a global calendar cross join); hourly rollup, span, grid,
    // join, and window all share user_id partitioning, so one shuffle
    // key carries the whole plan, and the LOCF window is a linear
    // per-partition scan. At 100 TB/day this is the canonical
    // feature-store regularization pass.
    "q_gap_fill" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d).select(
          col("user_id"), date_trunc("hour", col("ts")).as("h"),
          expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
        val hourly = ev.groupBy("user_id", "h")
          .agg(sum("cents").as("cents"), count(lit(1)).as("n"))
        val span = hourly.groupBy("user_id")
          .agg(min("h").as("h0"), max("h").as("h1"))
        val grid = span.select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("filled_cents",
            last("cents", ignoreNulls = true).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hours"),
            sum(expr("CASE WHEN n IS NULL THEN 1 ELSE 0 END"))
              .as("n_gap_hours"),
            sum(expr("CASE WHEN n IS NULL THEN filled_cents ELSE 0 END"))
              .as("gap_filled_cents"))
          .selectExpr("user_id", "n_hours",
            "CAST(n_gap_hours AS BIGINT) AS n_gap_hours",
            "CAST(gap_filled_cents AS BIGINT) AS gap_filled_cents")
          .orderBy("user_id")
      },
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |hourly AS (
        |  SELECT user_id, h, sum(cents) AS cents, count(*) AS n
        |  FROM ev GROUP BY user_id, h),
        |span AS (
        |  SELECT user_id, min(h) AS h0, max(h) AS h1
        |  FROM hourly GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM span),
        |filled AS (
        |  SELECT g.user_id, hourly.n,
        |    last_value(hourly.cents IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS filled_cents
        |  FROM grid g LEFT JOIN hourly
        |    ON g.user_id = hourly.user_id AND g.h = hourly.h)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_gap_hours,
        |  CAST(sum(CASE WHEN n IS NULL THEN filled_cents ELSE 0 END)
        |    AS BIGINT) AS gap_filled_cents
        |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin)
  )
}
