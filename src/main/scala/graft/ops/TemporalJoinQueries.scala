package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.oracle.DuckSql
import graft.{QueryDef, Tables}

/** Temporal joins Spark SQL lacks as first-class operators: AS-OF and
  * bounded RANGE joins over the events table (SURVEY.md §7 preference
  * order (a): composed from built-ins — no custom strategy needed, and
  * the compositions are the scalable plans).
  *
  *  - AS-OF: each event picks the latest prior 'purchase' of the same
  *    user. Implemented via the union-sort trick: tag both streams,
  *    one shuffle on user_id, one sort on (ts, side, id), running
  *    `last(ignoreNulls)` carries the right payload forward. Linear,
  *    single shuffle — at 100 TB this beats any per-row range probe.
  *    Right rows sort BEFORE left rows at equal ts → ts_r ≤ ts
  *    inclusive; event_id breaks remaining ties, so output is total.
  *  - RANGE: purchase × events of the same user within the following
  *    10 minutes. Equi-join on (user_id, 10-minute bucket) with the
  *    event probing its own and the previous bucket — candidate pairs
  *    are banded instead of quadratic, then the exact range predicate
  *    filters. The oracle states the plain inequality join; results are
  *    identical because bucket±1 provably covers a 600 s range.
  */
object TemporalJoinQueries {

  private val RangeSec = 600

  val defs: Map[String, QueryDef] = Map(
    "q_asof_join" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
            col("event_id"), col("event_type"), col("value"))
        val left = ev.selectExpr("user_id", "es", "event_id",
          "1 AS side", "CAST(NULL AS DOUBLE) AS pval")
        val right = ev.filter(col("event_type") === "purchase")
          .selectExpr("user_id", "es", "event_id", "0 AS side",
            "value AS pval")
        val w = Window.partitionBy("user_id")
          .orderBy(col("es"), col("side"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        left.unionAll(right)
          .withColumn("last_purchase_val", last("pval", ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select("user_id", "event_id", "es", "last_purchase_val")
          .orderBy("user_id", "event_id")
      },
      """WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    event_id, event_type, value FROM events),
        |tagged AS (
        |  SELECT user_id, es, event_id, 1 AS side, CAST(NULL AS DOUBLE) AS pval FROM ev
        |  UNION ALL
        |  SELECT user_id, es, event_id, 0 AS side, value AS pval FROM ev
        |  WHERE event_type = 'purchase'
        |)
        |SELECT user_id, event_id, es, last_purchase_val FROM (
        |  SELECT user_id, es, event_id, side,
        |    last_value(pval IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY es, side, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_val
        |  FROM tagged
        |) WHERE side = 1
        |ORDER BY user_id, event_id""".stripMargin),

    // Same AS-OF semantics through the custom Catalyst operator
    // (graft.plans.AsOfJoinPlan + RewriteAsOfJoin): the node lowers to
    // the union-sort composition at analysis time. Tie-break among
    // right rows at equal ts is by payload (the node's generic total
    // order), so the oracle sorts (es, side, pval) — not event_id.
    "q_asof_plan" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
            col("event_id"), col("event_type"), col("value"))
        val left = ev.select("user_id", "event_id", "es")
        val right = ev.filter(col("event_type") === "purchase")
          .select("user_id", "es", "value")
        graft.plans.AsOfJoin
          .asof(left, right, Seq("user_id"), "es", "es", "value",
            "last_purchase_val")
          .orderBy("user_id", "event_id")
      },
      """WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    event_id, event_type, value FROM events),
        |tagged AS (
        |  SELECT user_id, event_id, es, 1 AS side, CAST(NULL AS DOUBLE) AS pval FROM ev
        |  UNION ALL
        |  SELECT user_id, CAST(NULL AS BIGINT) AS event_id, es, 0 AS side, value AS pval
        |  FROM ev WHERE event_type = 'purchase'
        |)
        |SELECT user_id, event_id, es, last_purchase_val FROM (
        |  SELECT user_id, event_id, es, side,
        |    last_value(pval IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY es, side, pval
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_val
        |  FROM tagged
        |) WHERE side = 1
        |ORDER BY user_id, event_id""".stripMargin),

    // Same AS-OF semantics through the custom PHYSICAL operator
    // (graft.plans.AsOfMergeJoinExec via AsOfJoinStrategy): one shuffle
    // per side (EnsureRequirements co-partitions on user_id), sorted
    // streams merged per-partition with O(1) state. Tie-break among
    // right rows at equal ts is by payload — q_asof_plan's oracle.
    "q_asof_exec" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
            col("event_id"), col("event_type"), col("value"))
        val left = ev.select("user_id", "event_id", "es")
        val right = ev.filter(col("event_type") === "purchase")
          .select("user_id", "es", "value")
        graft.plans.AsOfMerge
          .asof(left, right, Seq("user_id"), "es", "es", "value",
            "last_purchase_val")
          .orderBy("user_id", "event_id")
      },
      """WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    event_id, event_type, value FROM events),
        |tagged AS (
        |  SELECT user_id, event_id, es, 1 AS side, CAST(NULL AS DOUBLE) AS pval FROM ev
        |  UNION ALL
        |  SELECT user_id, CAST(NULL AS BIGINT) AS event_id, es, 0 AS side, value AS pval
        |  FROM ev WHERE event_type = 'purchase'
        |)
        |SELECT user_id, event_id, es, last_purchase_val FROM (
        |  SELECT user_id, event_id, es, side,
        |    last_value(pval IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY es, side, pval
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_val
        |  FROM tagged
        |) WHERE side = 1
        |ORDER BY user_id, event_id""".stripMargin),

    // Same bounded-RANGE semantics through the custom Catalyst operator
    // (graft.plans.RangeJoinPlan + RewriteRangeJoin): the node lowers to
    // the bucket±1 banded equi-join at analysis time; output order and
    // the oracle are exactly q_range_join's.
    "q_range_plan" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
            col("event_id"), col("event_type"))
        val p = ev.filter(col("event_type") === "purchase")
          .selectExpr("user_id", "event_id AS purchase_id", "es AS pes")
        val e = ev.select("user_id", "event_id", "es", "event_type")
        graft.plans.RangeJoin
          .range(p, e, Seq("user_id"), "pes", "es", RangeSec.toLong)
          .select("user_id", "purchase_id", "event_id", "es", "event_type")
          .orderBy("user_id", "purchase_id", "event_id")
      },
      s"""WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         |    event_id, event_type FROM events)
         |SELECT p.user_id, p.event_id AS purchase_id, e.event_id, e.es, e.event_type
         |FROM ev p JOIN ev e
         |  ON p.user_id = e.user_id
         | AND e.es > p.es AND e.es - p.es <= $RangeSec
         |WHERE p.event_type = 'purchase'
         |ORDER BY p.user_id, purchase_id, e.event_id""".stripMargin),

    "q_range_join" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
            col("event_id"), col("event_type"))
        val p = ev.filter(col("event_type") === "purchase")
          .selectExpr("user_id", "event_id AS purchase_id", "es AS pes",
            s"(es div $RangeSec) AS bucket")
        val e = ev.selectExpr("user_id", "event_id", "es", "event_type",
          s"(es div $RangeSec) AS eb")
        // event probes its own bucket and the previous one: covers the
        // full (pes, pes + RangeSec] window exactly
        val probes = e.selectExpr("user_id", "event_id", "es", "event_type", "eb AS bucket")
          .unionAll(e.selectExpr("user_id", "event_id", "es", "event_type",
            "(eb - 1) AS bucket"))
        // a qualifying (purchase, event) pair matches exactly one probe
        // row (its bucket equals pb or pb+1, never both), so no dedup
        p.join(probes, Seq("user_id", "bucket"))
          .filter(col("es") > col("pes") && col("es") - col("pes") <= RangeSec)
          .select("user_id", "purchase_id", "event_id", "es", "event_type")
          .orderBy("user_id", "purchase_id", "event_id")
      },
      s"""WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         |    event_id, event_type FROM events)
         |SELECT p.user_id, p.event_id AS purchase_id, e.event_id, e.es, e.event_type
         |FROM ev p JOIN ev e
         |  ON p.user_id = e.user_id
         | AND e.es > p.es AND e.es - p.es <= $RangeSec
         |WHERE p.event_type = 'purchase'
         |ORDER BY p.user_id, purchase_id, e.event_id""".stripMargin)
  )
}
