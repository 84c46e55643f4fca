package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation
import org.scalatest.funsuite.AnyFunSuite

/** Declarative in-query metrics via `Dataset.observe` — the user-facing
  * counter surface (SURVEY.md §2f TaskCounter parity, complementing
  * GraftMetrics' listener snapshots): named aggregates ride the query
  * itself with NO extra pass over the data, the way the reference's
  * counters accumulate inside the task run rather than in a follow-up
  * job. At 100 TB that difference is the whole point — a pipeline
  * validates row counts / null rates / value bounds on the same scan
  * that produces the output.
  */
class ObserveSpec extends AnyFunSuite {
  import SparkTestSession._

  test("observe() collects named metrics on the producing pass") {
    val obs = Observation("orders_audit")
    val out = Tables.orders(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("total_price"),
        count(when(col("o_orderpriority").isNull, 1)).as("null_priority"))
      .filter(col("o_orderstatus") === "F")

    val kept = out.count()
    val m = obs.get
    val expectedRows = Tables.orders(spark, sf).count()
    assert(m("n_rows") == expectedRows, s"observed ${m("n_rows")} of $expectedRows")
    assert(m("null_priority") == 0L)
    val expectedTotal = Tables.orders(spark, sf)
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))"))).collect()(0).getDecimal(0)
    assert(m("total_price") == expectedTotal)
    // the metric saw ALL rows even though the query kept a subset
    assert(kept < expectedRows)
  }
}
