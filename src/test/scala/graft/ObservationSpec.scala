package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query-attached data-path counters via `Dataset.observe` — the
  * DECLARATIVE half of the reference's counter surface. The executor
  * side (spill tiers, shuffle split, fetch-wait:
  * graft.metrics.TaskCounters, SpillCounterClusterSpec) mirrors
  * TaskCounter's machine metrics; `observe` mirrors the user-defined
  * counters a processor increments inline
  * (tez-api/src/main/java/org/apache/tez/common/counters/TaskCounter.java:26-140,
  * INPUT_RECORDS_PROCESSED / OUTPUT_RECORDS): aggregate expressions
  * evaluated ON the rows as they flow through the plan, collected at
  * query completion with NO second pass. At 100 TB that distinction is
  * the whole point — a recount for audit metrics costs another full
  * scan; an observation rides the scan the query already pays for.
  */
class ObservationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("observed in-flight counters equal an independent recount") {
    val li = Tables.lineitem(spark, sf)
    val obs = Observation("graft_scan_counters")
    // Observation attached BETWEEN scan and filter: it must count every
    // scanned row (the INPUT_RECORDS counter), not just the rows the
    // downstream query keeps.
    val out = li
      .observe(obs,
        count(lit(1)).as("n_input_rows"),
        sum(expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"))
          .as("sum_cents"),
        max("l_shipdate").as("max_ship"))
      .filter(col("l_quantity") > 25)
      .groupBy("l_returnflag")
      .count()
      .collect()
    assert(out.nonEmpty)

    val want = li.agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")).as("s"),
      max("l_shipdate").as("m")).head()

    val got = obs.get
    assert(got("n_input_rows") == want.getLong(0),
      "observed row counter diverges from recount")
    assert(got("sum_cents") == want.getLong(1),
      "observed money counter diverges from recount")
    assert(got("max_ship") == want.get(2), // NTZ timestamp: LocalDateTime
      "observed max diverges from recount")
  }

  test("observation sees pre-filter rows while the query output is filtered") {
    val li = Tables.lineitem(spark, sf)
    val obs = Observation("graft_selectivity")
    val kept = li
      .observe(obs, count(lit(1)).as("scanned"))
      .filter(col("l_returnflag") === "R")
      .count()
    val scanned = obs.get("scanned").asInstanceOf[Long]
    assert(scanned == li.count(), "counter must see every scanned row")
    assert(kept < scanned, "filter should drop rows after the observe point")
  }
}
