package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{QueryDef, Tables}

/** Scalar / aggregate function-library coverage.
  *
  * Tez itself has no function library (SURVEY.md §2c gap analysis — it
  * never interprets bytes; Hive supplies functions). In the new engine
  * these come from Spark SQL; this family oracle-checks a representative
  * slice so the "free" coverage is demonstrated, not assumed:
  * strings, dates, CUBE grouping sets, exact interpolated percentiles.
  *
  * Cross-engine notes baked in:
  *  - day-of-week: Spark `dayofweek` is 1=Sunday, DuckDB `dow` is
  *    0=Sunday → Spark side emits dayofweek-1;
  *  - percentiles: p ∈ {.25,.5,.75} over integer-valued doubles make
  *    the interpolation arithmetic exact in both engines (fractional
  *    weights are powers of two), so no tolerance is needed;
  *  - CUBE null ordering: explicit NULLS FIRST (DuckDB defaults last).
  */
object FunctionQueries {

  val defs: Map[String, QueryDef] = Map(
    "q_cube_agg" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    "q_string_funcs" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d)
          .selectExpr(
            "c_custkey",
            "upper(c_name) AS name_upper",
            "substring(c_name, 2, 5) AS name_mid",
            "length(c_name) AS name_len",
            "replace(c_name, '0', 'O') AS name_repl",
            "lpad(CAST(c_nationkey AS STRING), 4, '0') AS nation_pad",
            "concat(c_mktsegment, '#', CAST(c_nationkey AS STRING)) AS seg_tag",
            "(c_name LIKE '%1%') AS has_one")
          .orderBy("c_custkey"),
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  substr(c_name, 2, 5) AS name_mid,
        |  length(c_name) AS name_len,
        |  replace(c_name, '0', 'O') AS name_repl,
        |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_pad,
        |  concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_tag,
        |  (c_name LIKE '%1%') AS has_one
        |FROM customer ORDER BY c_custkey""".stripMargin),

    "q_date_funcs" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .selectExpr(
            "date_format(o_orderdate, 'yyyy-MM') AS order_month",
            "year(o_orderdate) AS order_year",
            "(dayofweek(o_orderdate) - 1) AS order_dow",
            "o_totalprice")
          .groupBy("order_month")
          .agg(
            count(lit(1)).as("n_orders"),
            min("order_year").as("order_year"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
              .as("sum_price"),
            countDistinct("order_dow").as("n_dows"))
          .orderBy("order_month"),
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        |  count(*) AS n_orders,
        |  min(CAST(extract(year FROM o_orderdate) AS INT)) AS order_year,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(DISTINCT CAST(extract(dow FROM o_orderdate) AS INT)) AS n_dows
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),

    // Sketch aggregates: HLL++ internals differ from DuckDB's sketch, so
    // no SQL oracle is declared — the driver records the weaker
    // rows-only check. The exact distinct count rides along so the
    // result itself witnesses the approximation error (< 5% rsd).
    "q_approx_distinct" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct("l_partkey", 0.05).as("approx_parts"),
            countDistinct("l_partkey").as("exact_parts"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      None),

    "q_percentile_agg" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.25)").as("p25_qty"),
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_quantity, 0.75)").as("p75_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.75) AS p75_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  )
}
