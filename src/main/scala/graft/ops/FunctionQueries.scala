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

    // Analytic window functions beyond rank: lag, running frame sums,
    // ntile, row_number over a deterministic per-customer order. Money
    // arithmetic stays in DECIMAL(18,2) inside the frame (running double
    // sums are evaluation-order-dependent; DuckDB may use a segment tree)
    // and casts to DOUBLE once at the end.
    "q_window_analytics" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("price_dec", col("o_totalprice").cast(DecimalType(18, 2)))
          .select(
            col("o_orderkey"), col("o_custkey"),
            row_number().over(w).as("order_seq"),
            ntile(4).over(w).as("quartile"),
            (col("price_dec") - coalesce(lag("price_dec", 1).over(w),
              col("price_dec"))).cast(DoubleType).as("price_delta"),
            sum("price_dec").over(run).cast(DoubleType).as("running_total"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER w AS INT) AS order_seq,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |    - coalesce(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w,
        |               CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_delta,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    // RANGE window frame (value-based, vs q_window_analytics' ROWS
    // frame): 30-day trailing spend per customer keyed on an integer
    // day offset. A RANGE frame is determined by VALUES, so same-day
    // peer rows share one deterministic result regardless of row order;
    // money stays DECIMAL inside the frame, one DOUBLE cast at the end.
    "q_window_range" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("day")
          .rangeBetween(-30, Window.currentRow)
        Tables.orders(s, d)
          .selectExpr("o_orderkey", "o_custkey",
            "datediff(o_orderdate, DATE'1992-01-01') AS day",
            "CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec")
          .select(
            col("o_orderkey"), col("o_custkey"), col("day"),
            sum("price_dec").over(w).cast(DoubleType).as("trailing_30d"),
            count(lit(1)).over(w).as("n_trailing"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_custkey, day,
        |  CAST(sum(price_dec) OVER w AS DOUBLE) AS trailing_30d,
        |  count(*) OVER w AS n_trailing
        |FROM (SELECT o_orderkey, o_custkey,
        |    datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
        |  FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin),

    // Distribution window functions (percent_rank / cume_dist) plus
    // frame-boundary values (first_value; last_value over the FULL
    // frame — the default frame stops at CURRENT ROW, a classic
    // wrong-answer trap both engines share and the explicit frame
    // removes). percent_rank's (rank-1)/(n-1) and cume_dist's
    // count≤/n are exact small-integer rationals in double —
    // bit-identical across engines; money stays DECIMAL until one
    // final DOUBLE cast.
    "q_window_distribution" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .withColumn("price_dec", col("o_totalprice").cast(DecimalType(18, 2)))
          .select(
            col("o_orderkey"), col("o_custkey"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            first("price_dec").over(w).cast(DoubleType).as("first_price"),
            last("price_dec").over(full).cast(DoubleType).as("last_price"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_custkey,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(first_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
        |    AS DOUBLE) AS first_price,
        |  CAST(last_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS DOUBLE) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    // Array construction + manipulation over grouped data: sorted
    // collect, size, element access, join-to-string, membership.
    "q_array_funcs" -> QueryDef(
      (s, d) =>
        Tables.nation(s, d)
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(sort_array(collect_list("n_name")).as("nations"))
          // the raw LIST column is not hashable by the oracle harness —
          // emit it joined to a string; the array ops still run underneath
          .selectExpr("r_name", "array_join(nations, '|') AS nations_str",
            "CAST(size(nations) AS INT) AS n_nations",
            "element_at(nations, 1) AS first_nation",
            "element_at(nations, size(nations)) AS last_nation",
            "array_join(slice(nations, 1, 3), ',') AS top3",
            "array_contains(nations, 'CANADA') AS has_canada")
          .orderBy("r_name"),
      """SELECT r_name,
        |  array_to_string(list(n_name ORDER BY n_name), '|') AS nations_str,
        |  CAST(len(list(n_name ORDER BY n_name)) AS INT) AS n_nations,
        |  (list(n_name ORDER BY n_name))[1] AS first_nation,
        |  (list(n_name ORDER BY n_name))[len(list(n_name ORDER BY n_name))]
        |    AS last_nation,
        |  array_to_string((list(n_name ORDER BY n_name))[1:3], ',') AS top3,
        |  list_contains(list(n_name ORDER BY n_name), 'CANADA') AS has_canada
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // Bitwise function family over exact integers (AND/OR/XOR, shifts,
    // popcount) — pure map-side arithmetic, engine-identical.
    "q_bitwise_funcs" -> QueryDef(
      (s, d) => {
        val sq = graft.oracle.SparkSql
        Tables.part(s, d)
          .selectExpr("p_partkey",
            "CAST((p_partkey & 255) AS BIGINT) AS low_band",
            "CAST((p_partkey | 1024) AS BIGINT) AS with_flag",
            s"CAST(${sq.xorB("p_partkey", "p_size")} AS BIGINT) AS key_xor_size",
            s"CAST(${sq.shiftL("p_size", "3")} AS BIGINT) AS size_x8",
            s"CAST(${sq.shiftR("p_partkey", "4")} AS BIGINT) AS key_div16",
            "CAST(bit_count(p_partkey) AS INT) AS key_bits")
          .orderBy("p_partkey")
      }, {
        val d = graft.oracle.DuckSql
        s"""SELECT p_partkey,
           |  CAST((p_partkey & 255) AS BIGINT) AS low_band,
           |  CAST((p_partkey | 1024) AS BIGINT) AS with_flag,
           |  CAST(${d.xorB("p_partkey", "p_size")} AS BIGINT) AS key_xor_size,
           |  CAST(${d.shiftL("p_size", "3")} AS BIGINT) AS size_x8,
           |  CAST(${d.shiftR("p_partkey", "4")} AS BIGINT) AS key_div16,
           |  CAST(bit_count(p_partkey) AS INT) AS key_bits
           |FROM part ORDER BY p_partkey""".stripMargin
      }),

    // Full outer join: acct-filtered customers vs per-customer order
    // rollup. Both null sides are exercised (filtered-out customers make
    // orphan order groups; order-less customers make null aggregates);
    // the coalesced key keeps the ORDER BY total and unique.
    "q_full_outer" -> QueryDef(
      (s, d) => {
        val cust = Tables.customer(s, d)
          .filter("c_acctbal > 5000").select("c_custkey", "c_name")
        val oagg = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
              .as("sum_price"))
        cust.join(oagg, col("c_custkey") === col("o_custkey"), "full_outer")
          .selectExpr("coalesce(c_custkey, o_custkey) AS custkey", "c_name",
            "n_orders", "sum_price")
          .orderBy("custkey")
      },
      """SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name,
        |  n_orders, sum_price
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM orders GROUP BY o_custkey) o
        |ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin),

    // Explicit GROUPING SETS (beyond the CUBE/ROLLUP shorthands): the
    // two single-column marginals plus the grand total, with the
    // grouping-id bitmask witnessing which rows belong to which set.
    "q_grouping_sets" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n_rows"),
            expr("CAST(grouping_id() AS BIGINT)").as("gid"))
          .orderBy(col("gid"),
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // Pivot (long→wide): order counts per priority × status. Spark's
    // relational pivot leaves empty cells NULL while a CASE/FILTER
    // aggregate yields 0 — the coalesce pins both engines to 0.
    "q_pivot" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .selectExpr("o_orderpriority",
            "coalesce(F, 0) AS n_f", "coalesce(O, 0) AS n_o",
            "coalesce(P, 0) AS n_p")
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // Unpivot (wide→long reshape): metrics-as-columns become
    // (metric, value) rows via the stack() generator — the inverse of
    // q_pivot, and the map-side-only reshape a feature pipeline uses to
    // normalize per-entity metric tables. Money sums quantize to
    // DECIMAL before summing (exact), one DOUBLE cast at the end.
    "q_unpivot" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d)
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).cast(DoubleType).as("n_customers"),
            sum(col("c_acctbal").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total_bal"))
          .selectExpr("c_mktsegment",
            "stack(2, 'n_customers', n_customers, 'total_bal', total_bal) AS (metric, value)")
          .orderBy("c_mktsegment", "metric"),
      """WITH m AS (
        |  SELECT c_mktsegment,
        |    CAST(count(*) AS DOUBLE) AS n_customers,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |  FROM customer GROUP BY c_mktsegment
        |)
        |SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS value FROM m
        |UNION ALL
        |SELECT c_mktsegment, 'total_bal' AS metric, total_bal AS value FROM m
        |ORDER BY c_mktsegment, metric""".stripMargin),

    // Conditional / null-handling family: CASE bands, nullif→coalesce
    // round-trip, least/greatest. Map-side only.
    "q_conditional_funcs" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .selectExpr("o_orderkey",
            """CASE WHEN o_totalprice >= 200000 THEN 'high'
              |     WHEN o_totalprice >= 100000 THEN 'mid'
              |     ELSE 'low' END AS price_band""".stripMargin,
            "coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'none') AS prio_or_none",
            "least(o_orderkey, o_custkey * 1000) AS lo_key",
            "greatest(o_orderkey, o_custkey * 1000) AS hi_key",
            "(o_orderstatus = 'F') AS is_final")
          .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice >= 200000 THEN 'high'
        |       WHEN o_totalprice >= 100000 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'none') AS prio_or_none,
        |  least(o_orderkey, o_custkey * 1000) AS lo_key,
        |  greatest(o_orderkey, o_custkey * 1000) AS hi_key,
        |  (o_orderstatus = 'F') AS is_final
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // Regex extraction family over raw text (group capture, match
    // counting, boolean match) — patterns in the Java-regex ∩ RE2
    // subset; the ''→'<none>' normalization pins the engines' different
    // no-match conventions to one value.
    "q_regex_extract" -> QueryDef(
      (s, d) => {
        val sq = graft.oracle.SparkSql
        Tables.documentsParallel(s, d)
          .selectExpr("doc_id",
            "coalesce(nullif(regexp_extract(text, 'fast ([a-z]+)', 1), ''), '<none>')" +
              " AS after_fast",
            s"CAST(${sq.regexCount("text", "fast")} AS BIGINT) AS n_fast",
            "(text RLIKE 'vector') AS has_vector")
          .orderBy("doc_id")
      }, {
        val d = graft.oracle.DuckSql
        s"""SELECT doc_id,
           |  coalesce(nullif(regexp_extract(text, 'fast ([a-z]+)', 1), ''), '<none>')
           |    AS after_fast,
           |  CAST(${d.regexCount("text", "fast")} AS BIGINT) AS n_fast,
           |  regexp_matches(text, 'vector') AS has_vector
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // arg-min/arg-max + conditional-count aggregates. The by-measure is
    // made UNIQUE (exact cents × 1e7 + orderkey, pure BIGINT arithmetic)
    // so argmin/argmax ties cannot occur and both engines agree exactly.
    "q_minmax_agg" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .selectExpr("o_orderpriority", "o_orderkey", "o_orderstatus",
            "(CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)" +
              " AS price_key")
          .groupBy("o_orderpriority")
          .agg(
            expr("max_by(o_orderkey, price_key)").as("priciest_order"),
            expr("min_by(o_orderkey, price_key)").as("cheapest_order"),
            expr("count_if(o_orderstatus = 'F')").as("n_final"),
            expr("bool_or(o_orderstatus = 'P')").as("any_pending"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, price_key) AS priciest_order,
        |  arg_min(o_orderkey, price_key) AS cheapest_order,
        |  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_final,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  count(*) AS n_orders
        |FROM (SELECT o_orderpriority, o_orderkey, o_orderstatus,
        |    (CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        |      AS price_key
        |  FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

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
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // MAP-typed columns — the last container family after arrays and
    // structs: per nation, a segment→count map built with
    // map_from_entries over deterministically sorted entries, then
    // probed (cardinality, point lookup with a missing-key default,
    // sorted key list, value fold). The map stays INTERNAL to the
    // query — outputs are scalars/strings, since the driver's compare
    // can't hash raw container columns (the q_array_funcs lesson).
    // Cross-engine notes: Spark element_at(m, k) yields NULL for a
    // missing key while DuckDB map_extract returns a LIST (empty when
    // missing) — both sides coalesce to 0; map_values order follows
    // the sorted entry list in both engines.
    "q_map_funcs" -> QueryDef(
      (s, d) =>
        Tables.customer(s, d)
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("n"))
          .groupBy("c_nationkey")
          .agg(map_from_entries(
            sort_array(collect_list(struct(col("c_mktsegment"), col("n")))))
            .as("m"))
          .selectExpr(
            "CAST(c_nationkey AS BIGINT) AS nationkey",
            "CAST(cardinality(m) AS BIGINT) AS n_segments",
            "CAST(coalesce(element_at(m, 'BUILDING'), 0) AS BIGINT) AS n_building",
            "array_join(sort_array(map_keys(m)), ',') AS segments",
            "aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x) AS n_customers")
          .orderBy("nationkey"),
      """WITH per AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY c_nationkey, c_mktsegment),
        |maps AS (
        |  SELECT c_nationkey,
        |    map_from_entries(list_transform(
        |      list_sort(list({'k': c_mktsegment, 'v': n})),
        |      e -> e)) AS m
        |  FROM per GROUP BY c_nationkey)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  CAST(cardinality(m) AS BIGINT) AS n_segments,
        |  CAST(coalesce(map_extract(m, 'BUILDING')[1], 0) AS BIGINT) AS n_building,
        |  array_to_string(list_sort(map_keys(m)), ',') AS segments,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), map_values(m)),
        |    (a, x) -> a + x) AS n_customers
        |FROM maps ORDER BY nationkey""".stripMargin)
  )
}
