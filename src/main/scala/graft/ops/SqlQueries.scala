package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, Tables}

/** The SQL text entry surface — queries submitted as SQL strings via
  * `spark.sql(...)`, not the DataFrame DSL.
  *
  * This is the reference's dominant real-world consumer shape: Tez is
  * driven overwhelmingly by SQL frontends that compile declarative text
  * into its DAGs (the DAG API exists to serve them — see the processor
  * / edge surface in tez-api/src/main/java/org/apache/tez/dag/api/DAG.java:74
  * and the MapReduce-compat layer under tez-mapreduce/). A user of the
  * reference "runs SQL"; switching engines means their SQL must run
  * unchanged. So these queries exercise the full declarative path:
  * parse → analyze against registered tables → Catalyst optimization
  * (join reordering, predicate pushdown, partial aggregation) → the
  * same physical operators the DSL queries use.
  *
  * Parity statement: each query is ONE SQL string executed VERBATIM by
  * both engines — Spark runs it over temp views named like the parquet
  * tables, the driver runs the identical text in DuckDB. Same text,
  * same results, bit-exact. To keep that exact:
  *  - the SQL stays in the ANSI subset the engines share;
  *  - money math quantizes to DECIMAL per-row BEFORE aggregation
  *    (decimal sums/products are exact integer arithmetic, so
  *    accumulation order cannot matter; one DOUBLE cast at the end);
  *  - every query ends in a fully deterministic ORDER BY (ties broken
  *    to a key column), so LIMIT cutoffs agree.
  *
  * Scale notes (100 TB): these are the classic warehouse shapes —
  * Catalyst broadcasts the dim sides of q_sql_revenue's 6-way join and
  * pushes the date/segment predicates into the parquet scans
  * (PushedFilters), the Q1-shape aggregation is partial+final
  * (map-side combine before one shuffle on a 6-value key), and the
  * EXISTS in q_sql_order_priority plans as a left-semi join, never a
  * per-row subquery (both assertions live in QueriesSpec).
  */
object SqlQueries {

  /** Register the named fixture tables as temp views, then run `sql`. */
  private def viaSql(tables: Seq[String], sql: String)(
      s: SparkSession, d: String): DataFrame = {
    val load: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem)
    tables.foreach(t => load(t)(s, d).createOrReplaceTempView(t))
    s.sql(sql)
  }

  /** One definition whose Spark program IS the oracle text. */
  private def sqlDef(tables: Seq[String], sql: String): QueryDef =
    QueryDef((s, d) => viaSql(tables, sql)(s, d), sql)

  // TPC-H Q1 shape: full pricing summary. Per-row DECIMAL quantization
  // (price at 2 dp, the discount/tax factors at 2 dp) makes every
  // product and sum exact rational arithmetic — both engines sum the
  // same integers in any order.
  private val PricingSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS avg_qty,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // TPC-H Q3 shape: segment revenue top-10. The join order
  // (customer⋈orders⋈lineitem) is the optimizer's choice, not the
  // text's; revenue ties break to the order key so the LIMIT cutoff is
  // deterministic in both engines.
  private val TopRevenueSql =
    """SELECT o_orderkey AS order_key,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, order_key
      |LIMIT 10""".stripMargin

  // TPC-H Q4 shape: priority counts over a quarter, EXISTS planned as a
  // left-semi join (asserted in QueriesSpec).
  private val OrderPrioritySql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // TPC-H Q5 shape: 6-way snowflake join (region→nation→customer/
  // supplier→orders→lineitem) with local-supplier restriction — the
  // join-reorder + broadcast showcase: region/nation are tiny
  // broadcasts, customer/supplier hash-join, and only orders⋈lineitem
  // shuffles on the big keys.
  private val RegionRevenueSql =
    """SELECT n_name AS nation,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, nation""".stripMargin

  // TPC-H Q6 shape: the forecasting-revenue-change scan — a pure
  // filter+aggregate with NO join and NO group key. The whole query is
  // one parquet scan with every predicate pushed down (shipdate range,
  // discount band, quantity cap all reach PushedFilters) and a
  // map-combinable 2-cell aggregate — the shape where scan efficiency
  // IS the query, and exactly what column pruning + predicate pushdown
  // buy at 100 TB. Money quantizes to DECIMAL per row before the sum.
  private val ForecastSql =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // NOT IN (subquery) — the null-aware anti join. ANSI NOT IN is NOT
  // the complement of IN when nulls are possible (one NULL in the
  // subquery empties the result; a NULL probe key never passes), so
  // Spark cannot plan it as a plain LeftAnti on parquet's nullable
  // schema: it plans a null-aware anti join (broadcast, with the
  // empty/null checks compiled in) — a genuinely distinct physical
  // operator from q_left_anti's, asserted in QueriesSpec. The
  // blocklist side (negative-balance customers) is tiny at any scale →
  // broadcast; the probe side never shuffles.
  private val NotInSql =
    """SELECT o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
      |    AS BIGINT) AS sum_cents
      |FROM orders
      |WHERE o_custkey NOT IN
      |  (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // WITH RECURSIVE — the iterative-DAG surface as DECLARATIVE text
  // (Spark 4 executes recursive CTEs as an iterative union loop — the
  // engine-managed analog of the hand-rolled driver loops in
  // q_pagerank / q_shortest_path / q_dedup_cluster). A depth-bounded
  // multi-source walk over a deterministic functional graph on the
  // customer key space: seeds are every 500th key, next(k) =
  // (k*7 + 11) mod (max_key + 1), 6 steps. The modulus is DATA-derived
  // (max over customer) and carried through the recursion as a column,
  // so the anchor is one aggregate + broadcast and each recursive step
  // is a pure map — no per-step rescans of the base table. Both
  // engines execute the IDENTICAL text; all arithmetic is BIGINT.
  private val RecursiveSql =
    """WITH RECURSIVE walk(seed, step, node, mx) AS (
      |  SELECT c_custkey AS seed, CAST(0 AS BIGINT) AS step,
      |    c_custkey AS node, mx
      |  FROM customer CROSS JOIN (SELECT max(c_custkey) AS mx FROM customer)
      |  WHERE c_custkey % 500 = 0
      |  UNION ALL
      |  SELECT seed, step + 1, (node * 7 + 11) % (mx + 1), mx
      |  FROM walk WHERE step < 6
      |)
      |SELECT seed, step, node FROM walk
      |ORDER BY seed, step""".stripMargin

  // Correlated scalar subquery — Catalyst DECORRELATES it into an
  // aggregate + join (never a per-row subquery execution; QueriesSpec
  // asserts the decorrelated plan): orders costing more than twice
  // their customer's average. The comparison stays engine-exact: cents
  // are BIGINT, the average is one double division of two BIGINTs
  // (identical IEEE-754 in both engines), and the literal 2 is
  // CAST AS DOUBLE so Spark cannot parse a DECIMAL.
  private val CorrelatedSql =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_big,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM o
      |WHERE cents > (
      |  SELECT CAST(2 AS DOUBLE) * sum(o2.cents) / count(*)
      |  FROM o o2 WHERE o2.o_custkey = o.o_custkey)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // TPC-H Q18 shape (large-volume orders): IN over a GROUPED-HAVING
  // subquery — the "semi-join against an aggregate" pattern, distinct
  // from Q4's EXISTS (semi-join against a filter): Spark must aggregate
  // lineitem FIRST, then plan the IN as a left-semi join of orders
  // against that aggregate, then re-join lineitem for the final rollup.
  // At 100 TB the HAVING aggregate is map-combinable and its survivors
  // are few (the big-order tail) → AQE turns the semi-join into a
  // broadcast at runtime. Quantities are whole numbers stored as
  // DOUBLE → per-row CAST to BIGINT makes every sum exact and
  // order-independent in both engines.
  private val BigOrdersSql =
    """SELECT c_custkey, o_orderkey,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
      |GROUP BY c_custkey, o_orderkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // TPC-H Q7 shape (volume shipping): bidirectional nation-pair trade
  // revenue by ship year. Plan shape at scale: nation is a tiny
  // broadcast on BOTH legs (supplier-side and customer-side), the
  // nation-name disjunction prunes to two nations BEFORE the big
  // orders⋈lineitem shuffle, and the final rollup has at most
  // 2 pairs × years groups — map-combinable to almost nothing.
  private val VolumeShippingSql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // TPC-H Q8 shape (national market share): one nation's share of a
  // region's import volume for one part type, by order year. The share
  // is a ratio of two EXACT decimal sums, each cast to DOUBLE once —
  // a single IEEE division per group, identical in both engines. The
  // CASE carries an explicit DECIMAL zero so the conditional sum stays
  // decimal end-to-end (no double accumulation anywhere).
  private val MarketShareSql =
    """SELECT o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
      |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // TPC-H Q9 shape (product-type profit, lite: the fixture has no
  // partsupp/ps_supplycost, so profit = discounted revenue): profit on
  // a part-name family by supplier nation and order year. The
  // p_name LIKE filter reaches the part scan (a tiny relation that
  // then broadcasts into lineitem), so the big side is pruned by the
  // join itself — the dominant cost stays one lineitem pass.
  private val ProfitSql =
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%widget%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  // TPC-H Q10 shape (returned items): top-20 customers by revenue lost
  // to returns over a half-year window. Revenue ties break to the
  // customer key so the LIMIT cutoff is deterministic in both engines;
  // the revenue doubles being ordered are casts of exact decimal sums,
  // so DESC order is engine-identical too.
  private val ReturnedItemsSql =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  n_name AS nation
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // TPC-H Q14 shape (promotion effect): promo revenue share by ship
  // month. Both sums stay exact DECIMAL through the aggregate; the
  // percentage is (double * 100.0) / double — the same two IEEE ops in
  // the same order from the same parse tree in both engines.
  private val PromoRevenueSql =
    """SELECT y, m,
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume
      |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
      |    / CAST(sum(volume) AS DOUBLE) AS promo_pct
      |FROM (
      |  SELECT year(l_shipdate) AS y, month(l_shipdate) AS m, p_type,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') monthly
      |GROUP BY y, m
      |ORDER BY y, m""".stripMargin

  // TPC-H Q15 shape (top supplier): the revenue view + scalar-max
  // pattern. The per-supplier revenue aggregate is computed ONCE as a
  // CTE (Spark reuses the subplan for the max via a subquery over the
  // same aggregate; at scale the max side collapses to one row and
  // broadcasts). Winner selection compares DECIMALs within each
  // engine — exact, so both engines pick the identical supplier set
  // even if revenues tie.
  private val TopSupplierSql =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // TPC-H Q17 shape (small-quantity-order revenue, lite: threshold at
  // 0.5·avg instead of 0.2·avg — the fixture's uniform 1..50 quantities
  // put almost nothing under 0.2·avg): revenue from orders far below a
  // part's average order size. Catalyst decorrelates the per-part
  // average into an aggregate + join (one extra lineitem aggregate,
  // grouped on the join key — never a per-row subquery). Quantities
  // are whole numbers in DOUBLE: the per-part sum and count are exact,
  // the avg is one division, and 0.5·avg is exact scaling — the
  // comparison is engine-identical.
  private val SmallQtyRevenueSql =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#11'
      |  AND l_quantity < (
      |    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // TPC-H Q19 shape (discounted revenue, lite: no p_container in the
  // fixture — the brand/size/quantity bands carry the disjunction):
  // an OR-of-ANDs join predicate. Catalyst extracts the common
  // p_partkey = l_partkey equi-condition so this plans as a hash join
  // with the disjunction as a post-join filter — never a cartesian —
  // and pushes the disjunction of brand/size bands down to the part
  // scan as (brand IN …) ∧ (size range) supersets.
  private val DiscRevenueSql =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // TPC-H Q22 shape (global sales opportunity, lite: grouped by nation
  // key instead of the fixture-absent phone prefix): well-funded
  // customers with no recent orders. Exactness: balances quantize to cents
  // BIGINT per row; the positive-average threshold is ONE double
  // division of two exact integers; NOT EXISTS plans as a left-anti
  // join (the orders side aggregates to distinct custkeys first under
  // AQE). At 100 TB the anti join shuffles only custkeys.
  private val IdleCustomersSql =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM customer),
      |avg_pos AS (
      |  SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS a
      |  FROM c WHERE cents > 0)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM c CROSS JOIN avg_pos
      |WHERE CAST(cents AS DOUBLE) > a
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // The fixture has no partsupp table, so the three queries below that
  // need one (Q2/Q11/Q20) DERIVE it deterministically from part ×
  // supplier inside the query text — identical arithmetic in both
  // engines, so the oracle is still bit-exact and the derived relation
  // behaves like a real ~|part|·|supplier|/5 fact table (4M rows at
  // sf0.1): membership, cost, and availqty are pure integer functions
  // of the keys. At scale the derivation is one cross join the
  // optimizer pushes the WHERE into; a real deployment reads the real
  // table — the query SHAPES (correlated min, group-share threshold,
  // nested semi-join chain) are what these exercise.
  private val PartSuppCte =
    """ps AS (
      |  SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey,
      |    ((p_partkey * 31 + s_suppkey * 17) % 1000000) AS ps_cost_cents,
      |    ((p_partkey * 13 + s_suppkey * 7) % 1000 + 1) AS ps_availqty
      |  FROM part CROSS JOIN supplier
      |  WHERE (p_partkey * 7 + s_suppkey) % 5 = 0)""".stripMargin

  // TPC-H Q2 shape (minimum-cost supplier): for every LARGE part, the
  // EUROPE supplier(s) achieving the minimum derived supply cost — the
  // correlated-min pattern planned as aggregate + re-join (never a
  // per-part subquery). Money/cost is integer cents end-to-end; the
  // LIMIT cutoff orders on (acctbal DESC, nation, supplier, part) —
  // unique per row, so both engines cut identically.
  private val MinCostSupplierSql =
    s"""WITH $PartSuppCte,
       |eu AS (
       |  SELECT ps_partkey, ps_suppkey, ps_cost_cents,
       |    s_acctbal, s_name, n_name
       |  FROM ps
       |  JOIN supplier ON s_suppkey = ps_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE'),
       |mn AS (
       |  SELECT ps_partkey, min(ps_cost_cents) AS min_cost
       |  FROM eu GROUP BY ps_partkey)
       |SELECT s_acctbal, s_name, n_name AS nation, p_partkey,
       |  CAST(ps_cost_cents AS BIGINT) AS cost_cents
       |FROM part
       |JOIN eu ON p_partkey = ps_partkey
       |JOIN mn ON mn.ps_partkey = p_partkey AND ps_cost_cents = min_cost
       |WHERE p_type = 'LARGE'
       |ORDER BY s_acctbal DESC, nation, s_name, p_partkey
       |LIMIT 20""".stripMargin

  // TPC-H Q11 shape (important stock): parts whose derived stock value
  // in one nation exceeds TWICE THE MEAN part value — Q11's fixed
  // fraction divides by |parts| as the table grows, so a literal
  // threshold empties (or floods) at other scales; the mean-relative
  // form is scale-invariant. The cut is the INTEGER comparison
  // val·n > 2·total — no floating point anywhere, exact in both
  // engines; the (total, n) pair is a 1-row broadcast.
  private val ImportantStockSql =
    s"""WITH $PartSuppCte,
       |v AS (
       |  SELECT ps_partkey,
       |    sum(ps_cost_cents * ps_availqty) AS val
       |  FROM ps
       |  JOIN supplier ON s_suppkey = ps_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_3'
       |  GROUP BY ps_partkey)
       |SELECT ps_partkey AS partkey, CAST(val AS BIGINT) AS value_cents
       |FROM v CROSS JOIN (SELECT sum(val) AS tot, count(*) AS n FROM v) t
       |WHERE val * n > 2 * tot
       |ORDER BY value_cents DESC, partkey""".stripMargin

  // TPC-H Q20 shape (excess stock): suppliers in one nation holding
  // more than twice the stock of a red part than they shipped of it in
  // 1997 — the nested semi-join chain (supplier IN (pairs JOIN part
  // JOIN shipped)). The shipped side is a LEFT join with qty
  // defaulting to 0 (a never-shipped stocked part is the extreme
  // excess case), keeping the predicate integer-exact.
  private val ExcessStockSql =
    s"""WITH $PartSuppCte,
       |shipped AS (
       |  SELECT l_partkey, l_suppkey,
       |    sum(CAST(l_quantity AS BIGINT)) AS qty
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY l_partkey, l_suppkey)
       |SELECT s_suppkey, s_name
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_3'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey
       |    FROM ps
       |    JOIN part ON p_partkey = ps_partkey
       |    LEFT JOIN shipped
       |      ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |    WHERE p_name LIKE '%red%'
       |      AND ps_availqty * 2 > coalesce(qty, 0))
       |ORDER BY s_suppkey""".stripMargin

  // TPC-H Q12 shape (shipping modes and priority): dual conditional
  // counts per ship mode over a ship-year window. The fixture carries
  // no l_shipmode, so the mode is DERIVED as an integer function of
  // (l_orderkey, l_linenumber) — same device as the partsupp
  // derivation above; the shape under test is the CASE-pivoted
  // conditional aggregation over a joined year slice (Catalyst plans
  // one shuffle on the 5-value mode key with full map-side combine).
  private val ShipModeSql =
    """SELECT ship_mode,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT o_orderpriority,
      |    CASE (l_orderkey * 3 + l_linenumber) % 5
      |      WHEN 0 THEN 'AIR' WHEN 1 THEN 'MAIL' WHEN 2 THEN 'RAIL'
      |      WHEN 3 THEN 'SHIP' ELSE 'TRUCK' END AS ship_mode
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') t
      |GROUP BY ship_mode
      |ORDER BY ship_mode""".stripMargin

  // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
  // join customer→orders with an extra non-key predicate ON the join
  // (Q13's `o_comment NOT LIKE '%special%requests%'`), then a
  // two-level aggregation — orders per customer, customers per count.
  // The fixture has no o_comment, so the excluded category is DERIVED
  // as an integer function of the keys (same device as the partsupp /
  // ship-mode derivations above): ~1/13 of orders are "special
  // requests" and drop out of the count while the customer row
  // survives with c_count = 0. Both aggregations are pure integer
  // counts — bit-exact in any engine. Scale: the outer join shuffles
  // on custkey; the second groupBy keys on the small distinct-count
  // domain with full map-side combine.
  private val CustDistSql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey
      |    AND (o_orderkey * 11 + o_custkey * 3) % 13 <> 0
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
  // counts per (brand, type, size) over the derived partsupp, with the
  // complained-supplier exclusion (Q16's `s_comment LIKE
  // '%Customer%Complaints%'` becomes a key-derived ~1/7 of suppliers —
  // same device as above) and the brand/type/size NOT-filters. Q16's
  // literal NOT IN would plan NULL-AWARE in Spark (parquet columns are
  // nullable as far as the planner knows → BroadcastNestedLoopJoin —
  // the shape q_sql_not_in deliberately exercises); since the keys are
  // non-null in fact, the exclusion is written as the equivalent
  // correlated NOT EXISTS, which plans as a left-anti hash join in
  // both engines. count(DISTINCT) shuffles (group, suppkey) pairs —
  // never whole rows. All-integer counting, bit-exact.
  private val SupplierCntSql =
    s"""WITH $PartSuppCte
       |SELECT p_brand, p_type, p_size,
       |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM ps
       |JOIN part ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#12'
       |  AND p_type <> 'SMALL'
       |  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM supplier
       |    WHERE s_suppkey = ps_suppkey AND (s_suppkey * 19) % 7 = 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // TPC-H Q21 shape (suppliers who kept orders waiting): the
  // multi-EXISTS / NOT-EXISTS self-join chain on lineitem — for each
  // finished multi-supplier order, the supplier whose line was the
  // ONLY late one. The fixture has no receipt/commit dates, so "late"
  // is DERIVED as a ~1/4 integer function of (orderkey, suppkey,
  // linenumber). Catalyst plans the EXISTS as a left-semi and the
  // NOT EXISTS as a left-anti join on l_orderkey (never per-row
  // subqueries); at 100 TB all three lineitem legs shuffle on the same
  // orderkey key and AQE coalesces. Pure integer counting, bit-exact;
  // the LIMIT cutoff orders on (numwait DESC, s_name) with s_name
  // unique per supplier.
  private val WaitingSupplierSql =
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey,
      |    ((l_orderkey * 7 + l_suppkey * 3 + l_linenumber) % 4 = 0)
      |      AS late
      |  FROM lineitem)
      |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN l l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.late
      |  AND n_name = 'NATION_3'
      |  AND EXISTS (
      |    SELECT 1 FROM l l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM l l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.late)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Verbatim SQL texts, exposed for the catalog-table + CBO rendition
    * (CatalogCboSpec runs the same text against ANALYZEd catalog
    * tables — the session/metastore half of the Hive-shaped surface). */
  private[graft] val texts: Map[String, String] = Map(
    "q_sql_pricing" -> PricingSql,
    "q_sql_top_revenue" -> TopRevenueSql,
    "q_sql_order_priority" -> OrderPrioritySql,
    "q_sql_region_revenue" -> RegionRevenueSql,
    "q_sql_forecast" -> ForecastSql,
    "q_sql_not_in" -> NotInSql,
    "q_sql_recursive" -> RecursiveSql,
    "q_sql_correlated" -> CorrelatedSql,
    "q_sql_big_orders" -> BigOrdersSql,
    "q_sql_volume_shipping" -> VolumeShippingSql,
    "q_sql_market_share" -> MarketShareSql,
    "q_sql_profit" -> ProfitSql,
    "q_sql_returned_items" -> ReturnedItemsSql,
    "q_sql_promo_revenue" -> PromoRevenueSql,
    "q_sql_top_supplier" -> TopSupplierSql,
    "q_sql_small_qty" -> SmallQtyRevenueSql,
    "q_sql_disc_revenue" -> DiscRevenueSql,
    "q_sql_idle_customers" -> IdleCustomersSql,
    "q_sql_min_cost_supplier" -> MinCostSupplierSql,
    "q_sql_important_stock" -> ImportantStockSql,
    "q_sql_excess_stock" -> ExcessStockSql,
    "q_sql_ship_modes" -> ShipModeSql,
    "q_sql_cust_dist" -> CustDistSql,
    "q_sql_supplier_cnt" -> SupplierCntSql,
    "q_sql_waiting_supplier" -> WaitingSupplierSql)

  val defs: Map[String, QueryDef] = Map(
    "q_sql_pricing" -> sqlDef(Seq("lineitem"), PricingSql),
    "q_sql_top_revenue" ->
      sqlDef(Seq("customer", "orders", "lineitem"), TopRevenueSql),
    "q_sql_order_priority" ->
      sqlDef(Seq("orders", "lineitem"), OrderPrioritySql),
    "q_sql_region_revenue" ->
      sqlDef(Seq("region", "nation", "customer", "supplier", "orders",
        "lineitem"), RegionRevenueSql),
    "q_sql_forecast" -> sqlDef(Seq("lineitem"), ForecastSql),
    "q_sql_not_in" -> sqlDef(Seq("orders", "customer"), NotInSql),
    "q_sql_recursive" -> sqlDef(Seq("customer"), RecursiveSql),
    "q_sql_correlated" -> sqlDef(Seq("orders"), CorrelatedSql),
    "q_sql_big_orders" ->
      sqlDef(Seq("customer", "orders", "lineitem"), BigOrdersSql),
    "q_sql_volume_shipping" ->
      sqlDef(Seq("supplier", "lineitem", "orders", "customer", "nation"),
        VolumeShippingSql),
    "q_sql_market_share" ->
      sqlDef(Seq("part", "lineitem", "supplier", "orders", "customer",
        "nation", "region"), MarketShareSql),
    "q_sql_profit" ->
      sqlDef(Seq("part", "lineitem", "supplier", "orders", "nation"),
        ProfitSql),
    "q_sql_returned_items" ->
      sqlDef(Seq("customer", "orders", "lineitem", "nation"),
        ReturnedItemsSql),
    "q_sql_promo_revenue" ->
      sqlDef(Seq("lineitem", "part"), PromoRevenueSql),
    "q_sql_top_supplier" ->
      sqlDef(Seq("supplier", "lineitem"), TopSupplierSql),
    "q_sql_small_qty" ->
      sqlDef(Seq("lineitem", "part"), SmallQtyRevenueSql),
    "q_sql_disc_revenue" ->
      sqlDef(Seq("lineitem", "part"), DiscRevenueSql),
    "q_sql_idle_customers" ->
      sqlDef(Seq("customer", "orders"), IdleCustomersSql),
    "q_sql_min_cost_supplier" ->
      sqlDef(Seq("part", "supplier", "nation", "region"),
        MinCostSupplierSql),
    "q_sql_important_stock" ->
      sqlDef(Seq("part", "supplier", "nation"), ImportantStockSql),
    "q_sql_excess_stock" ->
      sqlDef(Seq("part", "supplier", "nation", "lineitem"),
        ExcessStockSql),
    "q_sql_ship_modes" ->
      sqlDef(Seq("lineitem", "orders"), ShipModeSql),
    "q_sql_cust_dist" ->
      sqlDef(Seq("customer", "orders"), CustDistSql),
    "q_sql_supplier_cnt" ->
      sqlDef(Seq("part", "supplier"), SupplierCntSql),
    "q_sql_waiting_supplier" ->
      sqlDef(Seq("supplier", "lineitem", "orders", "nation"),
        WaitingSupplierSql)
  )
}
