package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{QueryDef, Tables}

/** Join operator family — the reference's richest surface (SURVEY.md §2c).
  *
  * Reference → Spark physical mapping:
  *  - shuffled hash join: HashJoinExample with both sides on unordered
  *    partitioned edges + in-memory HashMap build (tez-examples/.../
  *    HashJoinExample.java:74,143-256) → `SHUFFLE_HASH` hint
  *    (ShuffledHashJoinExec).
  *  - broadcast hash join: small side on a BROADCAST edge
  *    (HashJoinExample.java:234-239, UnorderedKVEdgeConfig) → `broadcast()`
  *    (BroadcastHashJoinExec).
  *  - sort-merge join: both sides on ordered-partitioned edges with
  *    co-advancing KeyValuesReaders (tez-examples/.../
  *    SortMergeJoinExample.java:188-300) → `MERGE` hint (SortMergeJoinExec).
  *  - anti/semi: JoinValidate's co-grouped symmetric difference
  *    (tez-examples/.../JoinValidate.java:228-262) → left_anti / left_semi.
  *  - cartesian: the cartesian-product CUSTOM edge package
  *    (tez-runtime-library/.../cartesianproduct/, 12 files) + JoinProcessor
  *    filter (tez-examples/.../CartesianProduct.java:112-186) → `crossJoin`
  *    + `filter`.
  *  - broadcast scalar: BroadcastAndOneToOneExample (tez-tests/.../
  *    BroadcastAndOneToOneExample.java:58-150) → broadcast of a 1-row
  *    aggregate crossed into the stream side.
  *
  * Scale notes (100 TB): orders⋈customer and lineitem⋈orders are
  * big×big — shuffled joins on the join key (hash for point lookups,
  * merge when output feeds a downstream sort), with AQE handling skew
  * (FairShuffleVertexManager parity). nation/region are tiny dims →
  * always broadcast, never shuffle the fact side.
  */
object JoinQueries {

  val defs: Map[String, QueryDef] = Map(
    // The ZERO-SHUFFLE recurring join (Tez custom-edge / Hive bucketed
    // mapjoin parity, the daily-pipeline shape): lineitem and orders are
    // materialized ONCE as catalog tables bucketed+sorted by the join
    // key (graft.sources.Bucketing — at 100 TB this one-time write-side
    // cost replaces the recurring multi-TB shuffle), then the declared
    // join runs with NO exchange on either side — visible as the low
    // exchange count in the plan-audit artifact, and pinned
    // structurally in BucketingSpec. Broadcast is disabled for the run
    // so the co-located sort-merge path (not a broadcast of the
    // fixture-tiny orders side) is what executes — at real scale
    // neither side is broadcastable anyway. The oracle is the plain
    // join on the raw parquet: bucketing must be invisible to results.
    "q_bucketed_join" -> QueryDef(
      (s, d) => {
        val sfx = new java.io.File(d).getName.replace('.', '_')
        val lt = s"graft_lineitem_b_$sfx"
        val ot = s"graft_orders_b_$sfx"
        // the in-memory catalog forgets tables across JVMs but their
        // warehouse dirs persist — clear both before writing
        val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        def rmrf(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmrf)
          f.delete(): Unit
        }
        Seq(lt, ot).foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          rmrf(new java.io.File(s"$wh/$t"))
        }
        graft.sources.Bucketing.writeBucketed(
          Tables.lineitem(s, d)
            .selectExpr("l_orderkey", "l_extendedprice", "l_discount"),
          lt, "l_orderkey", 8)
        graft.sources.Bucketing.writeBucketed(
          Tables.orders(s, d)
            .selectExpr("o_orderkey AS l_orderkey", "o_orderpriority"),
          ot, "l_orderkey", 8)
        // MERGE hint (plan-embedded, unlike a lazily-read conf): forces
        // the co-located sort-merge path over a fixture-scale broadcast
        s.table(lt).join(s.table(ot).hint("MERGE"), "l_orderkey")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))" +
              " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // Big×big equi-join, hash variant (no sort needed on either side).
    "q_hash_join_inner" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d).hint("SHUFFLE_HASH")
        val c = Tables.customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select("o_orderkey", "o_totalprice", "c_custkey", "c_name")
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_totalprice, c_custkey, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin),

    // Dim-table broadcast chain: fact side never shuffles.
    "q_broadcast_join" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select("c_custkey", "c_name", "n_name", "r_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin),

    // Big×big equi-join, merge variant + downstream aggregation.
    "q_sort_merge_join" -> QueryDef(
      (s, d) => {
        val l = Tables.lineitem(s, d).hint("MERGE")
        val o = Tables.orders(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_lines"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType)
              .as("sum_price"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // JoinValidate's "missing key" side: customers with no high-value
    // orders (the filter keeps the anti side non-empty at every SF).
    "q_left_anti" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    "q_left_semi" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    // Cartesian product with a theta filter (CartesianProductFilter hook).
    // Bounded dims only — an unfiltered 100 TB cross join is never the plan.
    "q_cross_product" -> QueryDef(
      (s, d) => {
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        n.crossJoin(r)
          .filter(col("n_regionkey") =!= col("r_regionkey"))
          .select("n_nationkey", "n_name", "r_regionkey", "r_name")
          .orderBy("n_nationkey", "r_regionkey")
      },
      """SELECT n_nationkey, n_name, r_regionkey, r_name
        |FROM nation CROSS JOIN region
        |WHERE n_regionkey <> r_regionkey
        |ORDER BY n_nationkey, r_regionkey""".stripMargin),

    // Big×big PARTITIONED theta join — the reference's partitioned
    // cartesian-product edge for non-tiny inputs
    // (tez-runtime-library/.../cartesianproduct/CartesianProductVertexManager.java:62,224
    // routes partition pairs; CartesianProduct.java:79,112-143 applies the
    // filter per pair). Spark-first rendition: the inequality
    // |o_totalprice − c_acctbal| ≤ W is banded into an EQUI-join on
    // floor(value/W) buckets — the customer side probes buckets
    // {b−1, b, b+1}, so a qualifying pair matches exactly one probe row
    // (no dedup) and NO unfiltered cartesian of the full inputs ever
    // materializes. 15k × 150k here; at 100 TB the bucket key keeps both
    // sides hash-partitioned and the pair count bounded by band density,
    // which is the same contract the reference's partitioned edge gives.
    "q_theta_band" -> QueryDef(
      (s, d) => {
        val W = 100
        val c = Tables.customer(s, d)
          .selectExpr("c_custkey", "c_acctbal",
            s"CAST(floor(c_acctbal / $W) AS BIGINT) AS cb")
        val probes = Seq("cb - 1", "cb", "cb + 1").map(pb =>
          c.selectExpr("c_custkey", "c_acctbal", s"($pb) AS bucket"))
          .reduce(_ unionAll _)
        val o = Tables.orders(s, d)
          .selectExpr("o_orderkey", "o_totalprice",
            s"CAST(floor(o_totalprice / $W) AS BIGINT) AS bucket")
        probes.join(o, Seq("bucket"))
          .filter(abs(col("o_totalprice") - col("c_acctbal")) <= W)
          .groupBy("c_custkey")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
              .as("sum_price"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM customer c JOIN orders o
        |  ON abs(o.o_totalprice - c.c_acctbal) <= 100
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    // Broadcast of a scalar aggregate into a parallel stream
    // (BroadcastAndOneToOneExample shape): rows above the global mean.
    // avg(l_quantity) is exact (whole-number doubles), so the predicate is
    // engine-stable.
    "q_broadcast_scalar" -> QueryDef(
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val avgQty = l.agg(avg("l_quantity").as("avg_qty"))
        l.crossJoin(broadcast(avgQty))
          .filter(col("l_quantity") > col("avg_qty") * 1.9)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      },
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem) * 1.9
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),

    // Multi-way join (TPC-H Q10 shape): fact⋈fact⋈dim⋈dim with mixed
    // join strategies — Catalyst broadcasts nation/customer-side dims
    // and shuffles the lineitem⋈orders spine; join order is the
    // optimizer's, not ours (the declarative-DAG thesis of SURVEY §0).
    // Revenue is summed in DECIMAL: the per-row double product is
    // deterministic, the decimal sum is order-independent, and the cast
    // back to DOUBLE happens once.
    "q_multi_join" -> QueryDef(
      (s, d) => {
        val rev = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .filter("o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'" +
            " AND l_returnflag = 'R'")
          .withColumn("rev", expr(rev))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(sum("rev").cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(100)
      },
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 100""".stripMargin),

    // The salted skew join as a DECLARED query (SkewSpec asserts
    // plan-level equality separately; this puts the rewrite itself under
    // the DuckDB oracle): salting is pure re-partitioning, so the result
    // equals the plain join bit-for-bit. l_quantity is whole-number
    // DOUBLE (≤ 50), so the plain sum is order-independent and exact.
    "q_salted_join" -> QueryDef(
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .selectExpr("l_suppkey AS suppkey", "l_quantity")
        val small = Tables.supplier(s, d)
          .selectExpr("s_suppkey AS suppkey", "s_name")
        SkewJoin.saltedInnerJoin(big, small, "suppkey", 16)
          .groupBy("s_name")
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
          .orderBy("s_name")
      },
      """SELECT s_name, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin),

    // TYPED COGROUP — arbitrary per-key code over two co-grouped
    // inputs, the JoinValidate / secondary-sort PROCESSOR shape
    // (tez-examples/.../JoinValidate.java:228-262 consumes two
    // KeyValuesReaders per key and runs imperative logic between them;
    // tez-examples/.../SecondarySortExample reads value-sorted groups).
    // Each order's lineitem cents are SORTED in task code and folded
    // into an order-dependent rolling checksum — logic a plain
    // join+agg cannot express (the fold is non-commutative), so this
    // genuinely exercises KeyValueGroupedDataset.cogroup, Spark's
    // per-key imperative escape hatch.
    //
    // Scale shape: one shuffle per side on the key (identical to a
    // sort-merge join's movement); per-key state is one order's lines
    // (bounded by order size, ~4), streamed by the iterator —
    // nothing driver-side, nothing unbounded. The oracle reproduces
    // the fold with list(cents ORDER BY cents) + list_reduce over the
    // same BIGINT arithmetic.
    "q_cogroup" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val M = graft.oracle.Dialect.M
        val os = Tables.orders(s, d)
          .selectExpr("o_orderkey", "o_orderstatus").as[(Long, String)]
        val ls = Tables.lineitem(s, d)
          .selectExpr("l_orderkey",
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
          .as[(Long, Long)]
        os.groupByKey(_._1).cogroup(ls.groupByKey(_._1)) { (k, oIt, lIt) =>
          val orders = oIt.toSeq
          if (orders.isEmpty) Iterator.empty
          else {
            val cents = lIt.map(_._2).toArray.sorted
            val checksum =
              cents.foldLeft(0L)((acc, c) => (acc * 31 + c) % M)
            Iterator((k, orders.head._2, cents.length.toLong, checksum))
          }
        }.toDF("o_orderkey", "o_orderstatus", "n_lines", "checksum")
          .orderBy("o_orderkey")
      }, {
        val dl = graft.oracle.DuckSql
        val fold = dl.foldBig(
          "list(cents ORDER BY cents) FILTER (WHERE cents IS NOT NULL)",
          "acc", "c", s"(acc * 31 + c) % ${graft.oracle.Dialect.M}")
        s"""WITH li AS (
           |  SELECT l_orderkey,
           |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
           |  FROM lineitem)
           |SELECT o.o_orderkey, o.o_orderstatus,
           |  CAST(count(li.cents) AS BIGINT) AS n_lines,
           |  CAST($fold AS BIGINT) AS checksum
           |FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
           |GROUP BY o.o_orderkey, o.o_orderstatus
           |ORDER BY o.o_orderkey""".stripMargin
      })
  )
}
