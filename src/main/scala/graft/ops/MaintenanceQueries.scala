package graft.ops

import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}

import graft.oracle.{Dialect, DuckSql, SparkSql}
import graft.{QueryDef, Tables}

/** Table-maintenance family — the lakehouse upkeep operators a
  * long-lived 100 TB corpus needs on top of query execution (extension
  * mandate; the write-side siblings are WriteEvolutionSpec and
  * CompactionSpec):
  *
  *  - q_upsert_merge: CDC merge — apply a change batch
  *    (updates / deletes / inserts keyed on the primary key) to a base
  *    table in one pass, with per-status accounting of the merged
  *    state. The MERGE INTO semantics, expressed as key-joins.
  *  - q_zorder_cluster: Z-order (Morton) multi-dimensional clustering —
  *    interleave the bits of two filter dimensions into one sort key;
  *    per-z-bucket min/max bounding boxes are exactly the row-group
  *    skipping statistics a scan uses, and their tightness IS the
  *    data-skipping win.
  */
object MaintenanceQueries {

  /** Synthetic-insert key offset (far above any fixture key range). */
  private val InsOff = 1000000000000L

  /** Bits per dimension and the fixed z-bucket count. Buckets divide
    * the OBSERVED z range into ZBuckets equal spans, so the layout
    * (and the declared output size) is scale-invariant: the fixture's
    * small key ranges and a 100 TB table's full 32-bit z space both
    * yield ZBuckets rows. */
  private val DimBits = 16
  private val ZBuckets = 64L

  /** Morton interleave of the low DimBits of a and b: a's bit i lands
    * at 2i, b's at 2i+1. The per-bit terms occupy DISJOINT bit
    * positions, so plain addition assembles the word — both engines
    * evaluate identical BIGINT shift/mask/add chains (codegen'd on the
    * Spark side). */
  private def zInterleave(d: Dialect, a: String, b: String): String = {
    val terms = (0 until DimBits).flatMap { i =>
      Seq(
        d.shiftL(s"(${d.shiftR(a, i.toString)} & 1)", (2 * i).toString),
        d.shiftL(s"(${d.shiftR(b, i.toString)} & 1)", (2 * i + 1).toString))
    }
    s"(${terms.mkString(" + ")})"
  }

  def defs: Map[String, QueryDef] = Map(

    // CDC MERGE — the nightly-ingest upsert: a change batch carrying
    // updates (key % 7 = 0 → price doubled), deletes (key % 13 = 0,
    // delete wins over update on overlap) and inserts (fresh keys) is
    // applied to the base in ONE pass; output is the merged state's
    // per-status row count / money sum / change accounting. Money goes
    // through the cents = floor(v*100 + 0.5) BIGINT quantization, so
    // every aggregate is order-independent integer arithmetic.
    //
    // Scale shape: the merge is key-equi-joins (one shuffle; a real
    // change batch is tiny vs the base → AQE broadcasts it), and the
    // rewrite side pairs with dynamic partition overwrite
    // (WriteEvolutionSpec) so only touched partitions rewrite.
    "q_upsert_merge" -> QueryDef(
      (s, d) => {
        val base = Tables.orders(s, d).selectExpr(
          "o_orderkey", "o_orderstatus",
          "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents")
        val upd = base.filter(col("o_orderkey") % 7 === 0)
          .selectExpr("o_orderkey", "(cents * 2) AS new_cents")
        val del = base.filter(col("o_orderkey") % 13 === 0)
          .select(col("o_orderkey"), lit(1).as("is_del"))
        val ins = base.filter(col("o_orderkey") % 11 === 3)
          .selectExpr(s"o_orderkey + ${InsOff}L AS o_orderkey",
            "o_orderstatus", "cents",
            "CAST(0 AS BIGINT) AS was_upd", "CAST(1 AS BIGINT) AS was_ins")
        val survivors = base
          .join(upd, Seq("o_orderkey"), "left")
          .join(del, Seq("o_orderkey"), "left")
          .filter(col("is_del").isNull)
          .selectExpr("o_orderkey", "o_orderstatus",
            "coalesce(new_cents, cents) AS cents",
            "CAST(CASE WHEN new_cents IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS was_upd",
            "CAST(0 AS BIGINT) AS was_ins")
        survivors.unionByName(ins)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"),
            sum("cents").as("sum_cents"),
            sum("was_upd").as("n_updated"),
            sum("was_ins").as("n_inserted"))
          .orderBy("o_orderstatus")
      },
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |upd AS (
         |  SELECT o_orderkey, (cents * 2) AS new_cents
         |  FROM base WHERE o_orderkey % 7 = 0),
         |del AS (
         |  SELECT o_orderkey, 1 AS is_del FROM base WHERE o_orderkey % 13 = 0),
         |ins AS (
         |  SELECT o_orderkey + $InsOff AS o_orderkey, o_orderstatus, cents,
         |    CAST(0 AS BIGINT) AS was_upd, CAST(1 AS BIGINT) AS was_ins
         |  FROM base WHERE o_orderkey % 11 = 3),
         |survivors AS (
         |  SELECT b.o_orderkey, b.o_orderstatus,
         |    coalesce(u.new_cents, b.cents) AS cents,
         |    CAST(CASE WHEN u.new_cents IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS was_upd,
         |    CAST(0 AS BIGINT) AS was_ins
         |  FROM base b
         |  LEFT JOIN upd u ON b.o_orderkey = u.o_orderkey
         |  LEFT JOIN del x ON b.o_orderkey = x.o_orderkey
         |  WHERE x.is_del IS NULL),
         |merged AS (
         |  SELECT * FROM survivors UNION ALL SELECT * FROM ins)
         |SELECT o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  CAST(sum(was_upd) AS BIGINT) AS n_updated,
         |  CAST(sum(was_ins) AS BIGINT) AS n_inserted
         |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // SNAPSHOT DIFF — the inverse of the upsert: given two table
    // versions (v1 = the base, v2 = the base with q_upsert_merge's
    // change rules applied), classify every key as added / deleted /
    // changed / unchanged in ONE full-outer key join and report the
    // per-class row counts and money movement. This is the
    // table-maintenance audit every incremental pipeline runs after a
    // merge (and the CDC-extraction direction: diffing two snapshots
    // RECOVERS the change batch).
    //
    // Scale shape: one full-outer sort-merge join on the primary key —
    // both sides shuffle once on o_orderkey (on a bucketed table:
    // exchange-free); the classification is a map-side CASE and the
    // per-class rollup is a 4-key map-combinable aggregate. Money is
    // cents-quantized BIGINT, so the deltas are exact.
    "q_snapshot_diff" -> QueryDef(
      (s, d) => {
        val v1 = Tables.orders(s, d).selectExpr(
          "o_orderkey",
          "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS old_cents")
        val v2Base = Tables.orders(s, d).selectExpr(
          "o_orderkey",
          "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents")
        val v2 = v2Base
          .filter(col("o_orderkey") % 13 =!= 0)
          .selectExpr("o_orderkey",
            "CASE WHEN o_orderkey % 7 = 0 THEN cents * 2 ELSE cents END AS new_cents")
          .unionByName(v2Base.filter(col("o_orderkey") % 11 === 3)
            .selectExpr(s"o_orderkey + ${InsOff}L AS o_orderkey",
              "cents AS new_cents"))
        v1.join(v2, Seq("o_orderkey"), "full_outer")
          .selectExpr(
            """CASE WHEN old_cents IS NULL THEN 'added'
              |     WHEN new_cents IS NULL THEN 'deleted'
              |     WHEN old_cents <> new_cents THEN 'changed'
              |     ELSE 'unchanged' END AS diff_status""".stripMargin,
            "coalesce(old_cents, 0) AS oc", "coalesce(new_cents, 0) AS nc")
          .groupBy("diff_status")
          .agg(count(lit(1)).as("n_rows"),
            sum("oc").as("sum_old_cents"),
            sum("nc").as("sum_new_cents"))
          .selectExpr("diff_status", "n_rows", "sum_old_cents",
            "sum_new_cents", "(sum_new_cents - sum_old_cents) AS delta_cents")
          .orderBy("diff_status")
      },
      s"""WITH v1 AS (
         |  SELECT o_orderkey,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS old_cents
         |  FROM orders),
         |b AS (
         |  SELECT o_orderkey,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |v2 AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 7 = 0 THEN cents * 2 ELSE cents END AS new_cents
         |  FROM b WHERE o_orderkey % 13 <> 0
         |  UNION ALL
         |  SELECT o_orderkey + $InsOff AS o_orderkey, cents AS new_cents
         |  FROM b WHERE o_orderkey % 11 = 3),
         |diff AS (
         |  SELECT CASE WHEN v1.old_cents IS NULL THEN 'added'
         |              WHEN v2.new_cents IS NULL THEN 'deleted'
         |              WHEN v1.old_cents <> v2.new_cents THEN 'changed'
         |              ELSE 'unchanged' END AS diff_status,
         |    coalesce(v1.old_cents, 0) AS oc, coalesce(v2.new_cents, 0) AS nc
         |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
         |SELECT diff_status, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(oc) AS BIGINT) AS sum_old_cents,
         |  CAST(sum(nc) AS BIGINT) AS sum_new_cents,
         |  CAST(sum(nc) - sum(oc) AS BIGINT) AS delta_cents
         |FROM diff GROUP BY diff_status ORDER BY diff_status""".stripMargin),

    // DATA-PROFILING HISTOGRAM — the ANALYZE-statistics operator: an
    // equi-width 32-bucket histogram of lineitem money (cents) over the
    // OBSERVED [min, max], with per-bucket counts and actual bounds.
    // This is the statistics table a cost-based optimizer consumes
    // (Spark's ANALYZE TABLE ... FOR COLUMNS computes the same shape;
    // the reference surfaces the analog through its counter/analyzer
    // tooling, tez-tools/analyzers/). Exposing it as a QUERY makes the
    // profiling pass itself a first-class, oracle-checked operator.
    //
    // Scale shape: one bounded (min, max) scalar broadcast (the kmeans
    // / zorder pattern), then a map-side bucket assignment and a
    // 32-key map-combinable aggregate — one corpus scan, one tiny
    // shuffle, scale-invariant output. All arithmetic is BIGINT:
    // bucket = ((c - mn) * 32) div (mx - mn + 1).
    "q_profile_histogram" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{broadcast, max, min}
        val cents = Tables.lineitem(s, d).selectExpr(
          "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c")
        val bounds = cents.agg(min("c").as("mn"), max("c").as("mx"))
        cents.crossJoin(broadcast(bounds))
          .selectExpr("c", "(((c - mn) * 32) div (mx - mn + 1)) AS bucket")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("c").as("min_cents"), max("c").as("max_cents"))
          .orderBy("bucket")
      },
      """WITH cents AS (
        |  SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM lineitem),
        |b AS (SELECT min(c) AS mn, max(c) AS mx FROM cents)
        |SELECT (((c - mn) * 32) // (mx - mn + 1)) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(c) AS min_cents, max(c) AS max_cents
        |FROM cents, b
        |GROUP BY 1 ORDER BY bucket""".stripMargin),

    // Z-ORDER CLUSTERING — the multi-dimensional data-skipping layout:
    // Morton-interleave (l_partkey, l_suppkey) into one z key, bucket
    // by the z prefix (the "file" a z-sorted write would produce), and
    // report each bucket's per-dimension min/max bounding box. Tight
    // boxes on BOTH dimensions are the point: a scan filtering on
    // EITHER dimension prunes buckets by these min/max stats, which a
    // single-column sort only provides for its leading column.
    //
    // Scale shape: z is computed map-side (pure shift/mask codegen);
    // one bounded scalar (max z — the kmeans/seq_pack pattern) sizes
    // the equal-span buckets; the bucket aggregate is one
    // map-combinable shuffle keyed on ZBuckets values. At 100 TB the
    // same z key feeds repartitionByRange(z) + sortWithinPartitions
    // before the write — this query materializes the skipping
    // statistics that layout earns.
    "q_zorder_cluster" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{broadcast, max, min}
        val dl = SparkSql
        val mask = (1L << DimBits) - 1
        val z = zInterleave(dl, "(l_partkey & " + mask + ")", "(l_suppkey & " + mask + ")")
        val zed = Tables.lineitem(s, d)
          .selectExpr(
            s"(l_partkey & $mask) AS pa",
            s"(l_suppkey & $mask) AS sb",
            s"$z AS z")
        val zmax = zed.agg(max("z").as("z_max"))
        zed.crossJoin(broadcast(zmax))
          .selectExpr("pa", "sb", s"((z * $ZBuckets) div (z_max + 1)) AS z_bucket")
          .groupBy("z_bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("pa").as("min_part"), max("pa").as("max_part"),
            min("sb").as("min_supp"), max("sb").as("max_supp"))
          .selectExpr("z_bucket", "n_rows", "min_part", "max_part",
            "min_supp", "max_supp",
            "((max_part - min_part + 1) * (max_supp - min_supp + 1)) AS bbox_area")
          .orderBy("z_bucket")
      }, {
        val dl = DuckSql
        val mask = (1L << DimBits) - 1
        val z = zInterleave(dl, "(l_partkey & " + mask + ")", "(l_suppkey & " + mask + ")")
        s"""WITH zed AS (
           |  SELECT (l_partkey & $mask) AS pa, (l_suppkey & $mask) AS sb,
           |    $z AS z
           |  FROM lineitem),
           |zm AS (SELECT max(z) AS z_max FROM zed),
           |bucketed AS (
           |  SELECT pa, sb, ((z * $ZBuckets) // (z_max + 1)) AS z_bucket
           |  FROM zed, zm)
           |SELECT z_bucket, CAST(count(*) AS BIGINT) AS n_rows,
           |  min(pa) AS min_part, max(pa) AS max_part,
           |  min(sb) AS min_supp, max(sb) AS max_supp,
           |  ((max(pa) - min(pa) + 1) * (max(sb) - min(sb) + 1)) AS bbox_area
           |FROM bucketed GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
      }))
}
