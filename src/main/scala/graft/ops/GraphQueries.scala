package graft.ops

import org.apache.spark.sql.functions._

import graft.oracle.{DuckSql, SparkSql}
import graft.{QueryDef, ScratchCache, Tables}

/** Iterative graph analytics over a co-purchase graph — the second
  * iterative-DAG shape after q_kmeans (driver-side loop bound, data
  * never leaves the cluster) and q_dedup_cluster (connected
  * components). PageRank is the canonical "repeated shuffle on a fixed
  * edge relation" workload the reference's session mode exists to serve
  * (reusable DAGs / shared edges across stages —
  * tez-api/src/main/java/org/apache/tez/client/TezClient.java:95 session
  * mode; vertex-to-vertex edge reuse in the DAG API).
  *
  * Graph: parts are nodes; an edge (a, b) exists when parts a and b
  * appear in the SAME order (co-purchase). The edge relation is built
  * once with one self-join on l_orderkey — per-order fan-out is bounded
  * by order size (~4 lines), so the join output is ~|lineitem| × avg
  * order size, never quadratic in the table. Edges are symmetric by
  * construction, so every node has in-edges and out-edges (no dangling
  * ranks).
  *
  * Scale shape: the edge+degree relation is computed once and
  * scratch-cached (at 100 TB: written bucketed by src so every
  * iteration's join is co-located, exchange-free on the edge side).
  * Each round is exactly one join (ranks ⋈ edges on src — ranks is the
  * small, shuffling side) and one map-combinable groupBy(dst) sum. The
  * driver loop holds NOTHING but the round counter — fixed `Iters`
  * rounds, no convergence collect.
  *
  * Exactness: pure BIGINT arithmetic end-to-end. Ranks are scaled by
  * 1e6; each round computes rank' = floor(0.15·1e6) + floor(85 ·
  * Σ floor(rank_src / deg_src) / 100) with integer division at every
  * step — BIGINT sums are order-independent, so both engines agree
  * bit-for-bit. The DuckDB oracle unrolls the same rounds as CTEs.
  */
object GraphQueries {

  private val Scale = 1000000L
  private val Iters = 3
  /** floor(0.15 * Scale) — the teleport mass per node. */
  private val Teleport = 150000L

  val defs: Map[String, QueryDef] = Map(
    "q_pagerank" -> QueryDef(
      (s, d) => {
        // edge generation WITHOUT a self-join: group each order's parts
        // into a set (collect_set dedups per order — one shuffle of the
        // 2-column projection) and explode the per-order pairs map-side.
        // Per-order fan-out is bounded by order size, so the generator
        // is cheap and never quadratic in the table.
        val byOrder = Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey")
          .groupBy("l_orderkey")
          .agg(collect_set(col("l_partkey")).as("parts"))
        val edges = byOrder
          .select(explode(col("parts")).as("src"), col("parts"))
          .select(col("src"), explode(col("parts")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        // (src, dst, deg) cached once, HASH-PARTITIONED ON src: the
        // cached distribution satisfies each round's join requirement
        // (at 100 TB: write the edge table bucketed by src for the same
        // effect across jobs). Ranks come out of each round partitioned
        // by the grouping key, so iterations settle into one reduced
        // shuffle per round: join (no exchange) → map-side partial sum
        // → |nodes|-sized final aggregate.
        val edgeDeg = ScratchCache.scratch(
          edges.join(deg, "src").repartition(col("src")))
        // the graph is symmetric (co-purchase), so every node has
        // in-edges and receives contributions each round — no dangling
        // mass, no per-round left join against a node list. r0 rides
        // deg's distribution (deg's keys ARE the nodes).
        var ranks = deg.select(col("src").as("id"), lit(Scale).as("rank"))
        for (_ <- 1 to Iters) {
          ranks = edgeDeg
            .join(ranks, col("src") === col("id"))
            .select(col("dst"), expr("rank div deg").as("c"))
            .groupBy("dst").agg(sum("c").as("c"))
            .selectExpr("dst AS id", s"$Teleport + (85 * c) div 100 AS rank")
        }
        ranks.selectExpr("id AS part_key", "rank")
          .orderBy(desc("rank"), col("part_key"))
      }, {
        def round(out: String, prev: String): String =
          s"""$out AS (
             |  SELECT n.id,
             |    $Teleport + ${DuckSql.idiv("(85 * COALESCE(s.c, 0))", "100")} AS rank
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst, CAST(sum(${DuckSql.idiv("r.rank", "d.deg")}) AS BIGINT) AS c
             |    FROM edges e
             |    JOIN $prev r ON r.id = e.src
             |    JOIN deg d ON d.src = e.src
             |    GROUP BY e.dst
             |  ) s ON s.dst = n.id
             |)""".stripMargin
        val rounds = (1 to Iters).map(i => round(s"r$i", s"r${i - 1}"))
          .mkString(",\n")
        s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           |edges AS (
           |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
           |  WHERE a.l_partkey <> b.l_partkey
           |),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |r0 AS (SELECT id, CAST($Scale AS BIGINT) AS rank FROM nodes),
           |$rounds
           |SELECT id AS part_key, rank FROM r$Iters
           |ORDER BY rank DESC, part_key""".stripMargin
      })
  )
}
