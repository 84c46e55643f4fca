package graft.ops

import org.apache.spark.sql.functions._

import graft.oracle.{Dialect, DuckSql, SparkSql}
import graft.{QueryDef, ScratchCache, Tables}

/** Bounded-state sketch operators under a BIT-EXACT oracle.
  *
  * The reference's counter/statistics surface
  * (tez-api/src/main/java/org/apache/tez/common/counters/TaskCounter.java:26)
  * feeds runtime decisions from O(1)-size summaries of unbounded streams;
  * the analytics analog is the sketch family. Spark ships HLL++
  * (`approx_count_distinct`, exercised rows-only by q_approx_distinct —
  * its internals differ from DuckDB's sketch so no cross-engine oracle
  * can exist for it). This family closes that gap the same way
  * q_heavy_hitters closed it for Misra–Gries: implement the textbook
  * sketch from deterministic integer arithmetic generated for BOTH
  * engines from one Scala fragment builder, so the DuckDB gate checks
  * the sketch bit-for-bit, not "close enough".
  *
  * - q_hll_distinct: a real HyperLogLog (Flajolet et al. 2007) —
  *   m = 64 registers, register index and rank from two independent
  *   deterministic hashes, rank = leading-zero count via `length(bin(x))`
  *   (identical no-padding semantics in both engines). The register →
  *   sum(2^-M_j) step stays in BIGINT by scaling with 2^40 (every term
  *   2^(40-M_j) is an integer; M_j ≤ 30), so accumulation order cannot
  *   matter; ONE double division produces the estimate. The exact
  *   distinct count rides along as the error witness.
  * - q_cms_topk: a Count-Min sketch (Cormode & Muthukrishnan 2005) —
  *   depth 3 × width 32 (forced collisions at fixture vocab so the
  *   min-over-rows step is actually load-bearing), point queries for
  *   every vocabulary token, top-20 by estimate with the exact count
  *   alongside (CMS guarantees est ≥ exact; CmsSketchSpec asserts it).
  *
  * Scale (100 TB): both sketches are map-combinable aggregations over
  * CONSTANT state — 64 registers / 96 cells per group regardless of
  * input rows. The HLL shuffle carries at most groups×64 register rows;
  * the CMS shuffle carries 96 cells plus the vocabulary-bounded exact
  * recount (same shape q_heavy_hitters already proved). Nothing is
  * collected to the driver; no all-pairs shapes.
  */
object SketchQueries {

  /** HLL parameters: m = 2^6 registers; ranks live in the hash's upper
    * 24 bits, so sums scale exactly by 2^30. */
  private val HllM = 64
  private val HllScalePow = 30
  private val HllScale = 1L << HllScalePow // 2^30

  /** alpha_64 * m^2 * 2^30 as one pre-rounded double literal embedded in
    * both texts (0.709 * 4096.0 rounds once; the 2^30 scaling is
    * exponent-only, so both engines parse the identical double). */
  private val HllAlphaNum: String = {
    val v = 0.709 * 4096.0 * HllScale.toDouble
    java.lang.Double.toString(v)
  }

  /** (register-index expr, rank expr) over column `l_partkey`.
    *
    * The standard HLL split — ONE hash, low bits pick the register,
    * leading zeros of the high bits give the rank. Two affine hashes of
    * the same key would be useless here (an affine map of an affine map
    * mod the same prime is affine: register and rank would be perfectly
    * correlated, and the measured estimate was 2.8× off); the quadratic
    * term breaks that. The quadratic map collides only on key pairs
    * summing to M - 48271 ≈ 1e9, unreachable for fixture keys, so it
    * stays injective where it matters. Rank = leading zeros within the
    * 24-bit quotient + 1 = 25 - bit_length, via `length(bin(x))` —
    * identical no-padding semantics in both engines (bin(0) = '0' →
    * rank 24 by shared construction). Pure BIGINT arithmetic: k² < 1e18,
    * diffusion multiply < 7e13, both inside the 2^63 envelope.
    */
  private def hllPartsFor(d: Dialect): (String, String) = {
    val k = s"(l_partkey % ${Dialect.M})"
    val h = s"(((($k * $k + 48271 * $k + 11) % ${Dialect.M}) * 69621 + 12582917) % ${Dialect.M})"
    val reg = s"($h % $HllM)"
    val rho = s"(25 - length(bin(${d.idiv(h, HllM.toString)})))"
    (reg, rho)
  }

  /** 2^(40 - M_j) for a register value column m (BIGINT in both). */
  private def regTerm(d: Dialect): String =
    d.shiftL("CAST(1 AS BIGINT)", s"($HllScalePow - m)")

  // ---- Count-Min sketch parameters ----
  private val CmsW = 32
  /** Three pairwise-independent-ish rows derived from one polyHash. */
  private val CmsRows: Seq[(Int, Long, Long)] =
    Seq((0, 131L, 7L), (1, 48271L, 11L), (2, 69621L, 1299709L))

  private def cmsBucket(aMul: Long, bAdd: Long): String =
    s"(((ph * $aMul + $bAdd) % ${Dialect.M}) % $CmsW)"

  val defs: Map[String, QueryDef] = Map(
    "q_hll_distinct" -> QueryDef(
      (s, dir) => {
        val (reg, rho) = hllPartsFor(SparkSql)
        val li = Tables.lineitem(s, dir)
        val regs = li
          .selectExpr("l_returnflag", s"$reg AS reg", s"$rho AS rho")
          .groupBy("l_returnflag", "reg")
          .agg(max("rho").as("m"))
        val hll = regs
          .groupBy("l_returnflag")
          .agg(
            expr(s"CAST(sum(${regTerm(SparkSql)}) AS BIGINT)").as("s_present"),
            count(lit(1)).as("n_present"))
        val exact = li
          .groupBy("l_returnflag")
          .agg(
            countDistinct("l_partkey").as("exact_parts"),
            count(lit(1)).as("n_rows"))
        hll
          .join(broadcast(exact), "l_returnflag")
          .selectExpr(
            "l_returnflag",
            s"$HllAlphaNum / CAST(s_present + ($HllM - n_present) * $HllScale AS DOUBLE) AS hll_estimate",
            s"CAST($HllM - n_present AS BIGINT) AS n_zero_registers",
            "exact_parts",
            "n_rows")
          .orderBy("l_returnflag")
      }, {
        val (reg, rho) = hllPartsFor(DuckSql)
        s"""WITH regs AS (
           |  SELECT l_returnflag, $reg AS reg, max($rho) AS m
           |  FROM lineitem GROUP BY 1, 2
           |), hll AS (
           |  SELECT l_returnflag,
           |    CAST(sum(${regTerm(DuckSql)}) AS BIGINT) AS s_present,
           |    count(*) AS n_present
           |  FROM regs GROUP BY 1
           |), ex AS (
           |  SELECT l_returnflag,
           |    count(DISTINCT l_partkey) AS exact_parts,
           |    count(*) AS n_rows
           |  FROM lineitem GROUP BY 1
           |)
           |SELECT h.l_returnflag,
           |  $HllAlphaNum / CAST(s_present + ($HllM - n_present) * $HllScale AS DOUBLE) AS hll_estimate,
           |  CAST($HllM - n_present AS BIGINT) AS n_zero_registers,
           |  exact_parts, n_rows
           |FROM hll h JOIN ex USING (l_returnflag)
           |ORDER BY l_returnflag""".stripMargin
      }),

    "q_cms_topk" -> QueryDef(
      (s, dir) => {
        val sq = SparkSql
        val toks = ScratchCache.scratch(
          Tables.documentsParallel(s, dir)
            .selectExpr(s"explode(${sq.tokens("text")}) AS tok")
            .selectExpr("tok", s"${sq.polyHash("tok", 12)} AS ph"))
        val stack = CmsRows
          .map { case (j, a, b) => s"$j, ${cmsBucket(a, b)}" }
          .mkString(", ")
        val cms = toks
          .selectExpr(s"stack(${CmsRows.size}, $stack) AS (j, bucket)")
          .groupBy("j", "bucket")
          .agg(count(lit(1)).as("cnt"))
        val vocab = toks
          .groupBy("tok")
          .agg(count(lit(1)).as("exact_cnt"), max("ph").as("ph"))
        vocab
          .selectExpr(
            "tok", "exact_cnt",
            s"stack(${CmsRows.size}, $stack) AS (j, bucket)")
          .join(broadcast(cms), Seq("j", "bucket"))
          .groupBy("tok", "exact_cnt")
          .agg(min("cnt").as("cms_est"))
          .selectExpr("tok AS token", "cms_est", "exact_cnt")
          .orderBy(desc("cms_est"), col("token"))
          .limit(20)
      }, {
        val d = DuckSql
        val cases = CmsRows
          .map { case (j, a, b) => s"WHEN $j THEN ${cmsBucket(a, b)}" }
          .mkString(" ")
        s"""WITH tok AS (
           |  SELECT unnest(${d.tokens("text")}) AS tok FROM documents
           |), toks AS (
           |  SELECT tok, ${d.polyHash("tok", 12)} AS ph FROM tok
           |), js AS (
           |  SELECT unnest([${CmsRows.map(_._1).mkString(", ")}]) AS j
           |), cells AS (
           |  SELECT j, CASE j $cases END AS bucket FROM toks CROSS JOIN js
           |), cms AS (
           |  SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
           |), vocab AS (
           |  SELECT tok, count(*) AS exact_cnt, max(ph) AS ph
           |  FROM toks GROUP BY tok
           |), probe AS (
           |  SELECT tok, exact_cnt, j, CASE j $cases END AS bucket
           |  FROM vocab CROSS JOIN js
           |)
           |SELECT p.tok AS token,
           |  CAST(min(c.cnt) AS BIGINT) AS cms_est,
           |  CAST(p.exact_cnt AS BIGINT) AS exact_cnt
           |FROM probe p JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
           |GROUP BY p.tok, p.exact_cnt
           |ORDER BY cms_est DESC, token
           |LIMIT 20""".stripMargin
      })
  )
}
