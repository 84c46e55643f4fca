package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sketch-family guarantees beyond the oracle's bit-exactness: the
  * oracle proves both engines compute the SAME sketch; these tests prove
  * the sketch is a GOOD one (estimation quality + the structural
  * guarantees the algorithms advertise), at sf0.001 and sf0.01.
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("q_hll_distinct estimate lands within HLL error bounds of exact") {
    for (dir <- sfs) {
      val rows = SparkEntry.queries("q_hll_distinct")(spark, dir)
        .select("hll_estimate", "exact_parts").collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        val (est, exact) = (r.getDouble(0), r.getLong(1))
        // m=64 → rsd ≈ 1.04/√64 = 13%; allow 3σ.
        val rel = math.abs(est - exact) / exact.toDouble
        assert(rel < 0.40, s"HLL estimate $est vs exact $exact at $dir")
      }
    }
  }

  test("q_cms_topk estimates never undercount and state stays bounded") {
    for (dir <- sfs) {
      val rows = SparkEntry.queries("q_cms_topk")(spark, dir)
        .select("cms_est", "exact_cnt").collect()
      assert(rows.nonEmpty)
      // CMS point queries only ever OVERestimate (hash collisions add).
      for (r <- rows)
        assert(r.getLong(0) >= r.getLong(1),
          s"CMS undercounted: est ${r.getLong(0)} < exact ${r.getLong(1)}")
      ScratchCache.release()
    }
  }

  test("the CMS min-over-rows step is load-bearing at fixture vocab") {
    // With width 32 and depth 3, the fixture's token vocabulary forces
    // collisions in at least one row; if NO token showed est > exact the
    // sketch would be degenerate (width quietly too large to test the
    // min step). Overestimates must exist AND be resolved to exact
    // counts for collision-free rows via the min.
    val rows = SparkEntry.queries("q_cms_topk")(spark, "/root/testdata/sf0.01")
      .select("cms_est", "exact_cnt").collect()
    assert(rows.exists(r => r.getLong(0) > r.getLong(1)),
      "expected at least one colliding CMS cell at width 32")
    assert(rows.exists(r => r.getLong(0) == r.getLong(1)),
      "expected at least one exact CMS estimate via the min over rows")
    ScratchCache.release()
  }

  test("HLL register state is bounded at m per group") {
    // The pre-aggregation register relation (group × register → max rank)
    // can never exceed 64 rows per group — the constant-state property
    // that makes the sketch shuffle O(groups), not O(rows).
    val li = Tables.lineitem(spark, sf)
    val regs = li.selectExpr(
        "l_returnflag",
        s"(((l_partkey % 1000000007) * 48271 + 40503) % 1000000007) % 64 AS reg")
      .groupBy("l_returnflag", "reg").count()
      .groupBy("l_returnflag").count()
      .collect()
    for (r <- regs) assert(r.getLong(1) <= 64)
  }
}
