package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured recall of the approximate ANN paths against brute-force
  * ground truth — the quality half of the accuracy/cost trade the
  * declared queries encode structurally (the oracle gate proves each
  * approximate query computes ITS OWN semantics exactly; this spec
  * proves those semantics are USEFUL approximations of true top-k).
  * Everything here is deterministic (hyperplane signs and k-means-style
  * cell seeds are hash-derived), so the recall values are stable
  * numbers, not flaky statistics — the floors are pinned just below
  * the measured values and fail on any REGRESSION in bucketing or
  * cell-routing logic. The ordering probe2 ≥ probe1 is the nprobe
  * recall knob doing its job (FAISS's canonical trade at 100 TB:
  * more cells probed → more of the true neighborhood seen).
  */
class AnnRecallSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF recall@3 is useful and monotone in nprobe") {
    functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding",
        "graft_vec_dot(embedding, embedding) AS n2")
    val q = e.selectExpr("vec_id AS query_id", "embedding AS qe", "n2 AS qn2")
    val c = e.selectExpr("vec_id AS neighbor_id", "embedding AS ce", "n2 AS cn2")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val truth = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .selectExpr("query_id", "neighbor_id",
        "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val p1 = pairs("q_ann_ivf")
    val p2 = pairs("q_ann_ivf_probe2")
    val r1 = (truth & p1).size.toDouble / truth.size
    val r2 = (truth & p2).size.toDouble / truth.size
    info(f"recall@3 ivf_probe1=$r1%.3f ivf_probe2=$r2%.3f truth=${truth.size}")
    assert(r2 >= r1, "probing more cells must not lose recall")
    // Fixture context for the absolute floors: the synthetic embeddings
    // are near-uniform in 64-dim (no cluster structure — the WORST case
    // for a coarse quantizer) and the cells are hash-seeded rather than
    // learned, so chance recall for 1-of-16 cells is ~0.06. The r06
    // FLAT quantizer measured 0.155/0.258 (probe1/probe2); r07's
    // two-level routing (midpoint-seeded children + the probe2 move to
    // the second-nearest SUPER's best child) measured 0.337/0.528 —
    // better geometry AND the O(√c·d) assignment. The floors sit just
    // below the new deterministic values and catch regressions in cell
    // assignment or candidate generation, not benchmark-chasing recall
    // (real corpora with cluster structure are where IVF recall climbs
    // toward 1.0 as nprobe grows).
    assert(r1 >= 0.30, f"probe1 recall collapsed: $r1%.3f (measured 0.337)")
    assert(r2 >= 0.48, f"probe2 recall collapsed: $r2%.3f (measured 0.528)")

    // the TRAINED (data-seeded) quantizer, measured 0.235 here: on the
    // UNIFORM fixture strided data seeds buy nothing over hash seeds
    // (both are arbitrary points in a structure-free cloud) and its
    // Voronoi geometry costs a little recall vs the midpoint children.
    // Its design target is CLUSTERED corpora, where it wins on both
    // axes (SCALE_r08_clustered_ann.json: recall 0.437/0.263 vs hash
    // 0.367/0.153 at 1×/10×, occupancy max/med 458/118 vs 1414/93).
    // The floor below pins the uniform-fixture value against routing
    // regressions, not against the hash variant.
    val pt = pairs("q_ann_ivf_trained")
    val rt = (truth & pt).size.toDouble / truth.size
    info(f"recall@3 ivf_trained=$rt%.3f")
    assert(rt >= 0.20, f"trained recall collapsed: $rt%.3f (measured 0.235)")

    // the trained quantizer's nprobe knob (r08): probing the
    // second-nearest super's best child must not lose recall — the
    // same monotonicity contract as the hash variant above
    val pt2 = pairs("q_ann_ivf_trained_probe2")
    val rt2 = (truth & pt2).size.toDouble / truth.size
    info(f"recall@3 ivf_trained_probe2=$rt2%.3f")
    assert(rt2 >= rt, "probing more trained cells must not lose recall")

    // nprobe=3 (r09): + the home super's second-best child — the full
    // probe chain must stay monotone. Clustered-corpus values, where
    // this knob actually earns its keep, are the DECORRELATED r12
    // table (SCALE_r12_clustered_ann{,_100x}.json): 0.513/0.649/0.835
    // at 1× and 0.067/0.067/0.122 at 100× for probe1→2→3 — the
    // pre-r12 figures (0.947 at 100×) measured a generator symmetry,
    // not the engine (see ScaleStress's decorrelation Scaladoc).
    val pt3 = pairs("q_ann_ivf_trained_probe3")
    val rt3 = (truth & pt3).size.toDouble / truth.size
    info(f"recall@3 ivf_trained_probe3=$rt3%.3f")
    assert(rt3 >= rt2, "the third probe must not lose recall")

    // the ADAPTIVE-nprobe search (r12): the margin law's probe set
    // always CONTAINS the home cell, so its candidate set is a
    // superset of probe1's — recall must not lose to it, and on the
    // boundary-heavy rows it should win (clustered-corpus measurement
    // lives in AnnClusteredStress's trained_recall3_adaptive row)
    val pta = pairs("q_ann_ivf_trained_adaptive")
    val rta = (truth & pta).size.toDouble / truth.size
    info(f"recall@3 ivf_trained_adaptive=$rta%.3f")
    assert(rta >= rt, "adaptive probes must not lose recall vs probe1")
    // measured 0.503 here vs probe3's 0.411 — the margin law beats the
    // fixed chain ON THE SEARCH SURFACE at comparable mass (it is not
    // a superset of probe3's candidates, so this is a measurement, not
    // arithmetic; floor pinned just below the deterministic value)
    assert(rta >= 0.45, f"adaptive search recall collapsed: $rta%.3f " +
      "(measured 0.503)")

    // the L3 book's adaptive knob (r12): the margin law over the
    // beam's already-scanned leaves — same home-cell superset
    // contract vs the L3 probe1
    val pl = pairs("q_ann_ivf_trained_l3")
    val pla = pairs("q_ann_ivf_trained_l3_adaptive")
    val rl = (truth & pl).size.toDouble / truth.size
    val rla = (truth & pla).size.toDouble / truth.size
    info(f"recall@3 ivf_trained_l3=$rl%.3f l3_adaptive=$rla%.3f")
    assert(rla >= rl, "L3 adaptive probes must not lose recall vs probe1")
    // measured 0.487 vs the L3 probe1's 0.212 — more than double, at
    // ZERO extra routing cost (the margin law reuses the beam's
    // already-scanned leaves); floor just below the deterministic value
    assert(rla >= 0.44, f"L3 adaptive search recall collapsed: " +
      f"$rla%.3f (measured 0.487)")

    // the DISTRIBUTED codebook build must be indistinguishable here:
    // identical cells ⇒ identical pairs, not merely similar recall
    val ptd = pairs("q_ann_ivf_trained_dist")
    assert(ptd == pt, "dist build diverged from the one-broadcast build")
  }
}
