package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The corpus-adaptive LSH/IVF knobs (SimilarityQueries.adaptivePlanes
  * / adaptiveCells). Two load-bearing contracts:
  *  1. FIXTURE PINS — at every fixture corpus size (20 / 200 / 2000
  *     embeddings) the knobs must equal the legacy constants
  *     (6 planes, 16 cells), because the DuckDB oracle texts compute
  *     the same formulas inline and every committed CORRECTNESS row
  *     was produced under those values. A drift here silently changes
  *     declared outputs at fixture scale.
  *  2. SCALING LAWS — planes hold bucket occupancy ≤ 31.25
  *     (2^p·125 ≥ 4N, minimal such p), cells hold occupancy ≤ 125
  *     (minimal c with 125c ≥ N — constant occupancy, affordable since
  *     r07's two-level quantizer made assignment O(√c·d)/row): tight
  *     minimality is what makes the Scala-side and SQL-side integer
  *     searches agree at every N. superSplit must cover the cell count
  *     (s·m ≥ c) with the minimal square-ish s.
  */
object AdaptiveKnobSpec extends Properties("AdaptiveKnobs") {

  import ops.SimilarityQueries.{adaptiveCells, adaptivePlanes, superSplit}

  property("fixture sizes pin the legacy constants") =
    org.scalacheck.Prop(Seq(20L, 200L, 2000L).forall(n =>
      adaptivePlanes(n) == 6 && adaptiveCells(n) == 16 &&
        superSplit(adaptiveCells(n)) == (4, 4)))

  private val sizes = Gen.chooseNum(1L, 100000000L)

  property("planes: minimal p with 2^p*125 >= 4N, never below 6") =
    forAll(sizes) { n =>
      val p = adaptivePlanes(n)
      p >= 6 && (1L << p) * 125 >= 4 * n &&
        (p == 6 || (1L << (p - 1)) * 125 < 4 * n)
    }

  property("cells: minimal c with 125c >= N, never below 16, capped at 65536") =
    forAll(sizes) { n =>
      val c = adaptiveCells(n)
      c >= 16 && (c == 65536 || 125L * c >= n) &&
        (c == 16 || c == 65536 || 125L * (c - 1) < n)
    }

  property("superSplit: minimal s with s^2 >= c; children cover c") =
    forAll(Gen.chooseNum(1, 65536)) { c =>
      val (s, m) = superSplit(c)
      s * s >= c && (s == 1 || (s - 1) * (s - 1) < c) &&
        s * m >= c && (m == 1 || s.toLong * (m - 1) < c)
    }

  property("both knobs are monotone in corpus size") =
    forAll(sizes, sizes) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      adaptivePlanes(lo) <= adaptivePlanes(hi) &&
        adaptiveCells(lo) <= adaptiveCells(hi)
    }

  // semantic-dedup K (ClusteringQueries.adaptiveSemK): same contract
  // shape — pinned at the fixtures, constant occupancy after
  import ops.ClusteringQueries.adaptiveSemK

  property("semK: 8 at every fixture size") =
    org.scalacheck.Prop(Seq(20L, 200L, 2000L).forall(adaptiveSemK(_) == 8))

  property("semK: minimal k with 250k >= N, never below 8, monotone") =
    forAll(sizes, sizes) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val k = adaptiveSemK(hi)
      k >= 8 && 250L * k >= hi && (k == 8 || 250L * (k - 1) < hi) &&
        adaptiveSemK(lo) <= k
    }
}
