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
  *     (2^p·125 ≥ 4N, minimal such p), cells follow the √N nlist rule
  *     (minimal c with c²·1000 ≥ 128N): tight minimality is what makes
  *     the Scala-side and SQL-side integer searches agree at every N.
  */
object AdaptiveKnobSpec extends Properties("AdaptiveKnobs") {

  import ops.SimilarityQueries.{adaptiveCells, adaptivePlanes}

  property("fixture sizes pin the legacy constants") =
    org.scalacheck.Prop(Seq(20L, 200L, 2000L).forall(n =>
      adaptivePlanes(n) == 6 && adaptiveCells(n) == 16))

  private val sizes = Gen.chooseNum(1L, 100000000L)

  property("planes: minimal p with 2^p*125 >= 4N, never below 6") =
    forAll(sizes) { n =>
      val p = adaptivePlanes(n)
      p >= 6 && (1L << p) * 125 >= 4 * n &&
        (p == 6 || (1L << (p - 1)) * 125 < 4 * n)
    }

  property("cells: minimal c with c^2*1000 >= 128N, never below 16") =
    forAll(sizes) { n =>
      val c = adaptiveCells(n)
      c >= 16 && c.toLong * c * 1000 >= 128 * n &&
        (c == 16 || (c - 1L) * (c - 1) * 1000 < 128 * n)
    }

  property("both knobs are monotone in corpus size") =
    forAll(sizes, sizes) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      adaptivePlanes(lo) <= adaptivePlanes(hi) &&
        adaptiveCells(lo) <= adaptiveCells(hi)
    }
}
