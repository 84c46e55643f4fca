package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.oracle.SparkSql
import graft.ops.MaintenanceQueries

/** Three independent renditions of the Hilbert walk behind
  * q_hilbert_cluster, checked value-by-value: (1) the codegen'd
  * HilbertKernel loop the Spark side runs, (2) the generated unrolled
  * step chain (the same generator that emits the DuckDB oracle's CTE
  * text, here rendered in the Spark dialect), and (3) an imperative
  * xy2d written directly from the classic algorithm. The oracle gate
  * compares (1) against the DuckDB chain at run time; this spec pins
  * all three to each other on the full 256×256 low corner of the 2^16
  * grid — a transcription bug in any rendition cannot hide. Also
  * asserts injectivity and the locality property (consecutive curve
  * positions are grid-neighbors) that the tighter-bbox claim rests on.
  */
class HilbertSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Canonical iterative xy2d (the classic d2xy/xy2d pair), n = 2^bits. */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    val nM1 = (1L << bits) - 1
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = nM1 - x; y = nM1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("kernel, generated chain, and imperative xy2d agree on a 256x256 grid") {
    val bits = MaintenanceQueries.HilbertBits
    graft.functions.TextHashFunctions.register(spark)
    // the generated chain (the oracle-text generator, Spark dialect)
    var cur = spark.range(256L * 256L)
      .selectExpr("id div 256 AS gx", "id % 256 AS gy")
      .selectExpr("gx", "gy", "gx AS x0", "gy AS y0",
        "CAST(0 AS BIGINT) AS d0")
    for (i <- 0 until bits) {
      val (dd, nx, ny) =
        MaintenanceQueries.hilbertStep(SparkSql, bits - 1 - i, i)
      cur = cur.selectExpr("gx", "gy", s"$dd AS d${i + 1}",
        s"$nx AS x${i + 1}", s"$ny AS y${i + 1}")
    }
    val got = cur.selectExpr("gx", "gy", s"d$bits AS chain_h",
      s"graft_hilbert(gx, gy, $bits) AS kernel_h").collect()
    assert(got.length == 65536)
    got.foreach { r =>
      val (gx, gy) = (r.getLong(0), r.getLong(1))
      val want = xy2d(bits, gx, gy)
      assert(r.getLong(2) == want, s"chain ($gx,$gy): ${r.getLong(2)} vs $want")
      assert(r.getLong(3) == want, s"kernel ($gx,$gy): ${r.getLong(3)} vs $want")
    }
    assert(got.map(_.getLong(3)).distinct.length == 65536, "walk not injective")
  }

  test("consecutive curve positions are grid-neighbors (locality)") {
    // the full 64x64 curve (bits=6) via the reference implementation —
    // the property the operator's tighter-bbox claim rests on.
    val byD = (0 until 64 * 64).map { i =>
      val (x, y) = (i / 64, i % 64)
      xy2d(6, x, y) -> ((x, y))
    }.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }
}
