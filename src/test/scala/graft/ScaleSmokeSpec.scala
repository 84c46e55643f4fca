package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-suite smoke of the ScaleStress harness (the committed evidence
  * lives in SCALE_r06.json from `runMain graft.ScaleStress`): generate
  * a 2× corpus from sf0.001 through the same generator, run one query
  * per stressed family, and assert the property the full harness
  * measures at 10× — the physical plan signature (shuffle/broadcast/
  * sort/aggregate structure, join strategies) does not change shape
  * when the data doubles, and the result grows with the corpus. No
  * timing assertions here: in-suite wall-clock is ambient-load noise;
  * ratios belong to the isolated harness run.
  */
class ScaleSmokeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dirs: (String, String) = {
    val root = s"${ProcScratch.base}/scale_smoke"
    val d1 = s"$root/sf1x"
    val d2 = s"$root/sf2x"
    ScaleStress.generate(spark, sf, d1, 1, files = 4)
    ScaleStress.generate(spark, sf, d2, 2, files = 4)
    (d1, d2)
  }

  // one per family, chosen so the RESULT grows with the corpus (the
  // ANN queries keep a fixed query set → fixed top-k output; the
  // relative-frequency queries dilute under decorrelation — their
  // growth is asserted by the full harness's ratio instead)
  Seq("q_dedup_exact", "q_dedup_minhash", "q_seq_pack").foreach { q =>
    test(s"$q keeps its plan shape and grows its result at 2x") {
      val (d1, d2) = dirs
      val fn = SparkEntry.queries(q)
      val df1 = fn(spark, d1)
      val n1 = df1.collect().length
      val sig1 = ScaleStress.signature(df1)
      ScratchCache.release()
      val df2 = fn(spark, d2)
      val n2 = df2.collect().length
      val sig2 = ScaleStress.signature(df2)
      ScratchCache.release()
      assert(sig1 == sig2,
        s"plan shape changed at 2x:\n 1x=$sig1\n 2x=$sig2")
      assert(n2 > n1, s"result did not grow with the corpus: $n1 -> $n2")
    }
  }
}
