package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StageRecovery
import graft.sources.StageRecovery.{Kill, Stage}

/** Mid-DAG recovery on the REAL curation pipeline — not the synthetic
  * three-stage chain RecoverySpec kills. The stages here are
  * q_curation_pipeline's own functions (CurationQueries.curationGate /
  * curationDedup / curationRollup — the declared query composes exactly
  * these), checkpointed at the pipeline's own boundaries, killed
  * mid-run both BETWEEN commits and INSIDE a commit, and resumed; the
  * recovered result must match the one-shot declared query row for row.
  * Reference behavior: a restarted AM replays the DAG history and
  * restores completed vertices instead of re-running them
  * (tez-dag/src/main/java/org/apache/tez/dag/history/recovery/RecoveryService.java,
  * tez-dag/src/main/java/org/apache/tez/dag/app/RecoveryParser.java).
  */
class CurationRecoverySpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfDir = "/root/testdata/sf0.001"

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  /** The pipeline's own stages, instrumented with compute counters so
    * a resume that silently RECOMPUTES a committed stage fails loudly. */
  private def stages(counts: Map[String, AtomicInteger]): Seq[Stage] = Seq(
    Stage("gate", in => {
      counts("gate").incrementAndGet()
      ops.CurationQueries.curationGate(in)
    }),
    Stage("dedup", g => {
      counts("dedup").incrementAndGet()
      ops.CurationQueries.curationDedup(g)
    }),
    Stage("rollup", d => {
      counts("rollup").incrementAndGet()
      ops.CurationQueries.curationRollup(d)
    }))

  private def oracle(): Seq[(String, String, Long, Long, Long, Long)] =
    SparkEntry.queries("q_curation_pipeline")(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  private def rows(df: DataFrame): Seq[(String, String, Long, Long, Long, Long)] =
    // stage read-back is a multi-file scan: re-apply the final sort
    df.orderBy("split", "lang").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("killed after the dedup commit: resume computes only the rollup, result equals the declared query") {
    val root = "/tmp/graft_curation_rec1"
    rmrf(new java.io.File(root))
    val counts = Map("gate" -> new AtomicInteger, "dedup" -> new AtomicInteger,
      "rollup" -> new AtomicInteger)
    val input = Tables.documentsParallel(spark, sfDir)
    val died = intercept[SparkException] {
      StageRecovery.run(spark, root, input, stages(counts),
        Kill(failAfterStage = Some("dedup")))
    }
    assert(died.getMessage.contains("injected driver death"))
    assert(counts("gate").get == 1 && counts("dedup").get == 1 &&
      counts("rollup").get == 0)

    val (res, ran) = StageRecovery.run(spark, root, input, stages(counts))
    assert(ran == Seq("rollup"),
      s"resume must recompute only the uncommitted suffix, ran: $ran")
    assert(counts("gate").get == 1 && counts("dedup").get == 1,
      "committed stages must restore from their outputs, not recompute")
    assert(counts("rollup").get == 1)
    assert(rows(res) == oracle())
  }

  test("killed INSIDE the dedup commit: roll-forward finishes it, resume skips to the rollup") {
    val root = "/tmp/graft_curation_rec2"
    rmrf(new java.io.File(root))
    val counts = Map("gate" -> new AtomicInteger, "dedup" -> new AtomicInteger,
      "rollup" -> new AtomicInteger)
    val input = Tables.documentsParallel(spark, sfDir)
    intercept[Exception] {
      StageRecovery.run(spark, root, input, stages(counts),
        Kill(failInsideCommitOf = Some("dedup")))
    }
    assert(counts("dedup").get == 1)

    val (res, ran) = StageRecovery.run(spark, root, input, stages(counts))
    assert(ran == Seq("rollup"),
      s"the half-committed dedup must roll FORWARD, not recompute; ran: $ran")
    assert(counts("gate").get == 1 && counts("dedup").get == 1)
    assert(rows(res) == oracle())
  }
}
