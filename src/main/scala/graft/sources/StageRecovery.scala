package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.SparkException
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mid-DAG batch recovery — resume a killed multi-stage pipeline from
  * its committed stage outputs without recomputing finished work. This
  * is the AM-recovery behavior of the reference: the DAG history log is
  * persisted as stages complete
  * (`tez-dag/src/main/java/org/apache/tez/dag/history/recovery/RecoveryService.java`),
  * and a restarted AM replays it
  * (`tez-dag/src/main/java/org/apache/tez/dag/app/RecoveryParser.java`)
  * so completed vertices are restored, not re-run. Here the "history
  * log" IS the filesystem state the commit protocol leaves behind —
  * no separate journal to fsync, because [[GroupCommit]]'s
  * stage-then-rename discipline makes the committed-output set itself
  * crash-consistent:
  *
  *  - each stage's output publishes through [[GroupCommit.commitGroup]]
  *    (stage → manifest decision → atomic rename), so a stage is either
  *    COMMITTED (final dir exists, complete) or NOT (at worst staging
  *    residue no reader resolves);
  *  - a killed run can additionally die INSIDE a commit, after the
  *    decision but before every publish — [[GroupCommit.recover]] rolls
  *    those forward from the pending manifest, exactly the reference's
  *    replay of a logged-but-unfinished commit;
  *  - [[run]] starts with that roll-forward, then walks the stage chain
  *    resuming from the LAST COMMITTED PREFIX: committed stages load by
  *    reading their published output (no recomputation — RecoverySpec
  *    proves it with invocation counters and file mtimes), the first
  *    uncommitted stage resumes compute from the previous stage's
  *    stored frame.
  *
  * At 100 TB the trade is the classic checkpoint one: each stage
  * boundary materializes once (sequential write at full cluster
  * parallelism), and in exchange a pipeline that dies at stage k of n
  * repays only stage k — not k-1 stages of a multi-hour DAG. Stage
  * outputs are ordinary parquet dirs, so the resume read re-enters
  * Catalyst with pushdown/pruning intact.
  */
object StageRecovery {

  /** One pipeline stage: `fn` maps the previous stage's frame to this
    * stage's output (the first stage receives the pipeline input). */
  final case class Stage(name: String, fn: DataFrame => DataFrame)

  /** Injected-death points for RecoverySpec (never set in production):
    * `failAfterStage` throws after that stage's commit completes (death
    * BETWEEN stage commits); `failInsideCommitOf` dies inside that
    * stage's group commit after the decision point (death the
    * roll-forward recovery must finish). */
  final case class Kill(failAfterStage: Option[String] = None,
      failInsideCommitOf: Option[String] = None)

  /** Run (or resume) the pipeline; returns the final stage's committed
    * frame. `ran` in the result lists the stages actually COMPUTED this
    * invocation — a resumed run reports only the uncommitted suffix. */
  def run(spark: SparkSession, root: String, input: DataFrame,
      stages: Seq[Stage], kill: Kill = Kill()): (DataFrame, Seq[String]) = {
    require(stages.map(_.name).distinct.size == stages.size,
      "stage names must be unique")
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    // replay any logged-but-unfinished commit before trusting dir state
    GroupCommit.recover(spark, root)
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    var cur = input
    stages.foreach { st =>
      val dest = new Path(root, s"stage_${st.name}")
      val done = new Path(root, s"stage_${st.name}.done")
      // the stage commits as a GROUP (data + done-marker): the marker is
      // the vertex-finished record; it can only be fully absent (stage
      // uncommitted) or — after the recover() above replayed any pending
      // manifest — present with the data complete beside it
      if (fs.exists(done)) {
        // committed by a previous run — restore, never recompute
        cur = spark.read.parquet(dest.toString)
      } else {
        val out = st.fn(cur)
        ran += st.name
        GroupCommit.commitGroup(spark, root,
          Seq(GroupCommit.Sink(out, dest.toString),
            GroupCommit.Sink(spark.range(1).toDF("ok"), done.toString)),
          injectFailure =
            if (kill.failInsideCommitOf.contains(st.name))
              Some(GroupCommit.FailPoint.AfterFirstPublish)
            else None)
        cur = spark.read.parquet(dest.toString)
      }
      if (kill.failAfterStage.contains(st.name))
        throw new SparkException(s"injected driver death after stage ${st.name}")
    }
    (cur, ran.toSeq)
  }
}
