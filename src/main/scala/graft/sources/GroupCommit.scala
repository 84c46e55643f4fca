package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.{JobExecutionStatus, SparkContext, SparkException}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** All-or-nothing MULTI-sink commit — the vertex-group commit of the
  * reference (`tez-api/src/main/java/org/apache/tez/dag/api/VertexGroup.java:42`;
  * `tez-dag/src/main/java/org/apache/tez/dag/app/dag/impl/DAGImpl.java:188,1362,2146`,
  * `commitAllOutputsOnSuccess`): a DAG that feeds N outputs commits
  * them together on DAG success, never piecemeal. The Spark engine's
  * per-sink `FileCommitProtocol` only covers ONE sink per job; a
  * curation pipeline writing train/val/test splits plus an annotation
  * table in one run needs the group property, so this utility lifts
  * the stage-then-rename idea to job-group scope:
  *
  *  - phase 1 WRITE: every sink's DataFrame is written to a sibling
  *    staging dir `<dest>.__staging__<jobId>` (long, parallel; task
  *    attempts/retries inside are Spark's normal committer). Nothing
  *    is visible at any final path.
  *  - phase 2 DECIDE: one manifest listing every staged→final move is
  *    written to `<root>/_group_commits/<jobId>` via create-temp +
  *    atomic rename. The manifest's existence IS the group commit
  *    (the `commitAllOutputsOnSuccess` decision point).
  *  - phase 3 PUBLISH: each staging dir is renamed over its final dest
  *    (metadata-only on HDFS-class stores, so the window is short);
  *    the manifest is removed once every move landed.
  *
  * Crash/failure semantics: before phase 2 nothing final ever existed —
  * `commitGroup` rolls back its staging dirs (and a JVM-death orphan is
  * invisible to readers, carrying the `.__staging__` name). After
  * phase 2 the group is committed: `recover()` rolls FORWARD, finishing
  * the publishes recorded in any pending manifest — so observers see
  * either none of the group's outputs or (after recovery) all of them,
  * exactly the reference's contract. GroupCommitSpec injects failures
  * at both points and asserts the invariant.
  *
  * At 100 TB: phase 1 is the data-proportional part and runs with full
  * cluster parallelism per sink; phases 2-3 are O(#sinks) driver-side
  * metadata ops. Renames stay within the destination filesystem (the
  * staging dir is a SIBLING of the final dir, never /tmp).
  */
object GroupCommit {
  final case class Sink(df: DataFrame, dest: String, format: String = "parquet")

  private def manifestDir(root: String) = new Path(root, "_group_commits")

  /** Failure-injection points for the spec (never set in production). */
  private[graft] object FailPoint {
    val BeforeManifest = "before-manifest"
    val AfterFirstPublish = "after-first-publish"
  }

  /** Write all sinks and commit them as one group; returns the jobId.
    * Throws (after rollback or with a recoverable manifest) on failure. */
  def commitGroup(spark: SparkSession, root: String, sinks: Seq[Sink],
      injectFailure: Option[String] = None): String = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val jobId = java.util.UUID.randomUUID().toString
    val moves = sinks.map(s =>
      (new Path(s.dest + ".__staging__" + jobId), new Path(s.dest)))
    // every phase-1 Spark job runs under a commit-scoped job group so
    // the rollback can name, cancel, and drain EXACTLY the tasks that
    // might still be materializing files under a staging dir — the
    // reference's abort path likewise kills the vertex's task attempts
    // before the committer aborts the output
    // (`tez-mapreduce/.../committer/MROutputCommitter.java` abortOutput,
    // DAGImpl's TERMINATING → abort fan-out)
    val sc = spark.sparkContext
    val group = "graft-group-commit-" + jobId
    try {
      // phase 1 — long, data-proportional, nothing visible
      sinks.zip(moves).foreach { case (s, (staging, _)) =>
        withJobGroup(sc, group, s"group-commit $jobId → ${staging.getName}") {
          s.df.write.mode("overwrite").format(s.format).save(staging.toString)
        }
      }
      if (injectFailure.contains(FailPoint.BeforeManifest))
        throw new SparkException("injected failure before manifest")
    } catch {
      case e: Throwable =>
        // no manifest ⇒ the group never committed: roll back staging.
        // A failed parallel write leaves ZOMBIE tasks (the job is
        // already failed, but sibling task threads of the failing stage
        // are still running) that can re-materialize `_temporary` files
        // AFTER a recursive delete. That is a synchronization problem,
        // not a timing one: cancel the commit's job group (interrupting
        // task threads) and wait until the status tracker shows zero
        // active tasks across the group's jobs BEFORE deleting. Only
        // then is the delete race-free, and a single delete pass leaves
        // zero residue. If the drain TIMES OUT (or stage info was
        // evicted from the status store), a still-writing zombie could
        // re-materialize files after a single delete, so that path falls
        // back to a bounded delete-retry sweep. Either way an
        // unreclaimed orphan would still be correct (readers never see
        // `.__staging__` names; vacuum() collects them).
        val drained =
          try {
            sc.cancelJobGroup(group)
            awaitGroupQuiescent(sc, group, timeoutMs = 30000L)
          } catch {
            // a cancel/drain hiccup must not replace the ORIGINAL failure
            case scala.util.control.NonFatal(drainErr) =>
              System.err.println(s"[GroupCommit] drain of $group failed " +
                s"(${drainErr.getClass.getSimpleName}: " +
                s"${drainErr.getMessage}) — proceeding to rollback")
              false
          }
        // post-drain: one pass suffices. Post-TIMEOUT: bounded retry
        // sweep (zombies re-materializing between passes get reclaimed;
        // anything that survives all passes goes to vacuum()).
        val passes = if (drained) 1 else 5
        var pass = 0
        var residue = true
        while (pass < passes && residue) {
          if (pass > 0) Thread.sleep(200L * pass)
          residue = false
          moves.foreach { case (staging, _) =>
            try {
              if (fs.exists(staging)) fs.delete(staging, true)
              if (fs.exists(staging)) residue = true
            } catch {
              // NonFatal: an OOM/VM error mid-rollback must still surface
              case scala.util.control.NonFatal(fsErr) =>
                System.err.println(s"[GroupCommit] rollback of $staging " +
                  s"failed (${fsErr.getClass.getSimpleName}: " +
                  s"${fsErr.getMessage})")
                residue = true
            }
          }
          pass += 1
        }
        if (residue)
          System.err.println(s"[GroupCommit] staging residue survived " +
            s"$pass rollback pass(es) — orphan left for vacuum()")
        throw e
    }
    // phase 2 — THE commit point: temp write + atomic rename
    val mdir = manifestDir(root)
    fs.mkdirs(mdir)
    val mTmp = new Path(mdir, jobId + ".tmp")
    val mFinal = new Path(mdir, jobId)
    val out = fs.create(mTmp, true)
    out.write(moves.map { case (s, f) => s"$s\t$f" }.mkString("\n")
      .getBytes("UTF-8"))
    out.close()
    if (!fs.rename(mTmp, mFinal))
      throw new SparkException(s"group commit $jobId: manifest rename failed")
    // phase 3 — publish fan-out; a failure here leaves the manifest in
    // place for recover() to roll forward
    var published = 0
    moves.foreach { case (staging, fin) =>
      if (injectFailure.contains(FailPoint.AfterFirstPublish) && published == 1)
        throw new SparkException("injected failure between sink publishes")
      publish(fs, staging, fin, jobId)
      published += 1
    }
    fs.delete(mFinal, false)
    jobId
  }

  /** Run `body` under a job group with interrupt-on-cancel, restoring
    * whatever group the CALLER had set afterwards (commitGroup must not
    * clobber an enclosing pipeline's job-group bookkeeping). */
  private def withJobGroup[T](sc: SparkContext, group: String,
      desc: String)(body: => T): T = {
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setJobGroup(group, desc, interruptOnCancel = true)
    try body
    finally {
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      sc.setLocalProperty("spark.job.description", prevDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
    }
  }

  /** Block until the status tracker shows the job group fully drained:
    * no group job RUNNING and zero active tasks across every stage of
    * every group job. Task-end events post only after the task thread
    * has finished its user code (including committer file writes), so
    * two consecutive all-idle readings — the second guarding against
    * listener-bus lag between a task's start event and our first poll —
    * mean no task of the group can touch a staging dir afterwards.
    * Returns true iff the double-idle reading was observed (a timeout
    * or interrupt returns false and the caller falls back to a bounded
    * delete-retry sweep). */
  private def awaitGroupQuiescent(sc: SparkContext, group: String,
      timeoutMs: Long): Boolean = {
    val tracker = sc.statusTracker
    def activeWork(): Int =
      tracker.getJobIdsForGroup(group).flatMap(tracker.getJobInfo(_))
        .map { j =>
          val stageTasks = j.stageIds()
            .flatMap(tracker.getStageInfo(_)).map(_.numActiveTasks()).sum
          stageTasks + (if (j.status() == JobExecutionStatus.RUNNING) 1 else 0)
        }.sum
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var idleStreak = 0
    while (idleStreak < 2 && System.nanoTime() < deadline) {
      if (activeWork() == 0) idleStreak += 1 else idleStreak = 0
      if (idleStreak < 2) {
        try Thread.sleep(25L)
        catch {
          case _: InterruptedException =>
            Thread.currentThread().interrupt()
            return false // caller falls back to the retry sweep
        }
      }
    }
    if (idleStreak < 2)
      System.err.println(s"[GroupCommit] job group $group did not drain " +
        s"within ${timeoutMs}ms — rollback falls back to retry sweep; " +
        "any residue goes to vacuum()")
    idleStreak >= 2
  }

  /** One staged→final move; idempotent so recovery can replay it. */
  private def publish(fs: org.apache.hadoop.fs.FileSystem,
      staging: Path, fin: Path, jobId: String): Unit = {
    if (!fs.exists(staging)) {
      // already published by a previous attempt (rename is the last op)
      if (!fs.exists(fin))
        throw new SparkException(
          s"group commit $jobId: neither $staging nor $fin exists")
    } else {
      if (fs.exists(fin)) fs.delete(fin, true) // overwrite semantics
      if (!fs.rename(staging, fin))
        throw new SparkException(
          s"group commit $jobId: rename $staging -> $fin returned false")
    }
  }

  /** Roll FORWARD every pending (post-decision) group commit under
    * `root`. Run at job/session start, like the reference AM replaying
    * committer state from its recovery log on restart. */
  def recover(spark: SparkSession, root: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val mdir = manifestDir(root)
    if (!fs.exists(mdir)) return
    fs.listStatus(mdir).filter(_.isFile).foreach { st =>
      val name = st.getPath.getName
      if (name.endsWith(".tmp")) {
        // died mid-manifest-write: never committed — discard
        fs.delete(st.getPath, false)
      } else {
        val in = fs.open(st.getPath)
        val body = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        in.close()
        body.split("\n").filter(_.nonEmpty).foreach { line =>
          val Array(s, f) = line.split("\t")
          publish(fs, new Path(s), new Path(f), name)
        }
        fs.delete(st.getPath, false)
      }
    }
  }

  /** VACUUM: delete orphaned `.__staging__<jobId>` directories left by
    * pre-decision crashes (JVM death during phase 1 — no manifest was
    * ever written, so the group never committed and the staging bytes
    * are garbage no reader can see). Staging dirs whose jobId still has
    * a pending manifest are left alone — run [[recover]] FIRST so
    * post-decision groups roll forward before their staging names
    * disappear. Returns the number of directories removed.
    *
    * At scale this walk is bounded by the table tree under `root`
    * (directory metadata, not data); production layouts scan the known
    * sink parents rather than the whole filesystem. */
  def vacuum(spark: SparkSession, root: String): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) return 0
    val mdir = manifestDir(root)
    def pending(jobId: String): Boolean = fs.exists(new Path(mdir, jobId))
    var removed = 0
    def walk(p: Path): Unit = {
      fs.listStatus(p).filter(_.isDirectory).foreach { st =>
        val name = st.getPath.getName
        val at = name.indexOf(".__staging__")
        if (at >= 0) {
          val jobId = name.substring(at + ".__staging__".length)
          if (!pending(jobId)) {
            fs.delete(st.getPath, true)
            removed += 1
          }
        } else if (name != "_group_commits") walk(st.getPath)
      }
    }
    walk(rootPath)
    removed
  }
}
