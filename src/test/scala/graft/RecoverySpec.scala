package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StageRecovery
import graft.sources.StageRecovery.{Kill, Stage}

/** Batch mid-DAG recovery (reference AM recovery: RecoveryService.java
  * persists DAG history as stages finish; RecoveryParser.java replays it
  * on AM restart so finished vertices are restored, not re-run): a
  * multi-stage pipeline killed between stage commits — or INSIDE a
  * stage's group commit, after the decision point — resumes from its
  * committed outputs. Evidence of non-recomputation is direct: per-stage
  * invocation counters stay at 1 and committed files' bytes/mtimes are
  * untouched across the resume.
  */
class RecoverySpec extends AnyFunSuite {
  import SparkTestSession._

  private val root = "/tmp/graft_recovery"

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  private def input = spark.range(0, 1000).toDF("id")

  /** The 3-stage chain; each fn counts its invocations. */
  private def mkStages(c: Map[String, AtomicInteger]): Seq[Stage] = Seq(
    Stage("filter", df => { c("filter").incrementAndGet()
      df.filter("id % 2 = 0") }),
    Stage("derive", df => { c("derive").incrementAndGet()
      df.selectExpr("id", "(id * 3) AS t") }),
    Stage("agg", df => { c("agg").incrementAndGet()
      df.groupBy(expr("id % 10").as("g")).agg(sum("t").as("s"))
        .orderBy("g") }))

  private def counters() =
    Map("filter" -> new AtomicInteger, "derive" -> new AtomicInteger,
      "agg" -> new AtomicInteger)

  private def expected: Set[(Long, Long)] =
    input.filter("id % 2 = 0").selectExpr("id % 10 AS g", "(id * 3) AS t")
      .groupBy("g").agg(sum("t").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def result(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fileStates(stage: String): Map[String, (Long, Long)] = {
    val dir = new java.io.File(s"$root/stage_$stage")
    Option(dir.listFiles()).getOrElse(Array.empty).filter(_.isFile)
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("death BETWEEN stage commits: resume computes only the uncommitted suffix, committed bytes untouched") {
    rmrf(new java.io.File(root))
    val c = counters()
    intercept[SparkException] {
      StageRecovery.run(spark, root, input, mkStages(c),
        Kill(failAfterStage = Some("derive")))
    }
    assert(c("filter").get == 1 && c("derive").get == 1 && c("agg").get == 0)
    val pre = Seq("filter", "derive").map(s => s -> fileStates(s)).toMap
    // the restarted "AM": same pipeline, fresh run call
    val (res, ran) = StageRecovery.run(spark, root, input, mkStages(c))
    assert(ran == Seq("agg"), s"resume must recompute only the tail, ran=$ran")
    assert(c("filter").get == 1 && c("derive").get == 1 && c("agg").get == 1,
      "committed stages were re-executed")
    Seq("filter", "derive").foreach { s =>
      assert(fileStates(s) == pre(s), s"stage $s files changed across resume")
    }
    assert(result(res) == expected)
  }

  test("death INSIDE a stage's group commit: recover() rolls the commit forward — the stage is restored, not re-run") {
    rmrf(new java.io.File(root))
    val c = counters()
    intercept[SparkException] {
      StageRecovery.run(spark, root, input, mkStages(c),
        Kill(failInsideCommitOf = Some("derive")))
    }
    assert(c("derive").get == 1)
    // the kill landed after the commit DECISION: data published, marker
    // pending in the group-commit manifest
    assert(new java.io.File(s"$root/stage_derive").exists())
    assert(!new java.io.File(s"$root/stage_derive.done").exists())
    assert(Option(new java.io.File(s"$root/_group_commits").listFiles())
      .exists(_.nonEmpty), "a pending manifest must remain for roll-forward")
    val (res, ran) = StageRecovery.run(spark, root, input, mkStages(c))
    assert(ran == Seq("agg"),
      s"rolled-forward stage must not recompute, ran=$ran")
    assert(c("derive").get == 1, "decided-but-unpublished stage was re-run")
    assert(result(res) == expected)
  }

  test("clean run reports all stages; a second invocation is a pure restore") {
    rmrf(new java.io.File(root))
    val c = counters()
    val (res1, ran1) = StageRecovery.run(spark, root, input, mkStages(c))
    assert(ran1 == Seq("filter", "derive", "agg"))
    val (res2, ran2) = StageRecovery.run(spark, root, input, mkStages(c))
    assert(ran2.isEmpty)
    assert(c.values.forall(_.get == 1))
    assert(result(res1) == expected && result(res2) == expected)
  }
}
