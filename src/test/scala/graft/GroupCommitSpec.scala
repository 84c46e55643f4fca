package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GroupCommit
import graft.sources.GroupCommit.{FailPoint, Sink}

/** Vertex-group all-or-nothing multi-output commit (reference
  * VertexGroup.java:42 / DAGImpl.java:2146 commitAllOutputsOnSuccess):
  * one job's N sinks become visible together or not at all, across
  * write failures, pre-decision failures, and failures injected BETWEEN
  * individual sink publishes (the window the reference closes with its
  * recovery log; here the group manifest + recover() roll-forward).
  */
class GroupCommitSpec extends AnyFunSuite {
  import SparkTestSession._

  private val root = "/tmp/graft_groupcommit"

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }
  private def exists(p: String) = new java.io.File(p).exists()
  private def finals = Seq("a", "b", "c").map(n => s"$root/$n")
  private def stagingDirs =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.contains(".__staging__")).toSeq
  private def manifests =
    Option(new java.io.File(s"$root/_group_commits").listFiles())
      .getOrElse(Array.empty).toSeq

  private def sinks(n: Int = 3): Seq[Sink] =
    finals.take(n).zipWithIndex.map { case (dest, i) =>
      Sink(spark.range(100 * (i + 1)).toDF("id"), dest)
    }

  test("happy path: all sinks visible, no staging or manifest residue") {
    rmrf(new java.io.File(root))
    GroupCommit.commitGroup(spark, root, sinks())
    finals.foreach(p => assert(exists(p), p))
    assert(stagingDirs.isEmpty)
    assert(manifests.isEmpty)
    assert(spark.read.parquet(finals(2)).count() == 300)
  }

  test("a failing sink write rolls back the whole group: nothing visible") {
    rmrf(new java.io.File(root))
    val poisoned = sinks().init :+
      Sink(spark.range(10).selectExpr("raise_error('boom') AS id"), finals(2))
    intercept[Exception] {
      GroupCommit.commitGroup(spark, root, poisoned)
    }
    finals.foreach(p => assert(!exists(p), s"partial output visible: $p"))
    assert(stagingDirs.isEmpty, stagingDirs.mkString(","))
  }

  test("failure before the manifest: nothing visible, staging rolled back") {
    rmrf(new java.io.File(root))
    intercept[Exception] {
      GroupCommit.commitGroup(spark, root, sinks(),
        injectFailure = Some(FailPoint.BeforeManifest))
    }
    finals.foreach(p => assert(!exists(p), s"partial output visible: $p"))
    assert(stagingDirs.isEmpty)
    assert(manifests.isEmpty)
  }

  test("failure BETWEEN sink publishes: recover() rolls the group forward") {
    rmrf(new java.io.File(root))
    intercept[Exception] {
      GroupCommit.commitGroup(spark, root, sinks(),
        injectFailure = Some(FailPoint.AfterFirstPublish))
    }
    // the decision landed (manifest present) but the fan-out was cut
    // mid-way: exactly the state a crashed driver leaves behind
    assert(manifests.nonEmpty)
    GroupCommit.recover(spark, root)
    finals.foreach(p => assert(exists(p), s"missing after recovery: $p"))
    assert(stagingDirs.isEmpty)
    assert(manifests.isEmpty)
    // and the data is complete, not truncated
    assert(spark.read.parquet(finals(1)).count() == 200)
  }

  test("group overwrite replaces prior content atomically") {
    rmrf(new java.io.File(root))
    GroupCommit.commitGroup(spark, root, sinks())
    val next = finals.map(dest =>
      Sink(spark.range(7).toDF("id"), dest))
    GroupCommit.commitGroup(spark, root, next)
    finals.foreach(p => assert(spark.read.parquet(p).count() == 7, p))
  }

  test("vacuum removes pre-decision orphans, keeps committed data and pending groups") {
    rmrf(new java.io.File(root))
    GroupCommit.commitGroup(spark, root, sinks())
    // a pre-decision crash leaves staging dirs with no manifest
    intercept[Exception] {
      GroupCommit.commitGroup(spark, root, sinks(),
        injectFailure = Some(FailPoint.BeforeManifest))
    }
    // simulate JVM death instead of rollback: recreate orphan staging dirs
    spark.range(5).toDF("id").write.mode("overwrite")
      .parquet(s"$root/a.__staging__deadbeef")
    // a PENDING (post-decision) group: staging dir + live manifest
    spark.range(5).toDF("id").write.mode("overwrite")
      .parquet(s"$root/d.__staging__pending1")
    val mdir = new java.io.File(s"$root/_group_commits")
    mdir.mkdirs()
    val m = new java.io.File(mdir, "pending1")
    val w = new java.io.FileWriter(m)
    w.write(s"$root/d.__staging__pending1\t$root/d"); w.close()

    val removed = GroupCommit.vacuum(spark, root)
    assert(removed == 1, s"expected exactly the orphan removed, got $removed")
    assert(!exists(s"$root/a.__staging__deadbeef"))
    assert(exists(s"$root/d.__staging__pending1"), "pending staging must survive")
    finals.foreach(p => assert(exists(p), p)) // committed data untouched
    // recover() then vacuum: the pending group publishes, nothing left to clean
    GroupCommit.recover(spark, root)
    assert(spark.read.parquet(s"$root/d").count() == 5)
    assert(GroupCommit.vacuum(spark, root) == 0)
    assert(stagingDirs.isEmpty)
  }

  test("rollback leaves zero residue under concurrent load (zombie-task race)") {
    // The r10 full-suite flake: a sibling task of the failing write was
    // still materializing `_temporary` files when the rollback's
    // recursive delete ran, so the staging dir survived. The fix is a
    // job-group cancel + status-tracker drain before the delete; this
    // test recreates the load profile in-spec — repeated failing-sink
    // rollbacks with MANY partitions (more sibling tasks in flight at
    // failure time) while a background thread keeps the scheduler busy.
    rmrf(new java.io.File(root))
    @volatile var stop = false
    val noise = new Thread(() => {
      while (!stop)
        spark.range(2000000).selectExpr("sum(id * 3 % 7)").collect()
    })
    noise.setDaemon(true)
    noise.start()
    try {
      for (i <- 1 to 6) {
        // 16 partitions; one poisoned row in partition 7 — the failing
        // task dies mid-stage while 15 siblings are writing
        val poisoned = Sink(
          spark.range(0, 160000, 1, 16)
            .selectExpr("IF(id = 75000, raise_error('boom'), id) AS id"),
          finals(2))
        intercept[Exception] {
          GroupCommit.commitGroup(spark, root,
            sinks().init :+ poisoned)
        }
        finals.foreach(p =>
          assert(!exists(p), s"iter $i: partial output visible: $p"))
        assert(stagingDirs.isEmpty,
          s"iter $i: staging residue: ${stagingDirs.mkString(",")}")
      }
    } finally {
      stop = true
      noise.join(10000)
    }
  }
}
