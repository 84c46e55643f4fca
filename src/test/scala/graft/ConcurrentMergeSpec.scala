package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KeyedTable

/** Optimistic concurrency on the keyed table (graft.sources.KeyedTable):
  * of N writers sharing a manifest snapshot, exactly ONE commits; every
  * loser fails cleanly — after staging, before registering — and its
  * orphaned data files are GC'd by expire(). The critical property is
  * that the commit version is the writer's SNAPSHOT version + 1, never
  * recomputed at commit time: a writer allowed to re-read the latest
  * version would commit on top of a version it never saw and silently
  * drop that version's changes (lost update). The reference serializes
  * the same decision through the single-writer AM's commit path
  * (tez-dag/src/main/java/org/apache/tez/dag/app/dag/impl/DAGImpl.java,
  * commit-start/commit-finish recovery events); a shared-FS table gets
  * the equivalent from the atomic exclusive version claim.
  */
class ConcurrentMergeSpec extends AnyFunSuite {
  import SparkTestSession._

  private val root = "/tmp/graft_concmerge"

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  private def freshTable(table: String): Unit = {
    val df = spark.range(0, 10000).toDF("k")
      .selectExpr("k", "(k * 7 % 1000) AS v")
    KeyedTable.write(spark, root, table, df, "k", nFiles = 16)
  }

  private def upsert(cur: DataFrame, ch: DataFrame): DataFrame = {
    val upd = ch.selectExpr("k", "v AS new_v")
    cur.join(upd, Seq("k"), "left")
      .selectExpr("k", "coalesce(new_v, v) AS v")
      .unionByName(ch.join(cur.selectExpr("k"), Seq("k"), "left_anti")
        .selectExpr("k", "v"))
  }

  private def dataFiles(table: String): Set[String] = {
    val dir = new java.io.File(s"$root/$table/files")
    Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName)
      .filter(_.endsWith(".parquet")).toSet // not the local-FS .crc shadows
  }

  /** Run `body` in a thread, capture success or failure. */
  private def fork(body: => KeyedTable.MergeStats)
      : (Thread, java.util.concurrent.atomic.AtomicReference[Either[Throwable, KeyedTable.MergeStats]]) = {
    val out = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, KeyedTable.MergeStats]]()
    val t = new Thread(() =>
      out.set(try Right(body) catch { case e: Throwable => Left(e) }))
    t.start()
    (t, out)
  }

  test("two merges racing from one snapshot: exactly one commits, the loser throws cleanly") {
    rmrf(new java.io.File(root))
    freshTable("t1")
    // both batches sit inside existing file spans (rewrite path only),
    // so each merge invokes mergeFn exactly once — the barrier inside it
    // guarantees BOTH writers have read the v1 snapshot before EITHER
    // stages or commits, making the v2 claim contention deterministic
    val gate = new CyclicBarrier(2)
    def merge(lo: Long): KeyedTable.MergeStats = {
      val batch = spark.range(lo, lo + 10).toDF("k")
        .selectExpr("k", s"CAST(${lo} AS BIGINT) AS v")
      KeyedTable.mergeDelta(spark, root, "t1", batch, "k") { (cur, ch) =>
        gate.await(60, TimeUnit.SECONDS)
        upsert(cur, ch)
      }
    }
    val (ta, ra) = fork(merge(100))
    val (tb, rb) = fork(merge(5000))
    ta.join(120000); tb.join(120000)
    val results = Seq(ra.get(), rb.get())
    val wins = results.collect { case Right(s) => s }
    val losses = results.collect { case Left(e) => e }
    assert(wins.size == 1, s"exactly one writer must commit, got $results")
    assert(losses.size == 1 &&
      losses.head.getMessage.contains("lost the version race"),
      s"loser must fail the version claim, got ${losses.head}")
    assert(wins.head.version == 2)
    assert(KeyedTable.latestVersion(spark, root, "t1") == 2)
    // the committed table reflects EXACTLY the winner's batch
    val winnerLo = if (ra.get().isRight) 100L else 5000L
    val loserLo = if (winnerLo == 100L) 5000L else 100L
    val got = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 10000)
    (winnerLo until winnerLo + 10).foreach(k => assert(got(k) == winnerLo))
    (loserLo until loserLo + 10).foreach(k => assert(got(k) == k * 7 % 1000,
      s"loser's write leaked into the committed version at key $k"))
  }

  test("loser's staged orphans are unreferenced and expire() GCs them") {
    // continues from the race above: the loser staged its rewrite into
    // files/ before failing the claim — those files must be orphans
    // (no manifest references them) and retention GC must remove them
    val live = (1L to KeyedTable.latestVersion(spark, root, "t1"))
      .flatMap(v => KeyedTable.manifest(spark, root, "t1", v))
      .map(_.relPath.stripPrefix("files/")).toSet
    val orphans = dataFiles("t1") -- live
    assert(orphans.nonEmpty, "the losing merge must have staged orphan files")
    val before = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (_, removed) = KeyedTable.expire(spark, root, "t1", keepLast = 1)
    assert(removed >= orphans.size)
    assert(dataFiles("t1").intersect(orphans).isEmpty)
    val after = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "GC must not change the committed version")
  }

  test("a merge from a STALE snapshot fails instead of silently dropping the newer version") {
    rmrf(new java.io.File(root))
    freshTable("t2")
    // writer A reads the v1 snapshot, then parks inside mergeFn until
    // writer B has FULLY committed v2; A then commits from its stale
    // snapshot — it must fail (its carried file list predates v2), not
    // register a v3 that silently omits B's changes
    val aParked = new CountDownLatch(1)
    val bDone = new CountDownLatch(1)
    val (ta, ra) = fork {
      val batch = spark.range(100, 110).toDF("k")
        .selectExpr("k", "CAST(-1 AS BIGINT) AS v")
      KeyedTable.mergeDelta(spark, root, "t2", batch, "k") { (cur, ch) =>
        aParked.countDown()
        assert(bDone.await(60, TimeUnit.SECONDS), "B never finished")
        upsert(cur, ch)
      }
    }
    assert(aParked.await(60, TimeUnit.SECONDS), "A never reached mergeFn")
    val batchB = spark.range(5000, 5010).toDF("k")
      .selectExpr("k", "CAST(-2 AS BIGINT) AS v")
    val sb = KeyedTable.mergeDelta(spark, root, "t2", batchB, "k")(upsert)
    assert(sb.version == 2)
    bDone.countDown()
    ta.join(120000)
    ra.get() match {
      case Left(e) =>
        assert(e.getMessage.contains("lost the version race"), e.getMessage)
      case Right(s) =>
        fail(s"stale-snapshot merge must not commit (committed v=${s.version})")
    }
    // B's changes survive; A's do not
    val got = KeyedTable.read(spark, root, "t2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (5000L until 5010L).foreach(k => assert(got(k) == -2L))
    (100L until 110L).foreach(k => assert(got(k) == k * 7 % 1000))
  }
}
