package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GroupCommit, SnapshotCatalog}

/** SnapshotCatalog invariants: version isolation, latest resolution,
  * and crash consistency at both GroupCommit failure points — a reader
  * can never observe a half-registered version, and a failed commit
  * never burns or corrupts the version sequence.
  */
class SnapshotCatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mkRoot() =
    java.nio.file.Files.createTempDirectory("graft_snapspec").toString

  test("versions are isolated, latest resolves, multi-sink reads back") {
    val root = mkRoot()
    val v1 = spark.range(10).selectExpr("id AS k", "id * 2 AS v")
    val v2 = spark.range(12).selectExpr("id AS k", "id * 3 AS v")
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("CAST(count(*) AS BIGINT) AS n_rows")
    assert(SnapshotCatalog.commit(spark, root, "t",
      Seq("data" -> v1, "stats" -> stats(v1))) == 1L)
    assert(SnapshotCatalog.commit(spark, root, "t",
      Seq("data" -> v2, "stats" -> stats(v2))) == 2L)
    assert(SnapshotCatalog.latestVersion(spark, root, "t") == 2L)
    // v1 is immutable history, v2 is latest; stats sink rides along
    assert(SnapshotCatalog.read(spark, root, "t", 1L).count() == 10L)
    assert(SnapshotCatalog.read(spark, root, "t").count() == 12L)
    assert(SnapshotCatalog.read(spark, root, "t", 1L, "stats")
      .collect()(0).getLong(0) == 10L)
    assert(SnapshotCatalog.read(spark, root, "t", 2L, "stats")
      .collect()(0).getLong(0) == 12L)
    val sum1 = SnapshotCatalog.read(spark, root, "t", 1L)
      .selectExpr("sum(v)").collect()(0).getLong(0)
    assert(sum1 == (0 until 10).map(_ * 2).sum)
  }

  test("expire keeps the newest versions and never reissues numbers") {
    val root = mkRoot()
    (1 to 3).foreach { i =>
      val df = spark.range(i * 10L).selectExpr("id AS k")
      assert(SnapshotCatalog.commit(spark, root, "t", Seq("data" -> df)) == i)
    }
    assert(SnapshotCatalog.expire(spark, root, "t", keepLast = 1) == Seq(1L, 2L))
    // survivor intact, history unaddressable, number sequence monotonic
    assert(SnapshotCatalog.latestVersion(spark, root, "t") == 3L)
    assert(SnapshotCatalog.read(spark, root, "t").count() == 30L)
    intercept[Throwable] { SnapshotCatalog.read(spark, root, "t", 1L) }
    val df4 = spark.range(40).selectExpr("id AS k")
    assert(SnapshotCatalog.commit(spark, root, "t", Seq("data" -> df4)) == 4L)
    assert(SnapshotCatalog.expire(spark, root, "t", keepLast = 2) == Seq.empty)
  }

  test("pre-decision failure: no new version, sequence intact, retry works") {
    val root = mkRoot()
    val df = spark.range(5).selectExpr("id AS k")
    SnapshotCatalog.commit(spark, root, "t", Seq("data" -> df))
    intercept[Throwable] {
      SnapshotCatalog.commit(spark, root, "t", Seq("data" -> df),
        injectFailure = Some("before-manifest"))
    }
    assert(SnapshotCatalog.latestVersion(spark, root, "t") == 1L)
    assert(SnapshotCatalog.read(spark, root, "t").count() == 5L)
    // the failed number is reused, not burned
    assert(SnapshotCatalog.commit(spark, root, "t", Seq("data" -> df)) == 2L)
    assert(SnapshotCatalog.read(spark, root, "t").count() == 5L)
  }

  test("post-decision failure: version unregistered until a clean re-commit") {
    val root = mkRoot()
    val a = spark.range(7).selectExpr("id AS k")
    val b = spark.range(9).selectExpr("id AS k")
    SnapshotCatalog.commit(spark, root, "t", Seq("data" -> a, "aux" -> a))
    // dies BETWEEN sink publishes: the group decision is durable (a
    // manifest is pending) but the catalog log entry never lands
    intercept[Throwable] {
      SnapshotCatalog.commit(spark, root, "t", Seq("data" -> b, "aux" -> b),
        injectFailure = Some("after-first-publish"))
    }
    // a reader still sees only v1 — the half-published version is
    // unaddressable because registration is strictly after publish
    assert(SnapshotCatalog.latestVersion(spark, root, "t") == 1L)
    assert(SnapshotCatalog.read(spark, root, "t").count() == 7L)
    intercept[Throwable] { SnapshotCatalog.read(spark, root, "t", 2L) }
    // session restart path: recovery rolls the group forward, then a
    // re-commit claims the same number and registers it atomically
    GroupCommit.recover(spark, root)
    assert(SnapshotCatalog.latestVersion(spark, root, "t") == 1L)
    assert(SnapshotCatalog.commit(spark, root, "t",
      Seq("data" -> b, "aux" -> b)) == 2L)
    assert(SnapshotCatalog.read(spark, root, "t").count() == 9L)
    assert(SnapshotCatalog.read(spark, root, "t", 2L, "aux").count() == 9L)
  }
}
