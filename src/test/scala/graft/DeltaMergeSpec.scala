package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KeyedTable

/** File-pruned copy-on-write merge (graft.sources.KeyedTable): a change
  * batch rewrites ONLY the data files whose footer key range it
  * intersects; every other file carries into the next version BY
  * REFERENCE (same path, same bytes). This is the O(delta · fanout)
  * per-merge discipline that keeps a continuously-upserted 100 TB table
  * affordable — the commit granularity the reference's output
  * committers publish at
  * (tez-mapreduce/src/main/java/org/apache/tez/mapreduce/committer/MROutputCommitter.java;
  * DAG-success group commit in
  * tez-dag/src/main/java/org/apache/tez/dag/app/dag/impl/DAGImpl.java).
  */
class DeltaMergeSpec extends AnyFunSuite {
  import SparkTestSession._

  private val root = "/tmp/graft_deltamerge"

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  /** 10k keyed rows → 16 key-sorted files with tight footer ranges. */
  private def freshTable(table: String): Unit = {
    val df = spark.range(0, 10000).toDF("k")
      .selectExpr("k", "(k * 7 % 1000) AS v")
    KeyedTable.write(spark, root, table, df, "k", nFiles = 16)
  }

  /** Key-local upsert: replace v for matching keys, insert fresh keys. */
  private def upsert(cur: org.apache.spark.sql.DataFrame,
      ch: org.apache.spark.sql.DataFrame) = {
    val upd = ch.selectExpr("k", "v AS new_v")
    cur.join(upd, Seq("k"), "left")
      .selectExpr("k", "coalesce(new_v, v) AS v")
      .unionByName(ch.join(cur.selectExpr("k"), Seq("k"), "left_anti")
        .selectExpr("k", "v"))
  }

  private def fileStates(table: String): Map[String, (Long, Long)] = {
    val dir = new java.io.File(s"$root/$table/files")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("sparse batch rewrites only the intersecting files; the rest carry by reference, bytes untouched") {
    rmrf(new java.io.File(root))
    freshTable("t1")
    val before = KeyedTable.manifest(spark, root, "t1")
    assert(before.size >= 12, s"expected ~16 files, got ${before.size}")
    val pre = fileStates("t1")
    // batch confined to ONE file's key span + one far-beyond insert
    val target = before(3)
    val batch = spark.range(target.minKey, target.minKey + 5).toDF("k")
      .selectExpr("k", "CAST(-1 AS BIGINT) AS v")
      .unionByName(spark.sql("SELECT CAST(900000 AS BIGINT) AS k, CAST(42 AS BIGINT) AS v"))
    val stats = KeyedTable.mergeDelta(spark, root, "t1", batch, "k")(upsert)
    assert(stats.filesTotal == before.size)
    assert(stats.filesRewritten == 1,
      s"sparse batch must rewrite exactly the 1 intersecting file, got ${stats.filesRewritten}")
    assert(stats.filesAppended == 1, "the far insert appends one gap file")
    assert(stats.filesCarried == before.size - 1)
    // carried files: same name, same length, same mtime — never rewritten
    val after = fileStates("t1")
    val carried = KeyedTable.manifest(spark, root, "t1")
      .map(_.relPath.stripPrefix("files/"))
      .filter(pre.contains)
    assert(carried.size == stats.filesCarried)
    carried.foreach { name =>
      assert(after(name) == pre(name), s"$name was modified in place")
    }
    // merged content equals the relational upsert over the full table
    val expect = upsert(
      spark.range(0, 10000).toDF("k").selectExpr("k", "(k * 7 % 1000) AS v"),
      batch).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("empty change batch: zero files rewritten, zero appended, state identical") {
    rmrf(new java.io.File(root))
    freshTable("t2")
    val empty = spark.range(0).toDF("k").selectExpr("k", "k AS v")
    val stats = KeyedTable.mergeDelta(spark, root, "t2", empty, "k")(upsert)
    assert(stats.filesRewritten == 0 && stats.filesAppended == 0)
    assert(stats.filesCarried == stats.filesTotal)
    assert(KeyedTable.read(spark, root, "t2", 2).count() == 10000)
  }

  test("file key ranges stay sorted and non-overlapping across merges (the pruning invariant)") {
    rmrf(new java.io.File(root))
    freshTable("t3")
    // three merges: mid-span updates, gap inserts, beyond-max inserts
    val batches = Seq(
      spark.range(2000, 2100).toDF("k").selectExpr("k", "CAST(0 AS BIGINT) AS v"),
      spark.range(20000, 20050).toDF("k").selectExpr("k", "CAST(1 AS BIGINT) AS v"),
      spark.range(5000, 5010).toDF("k").selectExpr("k", "CAST(2 AS BIGINT) AS v")
        .unionByName(spark.range(30000, 30005).toDF("k")
          .selectExpr("k", "CAST(3 AS BIGINT) AS v")))
    batches.foreach(b => KeyedTable.mergeDelta(spark, root, "t3", b, "k")(upsert))
    val m = KeyedTable.manifest(spark, root, "t3")
    m.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.maxKey < b.minKey,
          s"overlap: ${a.relPath}[${a.minKey},${a.maxKey}] vs ${b.relPath}[${b.minKey},${b.maxKey}]")
      case _ =>
    }
    assert(m.forall(e => e.minKey <= e.maxKey && e.rows > 0))
    assert(KeyedTable.read(spark, root, "t3").count() == 10000 + 50 + 5)
  }

  test("micro-batch composition equals the one-shot merge (key-disjoint batches commute)") {
    rmrf(new java.io.File(root))
    freshTable("t4")
    freshTable("t5")
    val all = spark.range(1000, 1200).toDF("k")
      .selectExpr("k", "CAST(-7 AS BIGINT) AS v")
      .unionByName(spark.range(50000, 50020).toDF("k")
        .selectExpr("k", "CAST(9 AS BIGINT) AS v"))
    KeyedTable.mergeDelta(spark, root, "t4", all, "k")(upsert)
    Seq(all.filter("k % 2 = 0"), all.filter("k % 2 = 1"))
      .foreach(b => KeyedTable.mergeDelta(spark, root, "t5", b, "k")(upsert))
    val a = KeyedTable.read(spark, root, "t4").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KeyedTable.read(spark, root, "t5").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("expire drops unreferenced files but never one a surviving version still uses") {
    rmrf(new java.io.File(root))
    freshTable("t6")
    val b1 = spark.range(100, 110).toDF("k").selectExpr("k", "CAST(0 AS BIGINT) AS v")
    val b2 = spark.range(9000, 9010).toDF("k").selectExpr("k", "CAST(1 AS BIGINT) AS v")
    KeyedTable.mergeDelta(spark, root, "t6", b1, "k")(upsert)
    KeyedTable.mergeDelta(spark, root, "t6", b2, "k")(upsert)
    val latest = KeyedTable.read(spark, root, "t6").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (dropped, removed) = KeyedTable.expire(spark, root, "t6", keepLast = 1)
    assert(dropped == Seq(1L, 2L))
    assert(removed >= 2, "v1/v2-only replaced files must be GC'd")
    val after = KeyedTable.read(spark, root, "t6").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == latest)
  }
}
