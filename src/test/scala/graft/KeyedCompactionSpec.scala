package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KeyedTable

/** Manifest-aware compaction for the keyed table: a sustained change
  * feed appends one small file per touched gap per trigger
  * (KeyedTable.mergeDelta), so file count grows with trigger count;
  * KeyedTable.compact() coalesces runs of adjacent small files into a
  * new VERSION — old manifests still resolve, non-overlap survives,
  * expire() GCs the replaced debris. The generic Compaction pass must
  * never touch a keyed table (it rewrites files behind the manifests);
  * this is its versioned replacement.
  */
class KeyedCompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  private val root = "/tmp/graft_keyedcompact"

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  private def upsert(cur: DataFrame, ch: DataFrame): DataFrame = {
    val upd = ch.selectExpr("k", "v AS new_v")
    cur.join(upd, Seq("k"), "left")
      .selectExpr("k", "coalesce(new_v, v) AS v")
      .unionByName(ch.join(cur.selectExpr("k"), Seq("k"), "left_anti")
        .selectExpr("k", "v"))
  }

  private def diskFiles(table: String): Set[String] = {
    val dir = new java.io.File(s"$root/$table/files")
    Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName)
      .filter(_.endsWith(".parquet")).toSet // not the local-FS .crc shadows
  }

  private def assertNonOverlapping(table: String): Unit =
    KeyedTable.manifest(spark, root, table).sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey < b.minKey,
        s"overlap: ${a.relPath}[${a.minKey},${a.maxKey}] vs " +
          s"${b.relPath}[${b.minKey},${b.maxKey}]")
      case _ =>
    }

  test("50-merge soak: gap debris accumulates, compact() bounds the file count, content and old versions survive") {
    rmrf(new java.io.File(root))
    val base = spark.range(0, 10000).toDF("k")
      .selectExpr("k", "(k * 7 % 1000) AS v")
    KeyedTable.write(spark, root, "t1", base, "k", nFiles = 8)
    val baseFiles = KeyedTable.manifest(spark, root, "t1").size

    // the soak: 50 sparse insert-only batches, each into its own gap
    // far beyond the base span — every merge appends one debris file
    val merges = 50
    (0 until merges).foreach { i =>
      val lo = 1000000L + i * 1000L
      val batch = spark.range(lo, lo + 10).toDF("k")
        .selectExpr("k", "CAST(-7 AS BIGINT) AS v")
      val st = KeyedTable.mergeDelta(spark, root, "t1", batch, "k")(upsert)
      assert(st.filesRewritten == 0 && st.filesAppended >= 1)
    }
    val soaked = KeyedTable.manifest(spark, root, "t1")
    assert(soaked.size >= baseFiles + merges,
      s"soak must accumulate debris: ${soaked.size} files")
    val preCompactVersion = KeyedTable.latestVersion(spark, root, "t1")
    val expect = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.size == 10000 + merges * 10)

    // compact: base files are 1250 rows each, debris files 10 rows each;
    // targetRows=2000 marks ALL of them small — debris coalesces, and
    // the adjacent small base files coalesce too (runs chunk at ~2000)
    val st = KeyedTable.compact(spark, root, "t1", "k", targetRows = 2000)
    assert(st.filesCompacted >= merges,
      s"the ${merges} debris files must compact, got ${st.filesCompacted}")
    assert(st.filesAfter <= baseFiles + 2,
      s"file count must be bounded after compaction: ${st.filesAfter}")
    assert(st.version == preCompactVersion + 1)
    assertNonOverlapping("t1")

    // content identical through the rewrite
    val got = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // time travel: the pre-compaction version still resolves exactly
    val old = KeyedTable.read(spark, root, "t1", preCompactVersion)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(old == expect)

    // retention GC: replaced debris leaves the disk, content unchanged
    val (_, removed) = KeyedTable.expire(spark, root, "t1", keepLast = 1)
    assert(removed >= st.filesCompacted)
    assert(diskFiles("t1").size == KeyedTable.manifest(spark, root, "t1").size)
    val afterGc = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterGc == expect)
  }

  test("compact is a no-op when no run qualifies: no version churn") {
    val v = KeyedTable.latestVersion(spark, root, "t1")
    // after the soak's compaction every file is ~2000 rows; a 100-row
    // threshold finds nothing small enough to coalesce
    val st = KeyedTable.compact(spark, root, "t1", "k", targetRows = 100)
    assert(st.filesCompacted == 0)
    assert(st.version == v, "a no-op compact must not register a version")
    assert(KeyedTable.latestVersion(spark, root, "t1") == v)
  }

  test("merges keep working against the compacted manifest") {
    val pre = KeyedTable.read(spark, root, "t1").count()
    // an update inside the old base span + an insert into a fresh gap
    val batch = spark.range(42, 52).toDF("k")
      .selectExpr("k", "CAST(-9 AS BIGINT) AS v")
      .unionByName(spark.range(5000000L, 5000005L).toDF("k")
        .selectExpr("k", "CAST(-9 AS BIGINT) AS v"))
    val st = KeyedTable.mergeDelta(spark, root, "t1", batch, "k")(upsert)
    assert(st.filesRewritten >= 1 && st.filesAppended >= 1)
    assertNonOverlapping("t1")
    val got = KeyedTable.read(spark, root, "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == pre + 5)
    (42L until 52L).foreach(k => assert(got(k) == -9L))
    (5000000L until 5000005L).foreach(k => assert(got(k) == -9L))
  }
}
