package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Small-file compaction — the table-maintenance job every long-lived
  * corpus directory needs: streaming/incremental ingest leaves
  * thousands of small files per partition, and scan efficiency at
  * 100 TB depends on row groups near the target block size (a scan
  * over 64 tiny files pays 64 footer reads + task overheads for one
  * file's worth of data).
  *
  * Asserts the compaction contract: byte-targeted file count (computed
  * from the observed input size, the way a real compactor sizes its
  * repartition), exact content preservation (row multiset unchanged),
  * and per-file record capping as the alternative knob
  * (maxRecordsPerFile).
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(): Unit
  }

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    dir.listFiles().toSeq.filter(f => f.getName.endsWith(".parquet"))

  test("byte-targeted compaction collapses a fragmented table, content-exact") {
    val frag = new java.io.File("/tmp/graft_fragmented")
    val compact = new java.io.File("/tmp/graft_compacted")
    rmrf(frag); rmrf(compact)

    // incremental ingest residue: 64 small files
    val docs = Tables.documents(spark, sf)
    docs.repartition(64).write.parquet(frag.getPath)
    assert(Compaction.dataFiles(spark, frag.getPath) == 64)

    // compactor: size the output by observed bytes / target file size
    val targetBytes = 256L * 1024
    val nOut = Compaction.compact(spark, frag.getPath, compact.getPath, targetBytes)
    assert(nOut < 8, s"fixture should compact to a few files, got $nOut")
    assert(Compaction.dataFiles(spark, compact.getPath) == nOut)

    // content preservation: exact row multiset both directions
    val a = spark.read.parquet(frag.getPath)
    val b = spark.read.parquet(compact.getPath)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compaction changed the row multiset")
  }

  test("maxRecordsPerFile caps file size from the write side") {
    val dir = new java.io.File("/tmp/graft_capped")
    rmrf(dir)
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val n = docs.count()
    val cap = 100L
    docs.coalesce(1)
      .write.option("maxRecordsPerFile", cap).parquet(dir.getPath)
    val files = dataFiles(dir)
    assert(files.size == math.ceil(n.toDouble / cap).toInt,
      s"expected ceil($n/$cap) files, got ${files.size}")
    // every file respects the cap
    files.foreach { f =>
      val c = spark.read.parquet(f.getPath).count()
      assert(c <= cap, s"${f.getName} holds $c rows > cap $cap")
    }
  }
}
