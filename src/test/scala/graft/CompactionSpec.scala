package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Small-file compaction: a fragmented table (64 tiny files — the
  * leftovers of micro-batch ingest) rewritten into size-targeted files;
  * data must be bit-identical and the scan must plan fewer tasks. */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("compaction shrinks file count, preserves data, and reduces planned tasks") {
    val frag = "/tmp/graft_compact/fragmented"
    val tidy = "/tmp/graft_compact/compacted"
    Seq(frag, tidy).foreach(d => rmrf(new java.io.File(d)))

    // fragment: 64 files for ~1 MB of orders data
    Tables.orders(spark, sf).repartition(64)
      .write.mode("overwrite").parquet(frag)
    val before = Compaction.dataFiles(spark, frag)
    assert(before == 64, s"fixture setup: expected 64 fragments, got $before")

    val target = math.max(1L, Compaction.dataBytes(spark, frag) / 4)
    val n = Compaction.compact(spark, frag, tidy, target)
    val after = Compaction.dataFiles(spark, tidy)
    assert(after == n, s"wrote $after files, planned $n")
    assert(after <= 5, s"compaction left $after files for a 4-file target")

    // bit-identical data
    val a = spark.read.parquet(frag).orderBy("o_orderkey").collect()
    val b = spark.read.parquet(tidy).orderBy("o_orderkey").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }

    // fewer scan partitions with a small maxPartitionBytes (the many-
    // small-files regime where per-file overhead dominates planning)
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, (64 * 1024).toString)
      val tasksBefore = spark.read.parquet(frag).rdd.getNumPartitions
      val tasksAfter = spark.read.parquet(tidy).rdd.getNumPartitions
      assert(tasksAfter < tasksBefore,
        s"compaction should reduce planned scan tasks: $tasksBefore -> $tasksAfter")
    } finally spark.conf.set(key, prev)
  }
}
