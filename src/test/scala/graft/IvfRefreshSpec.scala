package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** IVF index MAINTENANCE — the other half of the serving story
  * (IvfWriteSpec proves the pruned probe; this proves the refresh):
  * an arriving ingest batch is assigned cells under the SAME
  * deterministic coarse quantizer and APPENDED into the
  * cell-partitioned layout — no rebuild, no touch of existing files.
  * The refreshed index must be indistinguishable from a from-scratch
  * full rebuild: identical (vec_id, cell) content, partition pruning
  * still at the file listing (a probe reads only its cells' files,
  * old and new alike), and the declared q_ann_ivf result recomputed
  * over the refreshed table is bit-identical. At 100 TB this is why
  * ingest cost is ∝ batch (assign + one partitioned append) while the
  * 100 TB index never rewrites — centroids are deterministic, so cell
  * assignment never drifts between build and refresh.
  */
class IvfRefreshSpec extends AnyFunSuite {
  import SparkTestSession._

  // must match superSplit(adaptiveCells(fixture N)) = (4, 4) — the
  // two-level quantizer q_ann_ivf routes through since r07
  private val SCells = 4
  private val MCells = 4

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(): Unit
  }

  test("appending an arrival batch to the cell-partitioned index equals a full rebuild") {
    GraftFunctions.register(spark)
    graft.functions.TextHashFunctions.register(spark)
    val dir = new java.io.File("/tmp/graft_ivf_refresh")
    rmrf(dir)
    val all = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding",
        s"CAST(graft_ivf_cell_h(embedding, $SCells, $MCells) AS INT) AS cell")

    // initial build: the standing corpus (arrivals excluded)
    all.filter(col("vec_id") % 10 =!= 0)
      .write.partitionBy("cell").parquet(dir.getPath)
    val filesBefore = spark.read.parquet(dir.getPath).inputFiles.toSet

    // refresh: assign arrivals under the same quantizer, append
    all.filter(col("vec_id") % 10 === 0)
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(dir.getPath)

    // existing files untouched (append, not rewrite)
    val merged = spark.read.parquet(dir.getPath)
    assert(filesBefore.subsetOf(merged.inputFiles.toSet),
      "refresh rewrote existing index files")

    // content equals a full rebuild: same (vec_id, cell) set
    val got = merged.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val want = all.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length}")

    // pruning survives the append: the probe scan carries a partition
    // filter and touches exactly the probed cell's rows (old + appended)
    val probed = merged.filter(col("cell") === 3)
    probed.collect()
    val scanStr = probed.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters"), scanStr.take(400))
    val wantCell3 = all.filter(col("cell") === 3).count()
    assert(probed.count() == wantCell3)

    // the declared IVF query recomputed over the REFRESHED table is
    // bit-identical to the declared result over the raw corpus
    val q = merged.selectExpr("vec_id AS query_id", "embedding AS qe",
      "graft_vec_dot(embedding, embedding) AS qn2", "cell")
    val c = merged.selectExpr("vec_id AS neighbor_id", "embedding AS ce",
      "graft_vec_dot(embedding, embedding) AS cn2", "cell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val fromTable = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .selectExpr("query_id", "neighbor_id", "cell",
        "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("query_id", "rn")
      .collect().toSeq
    val declared = SparkEntry.queries("q_ann_ivf")(spark, sf).collect().toSeq
    assert(fromTable.size == declared.size,
      s"rowcount ${fromTable.size} vs ${declared.size}")
    fromTable.zip(declared).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }
}
