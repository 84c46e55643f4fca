package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** IVF write-time partitioning — the 100 TB ANN serving path the
  * q_ann_ivf scaladoc promises: the corpus is written PARTITIONED by its
  * coarse-quantizer cell, so a probe against nprobe cells reads ONLY
  * those cells' files (partition pruning at the source listing — a probe
  * over a 100 TB corpus never opens the other cells), and the in-cell
  * search result is identical to computing cells on the fly.
  */
class IvfWriteSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  // must match superSplit(adaptiveCells(fixture N)) = (4, 4) — the
  // two-level quantizer q_ann_ivf routes through since r07
  private val SCells = 4
  private val MCells = 4

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("cell-partitioned corpus serves pruned probes that match the on-the-fly IVF query") {
    GraftFunctions.register(spark)
    graft.functions.TextHashFunctions.register(spark)
    val dir = new java.io.File("/tmp/graft_ivf_corpus")
    rmrf(dir)
    Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding",
        s"CAST(graft_ivf_cell_h(embedding, $SCells, $MCells) AS INT) AS cell")
      .write.partitionBy("cell").parquet(dir.getPath)

    // cell directories exist (one per non-empty cell)
    val cellDirs = dir.listFiles().filter(_.isDirectory).map(_.getName)
    assert(cellDirs.nonEmpty && cellDirs.forall(_.startsWith("cell=")),
      cellDirs.mkString(","))

    // probe: every query vector searches its own cell, read FROM THE
    // PARTITIONED TABLE with a pruned scan
    val corpus = spark.read.parquet(dir.getPath)
    val probeCells = Set(3, 7)
    val probed = corpus.filter(col("cell").isin(probeCells.toSeq: _*))
    probed.collect()
    val scanStr = probed.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters"), scanStr.take(400))
    // pruned read touches only the probed cells' rows
    val expectRows = Tables.embeddings(spark, sf)
      .selectExpr(s"CAST(graft_ivf_cell_h(embedding, $SCells, $MCells) AS INT) AS cell")
      .filter(col("cell").isin(probeCells.toSeq: _*)).count()
    assert(probed.count() == expectRows)

    // end-to-end parity: q_ann_ivf recomputed over the partitioned table
    // (cell read from the directory layout, not recomputed) equals the
    // declared query's result
    val q = corpus.selectExpr("vec_id AS query_id", "embedding AS qe",
      "graft_vec_dot(embedding, embedding) AS qn2", "cell")
    val c = corpus.selectExpr("vec_id AS neighbor_id", "embedding AS ce",
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
