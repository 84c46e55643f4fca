package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Write-time partitioning on the TRAINED codebook — the serving loop
  * of the clustered-corpus ANN path: the corpus is written PARTITIONED
  * by its trained cell (stable: seeds are strided EXISTING-corpus
  * vectors, and q_ann_incremental_trained's seedWhere contract means an
  * arriving batch never shifts them), so an ingest batch routes through
  * the broadcast codebook and reads ONLY its home cells' files via
  * partition pruning. The hash-quantizer twin is IvfWriteSpec; this
  * spec proves the same mechanics hold when cell ids are data-derived,
  * and that batch-probe results from the partitioned table equal the
  * declared q_ann_incremental_trained rows.
  */
class TrainedWriteSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("trained-cell-partitioned corpus serves pruned incremental probes") {
    GraftFunctions.register(spark)
    val dir = new java.io.File("/tmp/graft_trained_corpus")
    rmrf(dir)

    // the EXISTING corpus (non-arrivals), written partitioned by its
    // trained cell; the codebook is trained on exactly these rows —
    // the q_ann_incremental_trained seedWhere contract
    val assigned = ops.SimilarityQueries
      .trainedCells(spark, sf, seedWhere = "vec_id % 10 <> 0")
    assigned.filter(col("vec_id") % 10 =!= 0)
      .select("vec_id", "embedding", "cell")
      .write.partitionBy("cell").parquet(dir.getPath)

    val cellDirs = dir.listFiles().filter(_.isDirectory).map(_.getName)
    assert(cellDirs.nonEmpty && cellDirs.forall(_.startsWith("cell=")),
      cellDirs.mkString(","))

    // an arriving batch probes its home cells: the scan of the served
    // table is partition-pruned to those cells and reads exactly their
    // rows
    val corpus = spark.read.parquet(dir.getPath)
    val arrivalCells = assigned.filter(col("vec_id") % 10 === 0)
      .select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    val someCells = arrivalCells.take(2).toSeq
    val probed = corpus.filter(col("cell").isin(someCells: _*))
    probed.collect()
    val scanStr = probed.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters"), scanStr.take(400))
    val expectRows = assigned.filter(col("vec_id") % 10 =!= 0)
      .filter(col("cell").isin(someCells: _*)).count()
    assert(probed.count() == expectRows)

    // end-to-end parity: the incremental probe recomputed over the
    // partitioned table (cells read from the directory layout for the
    // corpus side, arrivals routed by the same codebook) equals the
    // declared query's rows
    val q = assigned.filter(col("vec_id") % 10 === 0)
      .selectExpr("vec_id AS arrival_id", "embedding AS qe",
        "n2 AS qn2", "cell")
    val c = corpus.selectExpr("vec_id AS neighbor_id", "embedding AS ce",
      "graft_vec_dot(embedding, embedding) AS cn2", "cell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("arrival_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val fromTable = q.join(c, Seq("cell"))
      .selectExpr("arrival_id", "neighbor_id", "cell",
        "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("arrival_id", "rn")
      .collect().toSeq
    val declared = SparkEntry.queries("q_ann_incremental_trained")(spark, sf)
      .collect().toSeq
    ScratchCache.release()
    assert(fromTable.size == declared.size,
      s"rowcount ${fromTable.size} vs ${declared.size}")
    fromTable.zip(declared).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }
}
