package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path layout for curated corpus output (SURVEY §8 round-4
  * item 5): the curated table is written PARTITIONED by the hash-split
  * column and BUCKETED by doc_id in one pass — so downstream training
  * jobs (a) read only their split's directories (partition pruning: a
  * train epoch over a 100 TB corpus never lists val/test files) and
  * (b) join per-doc annotations on doc_id with zero exchanges (bucket
  * co-location), converting the recurring join shuffle into a one-time
  * write-side cost.
  */
class CuratedWriteSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("curated write partitions by split, buckets by doc_id, and serves pruned shuffle-free reads") {
    Seq("docs_curated", "doc_scores_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "n_chars",
        s"${ops.CurationQueries.splitExpr} AS split")
    docs.write
      .partitionBy("split")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .format("parquet")
      .saveAsTable("docs_curated")

    // per-doc annotations bucketed on the same key/count
    Tables.documents(spark, sf)
      .selectExpr("doc_id", "length(text) AS text_len")
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable("doc_scores_b")

    // (a) split directories exist and a single-split read prunes
    val dirs = new java.io.File("/tmp/graft_warehouse/docs_curated")
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("split=test", "split=train", "split=val")), dirs.mkString(","))
    val train = spark.table("docs_curated").filter(col("split") === "train")
    train.collect()
    val scan = train.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(400))

    // (b) the annotation join on doc_id rides the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("docs_curated")
        .join(spark.table("doc_scores_b"), "doc_id")
      joined.collect()
      val nodes = collect(joined.queryExecution.executedPlan) { case p => p.nodeName }
      assert(!nodes.exists(_.contains("ShuffleExchange")),
        s"bucketed curated join must not shuffle: ${nodes.mkString(",")}")
      assert(joined.count() == Tables.documents(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // the split column in the curated table equals the declared query's
    // assignment (the write path and q_hash_split agree)
    val fromTable = spark.table("docs_curated")
      .groupBy("split").count().orderBy("split").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val fromQuery = SparkEntry.queries("q_hash_split")(spark, sf)
      .select("split", "n_docs").orderBy("split").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(fromTable.sameElements(fromQuery))
  }
}
