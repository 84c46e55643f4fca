package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout evidence for q_sorted_export: the written files
  * respect the record cap AND are each internally sorted on the
  * cluster key — the two properties that make parquet min/max stats
  * tight and merge-reads cheap downstream. Checked from the data
  * itself via input_file_name(), not from writer internals.
  */
class SortedExportSpec extends AnyFunSuite {
  import SparkTestSession._

  test("files respect the record cap and are internally key-sorted") {
    val out = "/tmp/graft_fmt/sorted_spec"
    val cap = 300L
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(col("o_custkey"))
      .sortWithinPartitions("o_custkey", "o_orderkey")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", cap.toString)
      .parquet(out)

    val back = spark.read.parquet(out)
      .withColumn("f", input_file_name())
    val counts = back.groupBy("f").count().collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getLong(1) <= cap),
      s"file over cap: ${counts.map(_.getLong(1)).max}")

    // per-file sortedness: within a file, parquet preserves write
    // order, so the sequence of (o_custkey, o_orderkey) must be
    // non-decreasing when read back per file.
    val violations = back
      .select("f", "o_custkey", "o_orderkey").rdd
      .mapPartitions { it =>
        var bad = 0L
        val last = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
        it.foreach { r =>
          val k = (r.getLong(1), r.getLong(2))
          last.get(r.getString(0)).foreach { p =>
            if (Ordering[(Long, Long)].lt(k, p)) bad += 1
          }
          last(r.getString(0)) = k
        }
        Iterator(bad)
      }.sum()
    assert(violations == 0, s"$violations out-of-order rows within files")

    // nothing lost in the layout rewrite
    assert(back.count() == Tables.orders(spark, sf).count())
  }
}
