package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path evolution — the two table-lifecycle behaviors a
  * long-lived 100 TB corpus directory needs beyond a single job's
  * committer (reference MROutput writes a fixed schema to a fresh
  * path; a corpus that lives for years does not):
  *
  *  - SCHEMA DRIFT: a new ingest batch carries an added column; old
  *    files stay untouched, and a mergeSchema read serves the union
  *    schema with nulls for pre-drift rows (per-file pruning still
  *    applies — the old files simply lack the column chunk).
  *  - DYNAMIC PARTITION OVERWRITE: a daily re-run replaces ONLY the
  *    partitions it produced, never truncating sibling partitions —
  *    `partitionOverwriteMode=dynamic`, the idempotent-backfill write
  *    mode (static overwrite mode would wipe the whole table root).
  */
class WriteEvolutionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(): Unit
  }

  test("mergeSchema read serves old and new ingest batches under the union schema") {
    val dir = new java.io.File("/tmp/graft_evolve")
    rmrf(dir)
    val docs = Tables.documents(spark, sf)
    // epoch-1 ingest: original schema
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "lang", "text")
      .write.parquet(dir.getPath)
    // epoch-2 ingest: a quality score column was added upstream
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("text"),
        (length(col("text")) % 100).as("quality"))
      .write.mode(SaveMode.Append).parquet(dir.getPath)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir.getPath)
    assert(merged.columns.toSet == Set("doc_id", "lang", "text", "quality"))
    assert(merged.count() == docs.count())
    // pre-drift rows read as null, post-drift rows carry the value
    val nullsByEpoch = merged
      .groupBy((col("doc_id") % 2).as("epoch"))
      .agg(sum(when(col("quality").isNull, 1).otherwise(0)).as("n_null"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nullsByEpoch(0L)._1 == nullsByEpoch(0L)._2, "old rows must be null")
    assert(nullsByEpoch(1L)._1 == 0L, "new rows must carry the column")
  }

  test("dynamic partition overwrite replaces only the re-run partitions") {
    val dir = new java.io.File("/tmp/graft_dyn_overwrite")
    rmrf(dir)
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    docs.write.partitionBy("lang").parquet(dir.getPath)
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).sorted
    assert(langs.length >= 2, "fixture needs >=2 languages")
    val target = langs.head

    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // the daily re-run: same partition, halved content (simulating a
      // corrected backfill); sibling partitions must survive
      docs.filter(col("lang") === target && col("doc_id") % 2 === 0)
        .write.mode(SaveMode.Overwrite).partitionBy("lang")
        .parquet(dir.getPath)
    } finally prevMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    val back = spark.read.parquet(dir.getPath)
    val counts = back.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    langs.foreach { l =>
      if (l == target)
        assert(counts(l) < want(l), s"$l must hold only the re-run rows")
      else
        assert(counts(l) == want(l), s"sibling partition $l was clobbered")
    }
    // and the re-run partition holds exactly the corrected content
    val got = back.filter(col("lang") === target).count()
    val exp = docs.filter(col("lang") === target && col("doc_id") % 2 === 0).count()
    assert(got == exp, s"re-run partition rows $got vs $exp")
  }
}
