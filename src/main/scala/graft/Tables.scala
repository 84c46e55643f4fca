package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet fixtures.
  *
  * Mirrors the reference's root-input surface (`MRInput`,
  * tez-mapreduce/src/main/java/org/apache/tez/mapreduce/input/MRInput.java:87)
  * re-expressed as Spark file sources: split planning, locality and
  * grouping (TezSplitGrouper.java:72-85) are Spark's
  * `FileSourceScanExec` partition packing, governed by
  * `spark.sql.files.maxPartitionBytes`.
  *
  * Scale note (100 TB): these are plain `spark.read.parquet` scans so
  * Catalyst pushes filters + prunes columns into the parquet reader;
  * every query in `graft.ops` is written so its predicates and
  * projections reach the scan (verified in PlanSpec).
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")

  /** `events.ts` is NANOSECOND-precision parquet, which Spark's vectorized
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). Read the raw int64
    * nanos (`nanosAsLong`) and convert to a microsecond TimestampType —
    * Spark's native precision. Declared event queries additionally floor
    * to whole seconds for oracle parity (see graft.ops.EventQueries). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // SESSION CONTRACT: nanosAsLong cannot be scoped per-read — Spark's
    // ParquetFileFormat re-copies the session-conf value into every scan's
    // hadoopConf at execution, overriding a DataFrameReader option
    // (verified: the option passes driver-side schema inference but
    // executor-side ParquetToSparkSchemaConverter still throws
    // PARQUET_TYPE_ILLEGAL). The blast radius is narrow and one-directional:
    // the flag only affects TIMESTAMP(NANOS) parquet columns, which Spark
    // otherwise rejects outright — so the only behavior change for other
    // reads in the session is "ns-precision files stop erroring".
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** The fixture doc/embedding tables are single parquet files → one scan
    * partition, which serializes the expensive per-row map work (hashing,
    * signatures, dot products) on one core. Heavy operators read through
    * these: an explicit round-robin repartition buys full parallelism for
    * one cheap narrow-input shuffle. On a real many-file 100 TB corpus the
    * scan already yields thousands of partitions and this is a no-op cost. */
  def documentsParallel(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)
  def embeddingsParallel(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir).repartition(spark.sparkContext.defaultParallelism)
}
