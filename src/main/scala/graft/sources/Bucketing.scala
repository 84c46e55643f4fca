package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned, co-located) tables.
  *
  * Tez lets Hive wire CUSTOM edges that keep both join sides partitioned
  * identically so repeated joins skip re-shuffling (EdgeManagerPlugin,
  * SURVEY.md §2b/§2e). Spark's first-class form is bucketing: write both
  * fact tables bucketed+sorted by the join key once, and EVERY subsequent
  * join/aggregation on that key runs with zero exchanges — at 100 TB
  * this converts the recurring multi-TB shuffle of a daily
  * lineitem⋈orders pipeline into a one-time write-side cost.
  */
object Bucketing {

  /** One-time bucketed materialization (bucketBy requires saveAsTable).
    * Repartitioned BY THE BUCKET KEY first: Spark's v1 bucketed write
    * does not re-distribute input, so however the scan was split is the
    * write parallelism — the fixture's one-row-group tables serialize
    * the whole sort+write on one task (measured 1.5s of a 2.2s query),
    * and at 100 TB a skewed upstream layout would do the same. Hash
    * distribution by the key also lands each bucket's rows in one task,
    * keeping one file per bucket and the sorted-bucket property. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner sees both
    * sides pre-distributed and skips the exchange (asserted in
    * BucketingSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
