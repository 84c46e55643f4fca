package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the table-maintenance operator every
  * streaming-ingest pipeline needs: micro-batch sinks (foreachBatch
  * appends, per-trigger parquet commits) accumulate thousands of tiny
  * files, and at 100 TB the scan-planning cost (one footer read + task
  * per file) and the shuffle-fetch overhead come to dominate query time.
  * The reference meets the same problem from the other side with split
  * GROUPING — packing many small splits into one task at read time
  * (tez-mapreduce/.../grouper/TezSplitGrouper.java:72-85, mirrored by
  * Spark's FilePartition packing, SplitGrouperSpec); compaction fixes
  * the layout ONCE at write time instead of re-paying grouping on every
  * read.
  *
  * Mechanics: size the output file count from the actual on-disk bytes
  * (ceil(totalBytes / targetBytes)), round-robin repartition to that
  * count (even file sizes, no skew from any existing clustering), and
  * rewrite. The rewrite lands in a NEW directory: swapping it over the
  * old one atomically is a table-format/catalog concern (at production
  * scale a transactional table layer owns the swap; plain directories
  * get a rename dance), and keeping the mechanics separate from the
  * swap keeps this testable and engine-idiomatic.
  */
object Compaction {

  /** Total bytes of data files under `dir` (non-recursive parquet parts). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  /** Number of data files under `dir`. */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_"))
  }

  /** Rewrite the parquet directory `srcDir` into `dstDir` with
    * ~`targetBytes` per output file. Returns the chosen file count. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long): Int = {
    val total = dataBytes(spark, srcDir)
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcDir)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
    n
  }
}
