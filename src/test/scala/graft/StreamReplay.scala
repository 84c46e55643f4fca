package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared harness for the time-split replay specs: reads the events
  * fixture through the precision-adaptive decode (Tables.events), slices
  * it into files by event time or arbitrary predicates, and pins file
  * mtimes ascending so FileStreamSource replays them in the intended
  * order. All time math runs in µs via `unix_micros` on the DECODED
  * timestamp, so the specs are layout-independent — the round-4 lesson:
  * specs that hard-code the file layout go silently stale when the
  * fixture's physical type changes.
  */
object StreamReplay {

  /** (lo, hi) inclusive µs epoch range of the decoded events frame. */
  def microRange(events: DataFrame): (Long, Long) = {
    val mm = events
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect()(0)
    (mm.getLong(0), mm.getLong(1))
  }

  /** n equal event-time-width slice predicates over the decoded frame.
    * Equal-ts rows can never straddle a slice boundary — the contract
    * the cross-batch state-carry paths need. */
  def slicePredicates(events: DataFrame, n: Int): Seq[Column] = {
    val (lo, hi) = microRange(events)
    val span = hi - lo + 1
    // integer div (Column./ is floating-point division)
    (0 until n).map(i =>
      expr(s"((unix_micros(ts) - ${lo}L) * $n) div ${span}L") === i)
  }

  /** Write one parquet file per predicate into a fresh watch dir; the
    * file at position i in `preds` order gets the i-th ascending mtime
    * (FileStreamSource picks oldest-modified first, so replay order is
    * exactly `preds` order). Returns the watch dir. */
  def writeSlices(events: DataFrame, preds: Seq[Column], tag: String): java.io.File = {
    val watch = java.nio.file.Files.createTempDirectory(s"graft_${tag}_watch").toFile
    val scratch = java.nio.file.Files.createTempDirectory(s"graft_${tag}_scratch").toFile
    preds.zipWithIndex.foreach { case (p, i) =>
      val outDir = new java.io.File(scratch, s"b$i")
      events.filter(p).coalesce(1).write.mode("overwrite").parquet(outDir.getPath)
      val part = outDir.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(watch, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(1700000000000L + i * 60000L),
        s"could not pin mtime on $dst")
    }
    watch
  }

  /** Schema-adaptive streaming read of a watch dir written by
    * writeSlices — schema derived from a batch read of the same files,
    * ts decoded by the one shared layout contract. */
  def streamDir(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val fileSchema = spark.read.parquet(path).schema
    graft.streaming.EventStream.decodeTs(
      spark.readStream.schema(fileSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .parquet(path))
  }
}
