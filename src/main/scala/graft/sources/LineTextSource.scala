package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, StringContains, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** A complete DataSource V2 connector — the extensibility half of the
  * §2a source story. The reference's `MRInput` accepts ANY Hadoop
  * `InputFormat` (tez-mapreduce/src/main/java/org/apache/tez/mapreduce/
  * input/MRInput.java:87 — the runtime is format-agnostic; the split
  * contract does the work). Spark's analog is the connector API: this
  * source re-expresses `TextInputFormat`'s exact semantics —
  * fixed-size BYTE-RANGE splits planned independently of line
  * boundaries, with the reader contract that makes that correct:
  *
  *  - a reader whose range starts at byte 0 owns the file's first line;
  *  - any other reader DISCARDS the (partial) line its range opens in —
  *    the previous reader owns it and reads PAST its own range end to
  *    finish it;
  *  - a new line is started only while the read position is at or
  *    before the range end.
  *
  * Every byte belongs to exactly one split, so no line is lost or
  * duplicated regardless of where split boundaries fall
  * (LineTextSourceSpec sweeps split sizes to prove it). Split size is
  * the `splitSize` option — the same knob TezSplitGrouper/
  * maxPartitionBytes turn, here at the connector layer; at 100 TB the
  * planner produces one task per range with no coordination.
  *
  * Registered as `graft-text` (META-INF/services) — usable as
  * `spark.read.format("graft-text").load(dir)`.
  */
class LineTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-text"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineTextSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new LineTextTable(properties.get("path"),
      Option(properties.get("splitSize")).map(_.toLong)
        .getOrElse(LineTextSource.DefaultSplitSize))
}

object LineTextSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
  val DefaultSplitSize: Long = 128L * 1024 * 1024
}

class LineTextTable(path: String, splitSize: Long)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-text requires a path")
  /** The SESSION's Hadoop configuration (fs.defaultFS, s3a credentials,
    * any spark.hadoop.* overrides), captured driver-side when the scan/
    * write is built and shipped to tasks serialized — a bare
    * `new Configuration()` would silently ignore all of it. */
  private def sessionConf: SerializableConfiguration =
    new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
  override def name(): String = s"graft-text:$path"
  override def schema(): StructType = LineTextSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  /** Write side — the MROutput/OutputCommitter analog (§2a: task-side
    * attempt files + job-side commit,
    * tez-mapreduce/.../committer/MROutputCommitter.java): each task
    * writes a temp attempt file; speculative/retried attempts abort and
    * delete theirs; the driver's job-level commit renames the winning
    * attempts into place (and under TRUNCATE first clears old data
    * files) — so readers never observe a half-written table. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      require(info.schema().length == 1 &&
        info.schema().head.dataType == StringType,
        s"graft-text writes a single string column, got ${info.schema()}")
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new LineTextBatchWrite(path, doTruncate, info.queryId(), sessionConf)
      }
    }
  /** Filter pushdown (the connector half of §4 predicate pushdown):
    * contains/startsWith predicates on `value` are accepted and
    * evaluated INSIDE the reader, so rejected lines die at the scan —
    * at 100 TB a selective prefix filter turns a full-corpus read into
    * a stream that never materializes non-matching rows. Accepted
    * filters are applied exactly, so no residual re-evaluation is
    * needed (pushFilters returns only the unsupported remainder). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private var pushed: Array[Filter] = Array.empty
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (sup, rest) = filters.partition {
          case StringContains("value", _)   => true
          case StringStartsWith("value", _) => true
          // lines are never null by construction, so the implicit
          // isnotnull guard is vacuously satisfied scan-side
          case org.apache.spark.sql.sources.IsNotNull("value") => true
          case _                            => false
        }
        pushed = sup
        rest
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def build(): Scan =
        new LineTextScan(path, splitSize, pushed, sessionConf)
    }
}

final case class LineRange(file: String, start: Long, end: Long)
    extends InputPartition

class LineTextScan(path: String, splitSize: Long,
    filters: Array[Filter] = Array.empty,
    conf: SerializableConfiguration =
      new SerializableConfiguration(new org.apache.hadoop.conf.Configuration()))
    extends Scan with Batch {
  override def readSchema(): StructType = LineTextSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-text $path splitSize=$splitSize " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  /** Fixed-size byte ranges per data file — planned with no knowledge
    * of line boundaries (the reader contract repairs them). */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
      else Array(fs.getFileStatus(p))
    val parts = ArrayBuffer.empty[InputPartition]
    files.foreach { st =>
      var off = 0L
      while (off < st.getLen) {
        val end = math.min(off + splitSize, st.getLen)
        parts += LineRange(st.getPath.toString, off, end)
        off = end
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fs = filters
    val cc = conf
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new LineTextReader(partition.asInstanceOf[LineRange], fs, cc)
    }
  }
}

final case class LineFileCommit(tempFile: String, finalName: String)
    extends WriterCommitMessage

class LineTextBatchWrite(path: String, truncate: Boolean, queryId: String,
    conf: SerializableConfiguration) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LineTextWriterFactory(path, queryId, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .foreach(s => fs.delete(s.getPath, false))
    fs.mkdirs(dir)
    messages.foreach { case LineFileCommit(temp, fin) =>
      // HDFS-style rename returns FALSE (no exception) when the target
      // exists — swallowing it would silently drop a task's whole
      // output while the job reports success. Final names carry the
      // write's queryId (the FileCommitProtocol jobId pattern), so
      // append-mode jobs into a non-empty dir can never collide; any
      // false here is a real fault and must fail the job.
      if (!fs.rename(new Path(temp), new Path(dir, fin)))
        throw new SparkException(
          s"graft-text commit failed: rename $temp -> $dir/$fin " +
            "returned false (target exists or source missing)")
    }
    fs.delete(new Path(dir, "_temporary"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.filter(_ != null).foreach {
      case LineFileCommit(temp, _) => fs.delete(new Path(temp), false)
    }
    fs.delete(new Path(path, "_temporary"), true)
  }
}

class LineTextWriterFactory(path: String, queryId: String,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LineTextDataWriter(path, partitionId, taskId, queryId, conf)
}

/** One task attempt's writer: lines stream to a per-attempt temp file
  * (partition AND task id in the name, so a retried/speculative attempt
  * never collides with the original); commit hands the file to the
  * driver, abort deletes it. */
class LineTextDataWriter(path: String, partitionId: Int, taskId: Long,
    queryId: String, conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val fs = new Path(path).getFileSystem(conf.value)
  private val tempFile =
    new Path(path, f"_temporary/attempt-$partitionId%05d-$taskId")
  private val out = new java.io.BufferedOutputStream(
    fs.create(tempFile, true), 64 * 1024)

  override def write(row: InternalRow): Unit = {
    out.write(row.getUTF8String(0).getBytes)
    out.write('\n')
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    LineFileCommit(tempFile.toString, f"part-$partitionId%05d-$queryId.txt")
  }
  override def abort(): Unit = {
    out.close()
    fs.delete(tempFile, false)
  }
  override def close(): Unit = ()
}

/** TextInputFormat-contract reader over one byte range; pushed
  * contains/startsWith filters are applied per line inside the scan.
  * Reads go through a buffer (single-byte reads against a raw
  * FSDataInputStream would pay a filesystem call per byte); `pos`
  * tracks bytes CONSUMED, so the split-ownership arithmetic is
  * unchanged. Trailing '\r' is stripped, matching Hadoop's
  * LineRecordReader on CRLF input. */
class LineTextReader(range: LineRange,
    filters: Array[Filter] = Array.empty,
    conf: SerializableConfiguration =
      new SerializableConfiguration(new org.apache.hadoop.conf.Configuration()))
    extends PartitionReader[InternalRow] {
  private val fs = new Path(range.file).getFileSystem(conf.value)
  private val raw = fs.open(new Path(range.file))
  private val fileLen = fs.getFileStatus(new Path(range.file)).getLen
  private var pos: Long = range.start
  private var current: UTF8String = _

  // a range that does not start the file discards the line it opens in:
  // the previous range's reader finishes that line past its own end
  raw.seek(range.start)
  private val in = new java.io.BufferedInputStream(raw, 64 * 1024)
  if (range.start != 0) skipLine()

  /** consume bytes up to and including the next '\n' (or EOF). */
  private def skipLine(): Unit = {
    var b = in.read()
    while (b != -1 && b != '\n') { pos += 1; b = in.read() }
    if (b != -1) pos += 1
  }

  private def accepts(v: String): Boolean = filters.forall {
    case StringContains(_, sub)   => v.contains(sub)
    case StringStartsWith(_, pre) => v.startsWith(pre)
    case _                        => true
  }

  override def next(): Boolean = {
    // start a new line while positioned at or before the range end —
    // INCLUSIVE: a line that begins exactly at `end` is owned by THIS
    // split (the next split unconditionally discards the line its start
    // opens in, so exclusive-end here would drop that line from both)
    while (pos <= range.end && pos < fileLen) {
      val buf = new java.io.ByteArrayOutputStream(256)
      var b = in.read()
      while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
      if (b != -1) pos += 1
      val bytes = buf.toByteArray
      val n = // strip a trailing '\r' (CRLF input), like LineRecordReader
        if (bytes.length > 0 && bytes(bytes.length - 1) == '\r')
          bytes.length - 1
        else bytes.length
      val s = UTF8String.fromBytes(bytes, 0, n)
      if (accepts(s.toString)) { current = s; return true }
    }
    current = null
    false
  }

  override def get(): InternalRow = InternalRow(current)
  override def close(): Unit = in.close()
}
