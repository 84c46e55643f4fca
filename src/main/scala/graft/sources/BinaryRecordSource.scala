package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Splittable BINARY-record container on the same connector skeleton as
  * `LineTextSource` — completing MRInput's "any InputFormat" claim
  * (`tez-mapreduce/src/main/java/org/apache/tez/mapreduce/input/MRInput.java:87`)
  * for data with NO in-band record delimiter, the way Hadoop's
  * SequenceFile does it (`SYNC_ESCAPE` + per-file random sync marker):
  *
  * File layout (one container per write task):
  *   header:  magic "GBIN1" + 16 random SYNC bytes (unique per file)
  *   record:  int32 big-endian length, then payload
  *   sync:    int32 sentinel -1, then the 16 SYNC bytes — inserted by
  *            the writer every `syncIntervalBytes` of payload
  *
  * Split contract (byte ranges planned with no record knowledge, reader
  * repairs — the binary rendition of the text connector's rule):
  *   ranges partition the file as [0,e1),[e1,e2),…; the SYNC whose
  *   sentinel starts at byte p is owned by the range with
  *   start < p ≤ end; the header block (no preceding sync) belongs to
  *   the range that starts at byte 0. A reader seeks to its start,
  *   scans forward for the first sync marker whose sentinel lies
  *   STRICTLY after its start, and then consumes sync blocks while the
  *   next sentinel position is ≤ its end — reading past its range end
  *   to finish the last owned block, exactly like the text reader
  *   finishing its last line. Every record is read exactly once no
  *   matter where boundaries fall (BinaryRecordSourceSpec sweeps split
  *   sizes, including payloads that embed fake sentinel bytes).
  *
  * Multimodal relevance: this is the shape a 100 TB image/audio corpus
  * ships in — opaque byte payloads in splittable containers, each task
  * decoding its own byte range with no central index.
  */
class BinaryRecordSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-binrec"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BinaryRecordSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new BinaryRecordTable(properties.get("path"),
      Option(properties.get("splitSize")).map(_.toLong)
        .getOrElse(BinaryRecordSource.DefaultSplitSize),
      Option(properties.get("syncIntervalBytes")).map(_.toInt)
        .getOrElse(BinaryRecordSource.DefaultSyncInterval))
}

object BinaryRecordSource {
  val Schema: StructType = StructType(Seq(StructField("value", BinaryType)))
  val Magic: Array[Byte] = "GBIN1".getBytes("UTF-8")
  val SyncLen = 16
  val HeaderLen: Int = Magic.length + SyncLen
  val DefaultSplitSize: Long = 128L * 1024 * 1024
  val DefaultSyncInterval: Int = 1 << 20
}

class BinaryRecordTable(path: String, splitSize: Long, syncInterval: Int)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-binrec requires a path")
  private def sessionConf =
    new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
  override def name(): String = s"graft-binrec:$path"
  override def schema(): StructType = BinaryRecordSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new BinaryRecordScan(path, splitSize, sessionConf)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      require(info.schema().length == 1 &&
        info.schema().head.dataType == BinaryType,
        s"graft-binrec writes a single binary column, got ${info.schema()}")
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BinaryRecordBatchWrite(
          path, doTruncate, info.queryId(), syncInterval, sessionConf)
      }
    }
}

final case class BinRange(file: String, start: Long, end: Long)
    extends InputPartition

class BinaryRecordScan(path: String, splitSize: Long,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends Scan with Batch {
  override def readSchema(): StructType = BinaryRecordSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-binrec $path splitSize=$splitSize"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
      else Array(fs.getFileStatus(p))
    val parts = ArrayBuffer.empty[InputPartition]
    files.foreach { st =>
      var off = 0L
      while (off < st.getLen) {
        val end = math.min(off + splitSize, st.getLen)
        parts += BinRange(st.getPath.toString, off, end)
        off = end
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cc = conf
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new BinaryRecordReader(partition.asInstanceOf[BinRange], cc)
    }
  }
}

final case class BinFileCommit(tempFile: String, finalName: String)
    extends WriterCommitMessage

class BinaryRecordBatchWrite(path: String, truncate: Boolean, queryId: String,
    syncInterval: Int, conf: org.apache.spark.util.SerializableConfiguration)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BinaryRecordWriterFactory(path, queryId, syncInterval, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .foreach(s => fs.delete(s.getPath, false))
    fs.mkdirs(dir)
    messages.foreach { case BinFileCommit(temp, fin) =>
      if (!fs.rename(new Path(temp), new Path(dir, fin)))
        throw new SparkException(
          s"graft-binrec commit failed: rename $temp -> $dir/$fin")
    }
    fs.delete(new Path(dir, "_temporary"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.filter(_ != null).foreach {
      case BinFileCommit(temp, _) => fs.delete(new Path(temp), false)
    }
    fs.delete(new Path(path, "_temporary"), true)
  }
}

class BinaryRecordWriterFactory(path: String, queryId: String,
    syncInterval: Int, conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BinaryRecordDataWriter(path, partitionId, taskId, queryId,
      syncInterval, conf)
}

/** One container file per task attempt: header, then records with a
  * sync inserted whenever `syncInterval` payload bytes have passed
  * since the last one. The sync marker derives deterministically from
  * (queryId, partitionId, taskId) — unique per file, reproducible. */
class BinaryRecordDataWriter(path: String, partitionId: Int, taskId: Long,
    queryId: String, syncInterval: Int,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriter[InternalRow] {
  import BinaryRecordSource._
  private val fs = new Path(path).getFileSystem(conf.value)
  private val tempFile =
    new Path(path, f"_temporary/attempt-$partitionId%05d-$taskId")
  private val out = new java.io.DataOutputStream(
    new java.io.BufferedOutputStream(fs.create(tempFile, true), 64 * 1024))
  private val sync: Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$queryId/$partitionId/$taskId".getBytes("UTF-8"))
  }
  private var sinceSync = 0

  out.write(Magic)
  out.write(sync)

  override def write(row: InternalRow): Unit = {
    if (sinceSync >= syncInterval) {
      out.writeInt(-1)
      out.write(sync)
      sinceSync = 0
    }
    val bytes = row.getBinary(0)
    out.writeInt(bytes.length)
    out.write(bytes)
    sinceSync += 4 + bytes.length
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    BinFileCommit(tempFile.toString, f"part-$partitionId%05d-$queryId.bin")
  }
  override def abort(): Unit = {
    out.close()
    fs.delete(tempFile, false)
  }
  override def close(): Unit = ()
}

/** Byte-range reader with sync-marker repair (the split contract in the
  * class doc of [[BinaryRecordSource]]). */
class BinaryRecordReader(range: BinRange,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  import BinaryRecordSource._
  private val fs = new Path(range.file).getFileSystem(conf.value)
  private val fileLen = fs.getFileStatus(new Path(range.file)).getLen
  private val raw = fs.open(new Path(range.file))
  private var current: Array[Byte] = _
  private var pos: Long = 0L        // bytes consumed from `in`'s origin
  private var in: java.io.DataInputStream = _
  private var sync: Array[Byte] = _
  private var done = false
  private val skipScratch = new Array[Byte](SyncLen)

  // the header always comes off the file head: it carries this file's
  // sync marker, which every reader needs for the scan
  {
    raw.seek(0)
    val head = new java.io.DataInputStream(
      new java.io.BufferedInputStream(raw, 64 * 1024))
    val magic = new Array[Byte](Magic.length)
    head.readFully(magic)
    if (!java.util.Arrays.equals(magic, Magic))
      throw new SparkException(s"${range.file}: not a graft-binrec file")
    sync = new Array[Byte](SyncLen)
    head.readFully(sync)
    if (range.start == 0) {
      in = head
      pos = HeaderLen
    } else {
      // rewind is unnecessary: re-open at the range start and scan for
      // the first sync whose SENTINEL begins strictly after range.start
      raw.seek(range.start)
      in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(raw, 64 * 1024))
      pos = range.start
      if (!scanToOwnedSync()) done = true
    }
  }

  /** Scan forward for the 16-byte sync sequence (sliding-window
    * compare — a partial-match reset would miss self-overlapping
    * patterns); position the stream just after a sync whose sentinel
    * (4 bytes before the marker) starts strictly after range.start and
    * at or before range.end. Returns false if no owned sync exists in
    * this range. Payload bytes equal to the marker would false-match —
    * the same probabilistic assumption SequenceFile makes (16-byte
    * marker, the writer controls it per file). */
  private def scanToOwnedSync(): Boolean = {
    val win = new Array[Int](SyncLen)
    var filled = 0
    while (true) {
      val b = in.read()
      if (b == -1) return false
      pos += 1
      System.arraycopy(win, 1, win, 0, SyncLen - 1)
      win(SyncLen - 1) = b
      if (filled < SyncLen) filled += 1
      if (filled == SyncLen &&
          (0 until SyncLen).forall(i => win(i) == (sync(i) & 0xff))) {
        val sentinelPos = pos - SyncLen - 4
        if (sentinelPos > range.start && sentinelPos <= range.end &&
            sentinelPos >= HeaderLen) return true
        if (sentinelPos > range.end) return false
        // sync owned by the previous range — keep looking
      }
    }
    false
  }

  override def next(): Boolean = {
    if (done) { current = null; return false }
    while (true) {
      if (pos >= fileLen) { current = null; done = true; return false }
      val len =
        try in.readInt()
        catch { case _: java.io.EOFException =>
          current = null; done = true; return false }
      pos += 4
      if (len == -1) {
        // sync sentinel: continue into the next block only if we own it
        val sentinelPos = pos - 4
        if (sentinelPos > range.end) { current = null; done = true; return false }
        // readFully, not skipBytes: skipBytes may skip FEWER bytes when
        // the marker straddles the read buffer's boundary
        in.readFully(skipScratch)
        pos += SyncLen
      } else {
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        pos += len
        current = bytes
        return true
      }
    }
    false
  }

  override def get(): InternalRow = InternalRow(current)
  override def close(): Unit = in.close()
}
