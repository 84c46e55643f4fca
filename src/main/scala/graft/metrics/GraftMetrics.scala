package graft.metrics

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query execution counters — the Spark rendition of Tez's
  * `TaskCounter` surface (tez-api/.../common/counters/TaskCounter.java:
  * 26-140: INPUT_RECORDS_PROCESSED, OUTPUT_RECORDS, SHUFFLE_BYTES, spill
  * counts feeding VertexManager decisions and the tez-tools analyzers).
  *
  * Spark already meters every physical operator (SQLMetrics); this
  * listener snapshots them per query so a pipeline can assert row
  * counts / shuffle volumes the way Tez jobs read counters. AQE consumes
  * the same stats at runtime the way ShuffleVertexManager consumed
  * VertexManagerEvent payloads — this surface is for the user.
  */
object GraftMetrics
    extends org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  final case class QueryRecord(
      name: String,
      durationNs: Long,
      outputRows: Long,
      shuffleBytesWritten: Long,
      filesRead: Long)

  private val records = new ConcurrentLinkedQueue[QueryRecord]

  private def metricSum(qe: QueryExecution, metricNames: Set[String]): Long =
    // AdaptiveSparkPlanHelper.collect descends into finalized AQE stages,
    // which a plain TreeNode traversal does not see
    collect(qe.executedPlan) { node =>
      node.metrics.collect {
        case (key, m) if metricNames.contains(key) => math.max(m.value, 0L)
      }.sum
    }.sum

  private val listener: QueryExecutionListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      records.add(QueryRecord(
        funcName,
        durationNs,
        outputRows = metricSum(qe, Set("numOutputRows")),
        shuffleBytesWritten = metricSum(qe, Set("shuffleBytesWritten", "bytesWritten")),
        filesRead = metricSum(qe, Set("numFiles", "filesNum"))))
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  /** Idempotent-enough for tests: callers register once per session. */
  def register(spark: SparkSession): Unit =
    spark.listenerManager.register(listener)

  def snapshot(): Seq[QueryRecord] = records.asScala.toSeq
  def clear(): Unit = records.clear()
}

/** Full task-counter accumulation — the breadth of the reference's
  * `TaskCounter` enum (tez-api/src/main/java/org/apache/tez/common/
  * counters/TaskCounter.java:26-140) mapped onto Spark's TaskMetrics,
  * one listener for the whole session. Parity map (reference counter →
  * field here):
  *
  *  - INPUT_RECORDS_PROCESSED / INPUT_BYTES → inputRecords/inputBytes
  *  - OUTPUT_RECORDS / OUTPUT_BYTES_PHYSICAL → outputRecords/outputBytes
  *  - REDUCE_INPUT_RECORDS → shuffleRecordsRead
  *  - SHUFFLE_BYTES → shuffleRemoteBytes (fetched over the wire)
  *  - SHUFFLE_BYTES_DISK_DIRECT → shuffleLocalBytes (read straight from
  *    local disk, no fetch — Spark's local-block short circuit is the
  *    same optimization)
  *  - OUTPUT_RECORDS/OUTPUT_BYTES (map side) → shuffleRecordsWritten/
  *    shuffleBytesWritten
  *  - SHUFFLE_PHASE_TIME (fetch-wait component) → shuffleFetchWaitMs
  *  - ADDITIONAL_SPILLS_BYTES_WRITTEN / SPILLED_RECORDS →
  *    diskSpilledBytes/memorySpilledBytes (Spark meters spill in bytes
  *    at both tiers; SpillCounterClusterSpec proves they move under a
  *    forced spill)
  *  - GC_TIME_MILLIS → gcTimeMs; plus peakExecutionMemory, which the
  *    reference exposes via its memory-per-task accounting.
  *
  * Counters the reference keeps for its OWN sort/merge internals
  * (MERGE_PHASE_TIME, NUM_MEM_TO_DISK_MERGES, …) have no Spark
  * equivalent by design: Tungsten's UnsafeExternalSorter merges are
  * internal to the task and surface as the spill/time counters above —
  * the architectural absorption SURVEY §2d documents.
  */
object TaskCounters {
  final case class Snapshot(
      tasks: Long,
      inputRecords: Long, inputBytes: Long,
      outputRecords: Long, outputBytes: Long,
      shuffleRecordsRead: Long, shuffleLocalBytes: Long,
      shuffleRemoteBytes: Long, shuffleFetchWaitMs: Long,
      shuffleRecordsWritten: Long, shuffleBytesWritten: Long,
      shuffleWriteTimeNs: Long,
      memorySpilledBytes: Long, diskSpilledBytes: Long,
      peakExecutionMemory: Long, gcTimeMs: Long)

  private val zero = Snapshot(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acc = new java.util.concurrent.atomic.AtomicReference(zero)

  private val listener = new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) acc.updateAndGet { s =>
        Snapshot(
          s.tasks + 1,
          s.inputRecords + m.inputMetrics.recordsRead,
          s.inputBytes + m.inputMetrics.bytesRead,
          s.outputRecords + m.outputMetrics.recordsWritten,
          s.outputBytes + m.outputMetrics.bytesWritten,
          s.shuffleRecordsRead + m.shuffleReadMetrics.recordsRead,
          s.shuffleLocalBytes + m.shuffleReadMetrics.localBytesRead,
          s.shuffleRemoteBytes + m.shuffleReadMetrics.remoteBytesRead,
          s.shuffleFetchWaitMs + m.shuffleReadMetrics.fetchWaitTime,
          s.shuffleRecordsWritten + m.shuffleWriteMetrics.recordsWritten,
          s.shuffleBytesWritten + m.shuffleWriteMetrics.bytesWritten,
          s.shuffleWriteTimeNs + m.shuffleWriteMetrics.writeTime,
          s.memorySpilledBytes + m.memoryBytesSpilled,
          s.diskSpilledBytes + m.diskBytesSpilled,
          math.max(s.peakExecutionMemory, m.peakExecutionMemory),
          s.gcTimeMs + m.jvmGCTime)
      }
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sparkContext.addSparkListener(listener)
  def reset(): Unit = acc.set(zero)
  def snapshot(): Snapshot = acc.get()
}
