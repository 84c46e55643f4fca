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
