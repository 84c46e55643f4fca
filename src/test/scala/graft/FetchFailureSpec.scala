package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.{FetchFailed, TaskContext}
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle fetch-failure → PRODUCER-STAGE RESUBMIT — the recovery path
  * the reference drives through ShuffleScheduler's penalty/re-fetch and
  * `InputReadErrorEvent` (tez-runtime-library/src/main/java/org/apache/
  * tez/runtime/library/common/shuffle/orderedgrouped/
  * ShuffleScheduler.java:764,847,887): when a consumer cannot fetch a
  * producer's output, the system must regenerate the LOST PRODUCER
  * OUTPUT (not merely retry the consumer task against the same missing
  * bytes) and the final result must be indistinguishable from an
  * unfaulted run. FaultToleranceSpec covers plain task retry; this spec
  * covers the cross-stage half: a reduce task reports FetchFailed, the
  * DAGScheduler unregisters that map output, re-submits the producer
  * stage for the missing partition, then re-runs the consumer.
  *
  * Injection: the reduce task for partition 0 throws the real
  * FetchFailedException (via the package bridge) on the first stage
  * attempt only — the executor converts it to a FetchFailed task-end
  * reason, exactly what a genuine lost-shuffle-file fetch produces.
  * Proof of producer re-run: an accumulator counts executions of
  * map-side partition 0 (accumulator double-counting on re-execution is
  * the very signal) plus a listener counting stage re-submissions.
  */
class FetchFailureSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fetch failure regenerates the producer's output and the result is unchanged") {
    val sc = spark.sparkContext
    val resubmitted = new AtomicInteger(0)
    val fetchFailed = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (s.stageInfo.attemptNumber() > 0) resubmitted.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        te.reason match {
          case _: FetchFailed => fetchFailed.incrementAndGet()
          case _              => ()
        }
    }
    sc.addSparkListener(listener)
    try {
      val mapRuns = sc.longAccumulator("graft_map_p0_runs")
      val base = sc.parallelize(1 to 100000, 8)
        .mapPartitionsWithIndex { (i, it) =>
          if (i == 0) mapRuns.add(1L)
          it.map(x => ((x % 1000).toLong, 1L))
        }
      val shuffled = base.reduceByKey(_ + _)
      val shuffleId = shuffled.dependencies.head
        .asInstanceOf[org.apache.spark.ShuffleDependency[_, _, _]].shuffleId
      val result = shuffled.mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.partitionId() == 0 && tc.stageAttemptNumber() == 0)
          org.apache.spark.shuffle.GraftFetchInjector
            .injectFetchFailure(shuffleId, 0, tc.partitionId())
        it
      }.collect().toMap

      val expected = (1 to 100000).groupBy(x => (x % 1000).toLong)
        .map { case (k, v) => k -> v.size.toLong }
      assert(result == expected, "post-recovery result diverged from the clean run")
      assert(fetchFailed.get() >= 1, "no FetchFailed task-end reason observed")
      // the producer's partition 0 executed at least twice: the original
      // run plus the regeneration after its output was unregistered
      assert(mapRuns.value >= 2L,
        s"producer partition never re-ran (runs=${mapRuns.value})")
      assert(resubmitted.get() >= 1, "no stage was resubmitted")
    } finally sc.removeSparkListener(listener)
  }
}
