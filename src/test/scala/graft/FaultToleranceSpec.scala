package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Encoders, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Per-JVM failure-injection switchboard. In local mode executor threads
  * share the driver JVM, so these statics are visible to tasks without any
  * serialization — the same trick the reference's fault-tolerance harness
  * plays with per-vertex failure config
  * (tez-tests/src/test/java/org/apache/tez/test/TestProcessor.java:73-101).
  */
object FaultInjector {
  val failuresInjected = new AtomicInteger(0)
  val retriesObserved  = new AtomicInteger(0)
  def reset(): Unit = { failuresInjected.set(0); retriesObserved.set(0) }
}

/** Fault-tolerance parity with the reference's TestFaultTolerance
  * (tez-tests/src/test/java/org/apache/tez/test/TestFaultTolerance.java:67,233,507):
  * a task that throws on its first attempt must be transparently re-run by
  * the scheduler within `spark.task.maxFailures` attempts, and the query
  * result must be indistinguishable from an un-faulted run.
  *
  * The shared test master is `local[4,2]` — the second slot is
  * maxFailures, i.e. one free retry per task, the local-mode analogue of
  * the reference's `tez.am.task.max.failed.attempts`. At 100 TB task
  * failure is routine (preemption, bad disks, OOM-killed executors);
  * Spark's recovery unit is the task + its deterministic lineage, so a
  * query is fault-tolerant iff its operators are deterministic — which the
  * oracle gate already enforces for every declared query.
  */
class FaultToleranceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def injectOnce(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it: Iterator[Row] =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0) {
        if (tc.attemptNumber() == 0) {
          FaultInjector.failuresInjected.incrementAndGet()
          throw new RuntimeException("graft-injected failure on attempt 0")
        } else {
          FaultInjector.retriesObserved.incrementAndGet()
        }
      }
      it
    }(enc)
  }

  test("task failing on attempt 0 is retried and the aggregate still matches") {
    FaultInjector.reset()
    val base = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val expected = base.groupBy("l_orderkey").sum("l_quantity")
      .orderBy("l_orderkey").collect()

    val actual = injectOnce(base).groupBy("l_orderkey").sum("l_quantity")
      .orderBy("l_orderkey").collect()

    assert(FaultInjector.failuresInjected.get() >= 1, "the fault was never injected")
    assert(FaultInjector.retriesObserved.get() >= 1, "no retry attempt was observed")
    assert(actual.sameElements(expected), "post-retry result diverged from the clean run")
  }

  test("failure past maxFailures fails the job (no silent data loss)") {
    val base = Tables.region(spark, sf)
    val enc = Encoders.row(base.schema)
    val alwaysFails = base.mapPartitions { it: Iterator[Row] =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0)
        throw new RuntimeException("graft-injected permanent failure")
      it
    }(enc)
    val ex = intercept[Exception] { alwaysFails.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("graft-injected permanent failure")), ex.toString)
  }
}
