package org.apache.spark.shuffle

import org.apache.spark.SparkEnv

/** Test-only bridge: `FetchFailedException` is `private[spark]`, but
  * throwing it from task code is the ONE sanctioned way to signal a
  * shuffle-fetch failure to the scheduler (the executor's TaskRunner
  * converts it to a `FetchFailed` task-end reason, which is what makes
  * the DAGScheduler unregister the lost map output and resubmit the
  * producer stage — the behavior under test in graft.FetchFailureSpec).
  * This shim lives in the spark package purely to reach the
  * constructor; it contains no logic.
  */
object GraftFetchInjector {
  def injectFetchFailure(shuffleId: Int, mapIndex: Int, reduceId: Int): Nothing =
    throw new FetchFailedException(
      SparkEnv.get.blockManager.blockManagerId,
      shuffleId, 0L, mapIndex, reduceId,
      new RuntimeException("graft-injected fetch failure"))
}
