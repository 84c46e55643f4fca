package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r13): run one memory-sink stream query and print
  * the engine's per-batch durationMs breakdown from the progress log.
  * Not part of any contract — a profiling aid. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q_stream_tumbling")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { pass =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      finally ScratchCache.release()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name pass $pass: $sec%.2fs")
      spark.streams.listListeners()
      // progress of the most recently terminated query
      val qs = spark.streams.active
      println(s"[probe] active=${qs.length}")
    }
    // rerun once with a progress listener attached
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit =
          events.add(s"started ${e.timestamp}")
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit =
          events.add(s"batch ${e.progress.batchId}: " +
            s"durationMs=${e.progress.durationMs} " +
            s"rows=${e.progress.numInputRows} " +
            s"stateOps=${e.progress.stateOperators.length}")
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit =
          events.add("terminated")
      })
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    try SparkEntry.queries(name)(spark, sfDir).count()
    finally ScratchCache.release()
    println(f"[probe] $name listener pass: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    Thread.sleep(1000)
    events.forEach(e => println(s"[probe] $e"))
    spark.stop()
  }
}
