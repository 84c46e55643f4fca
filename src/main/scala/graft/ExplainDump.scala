package graft

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for the optimization rounds: writes each named
  * query's `.explain("formatted")` text to `<outDir>/<name>_<tag>.txt`.
  * Run: `sbt "runMain graft.ExplainDump q_a,q_b <tag> <outDir> [sfDir]"`.
  * Uses the Bench session shape (local[cpus], shuffle.partitions=cpus)
  * so the initial plans match what the bench executes at sf0.1.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val tag = args(1)
    val outDir = new java.io.File(args(2))
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    outDir.mkdirs()
    // the SHARED session contract (GraftSession, r13) — same defaults
    // as the bench, so plan evidence is captured under the benchmarked
    // configuration (the r12 advisor's ExplainDump-drift item)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        new java.io.File(outDir, s"${n}_$tag.txt").toPath, txt)
      ScratchCache.release()
      println(s"[explain] wrote ${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
