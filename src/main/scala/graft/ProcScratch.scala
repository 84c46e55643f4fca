package graft

/** Per-process /tmp scratch namespace for queries that WRITE as part of
  * their definition (format roundtrips, CDC/MV/partition-evolution
  * maintenance, group commit, multimodal ingest).
  *
  * Why: two harness JVMs can run against the same fixture concurrently
  * (bench and verify, or a plan render racing a measurement). With
  * scratch paths keyed only by the fixture directory name, one JVM's
  * overwrite can land mid-read of the other's scan. Keying every
  * scratch path by this JVM's PID makes the namespaces disjoint; a
  * shutdown hook reclaims the whole per-process tree so repeated runs
  * do not accumulate garbage.
  */
object ProcScratch {
  /** Root of this JVM's scratch tree, e.g. /tmp/graft_12345. */
  val base: String =
    s"/tmp/graft_${java.lang.ProcessHandle.current().pid()}"

  private val cleaner = new Thread(() => {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(base))
  }, "graft-scratch-cleaner")
  Runtime.getRuntime.addShutdownHook(cleaner)
}
