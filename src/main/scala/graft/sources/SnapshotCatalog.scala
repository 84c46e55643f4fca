package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.SparkException
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-snapshot catalog on top of [[GroupCommit]] — the
  * session-mode analog of the reference's long-lived AM reusing state
  * across DAG submissions (`tez-api/src/main/java/org/apache/tez/client/TezClient.java:384,613-650`):
  * successive pipeline runs against the same logical table land as
  * numbered, immutable, atomically-published VERSIONS that later
  * queries address by number (time travel) instead of by path.
  *
  * Layout under a catalog root:
  *
  * {{{
  *   <root>/<table>/v=<N>/<sink>/     parquet data, one dir per sink
  *   <root>/<table>/_snapshots/<N>    log entry: the version manifest
  *   <root>/_group_commits/<jobId>    GroupCommit's in-flight manifests
  * }}}
  *
  * A version is a GROUP of sinks (data plus derived tables — stats,
  * indexes — that must never be visible half-updated), written through
  * [[GroupCommit.commitGroup]] so all of the version's dirs publish
  * all-or-nothing. The version only becomes ADDRESSABLE when its log
  * entry lands in `_snapshots/` via create-temp + atomic rename — a
  * reader enumerating versions can never observe a half-published one:
  * either the log entry is absent (version invisible, staging dirs
  * carry `.__staging__` names no reader resolves) or present (every
  * sink dir already renamed into place, because the log write happens
  * strictly after commitGroup returns). A crash between group publish
  * and log write leaves orphan version dirs that the next [[commit]]
  * simply skips past (monotonic version numbering via max+1) —
  * re-running the pipeline reclaims the number sequence and
  * [[GroupCommit.vacuum]] handles pre-decision orphans.
  *
  * Concurrency: the log rename is the linearization point. If two
  * writers race to the same version number, exactly one rename wins
  * (rename-to-existing returns false); the loser's dirs become
  * unaddressed orphans and it throws rather than silently dropping a
  * version — the caller retries and gets the next number.
  *
  * At 100 TB: data writes are phase-1 GroupCommit (full cluster
  * parallelism); everything else is O(#sinks + #versions) driver-side
  * metadata. Version listing reads one small directory, not the data
  * tree.
  */
object SnapshotCatalog {

  private def tableDir(root: String, table: String) = new Path(root, table)
  private def logDir(root: String, table: String) =
    new Path(tableDir(root, table), "_snapshots")

  /** Commit `sinks` as the table's next version, all-or-nothing.
    * Returns the version number. */
  def commit(spark: SparkSession, root: String, table: String,
      sinks: Seq[(String, DataFrame)],
      injectFailure: Option[String] = None): Long = {
    require(sinks.nonEmpty, "a snapshot needs at least one sink")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val v = latestVersion(spark, root, table) + 1
    val vDir = new Path(tableDir(root, table), s"v=$v")
    val group = sinks.map { case (name, df) =>
      GroupCommit.Sink(df, new Path(vDir, name).toString)
    }
    GroupCommit.commitGroup(spark, root, group, injectFailure)
    // the version's sink dirs are all live; make the version addressable
    val ld = logDir(root, table)
    fs.mkdirs(ld)
    val tmp = new Path(ld, s"$v.tmp")
    val fin = new Path(ld, s"$v")
    val out = fs.create(tmp, true)
    out.write(sinks.map { case (name, _) =>
      new Path(vDir, name).toString
    }.mkString("\n").getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, fin)) {
      fs.delete(tmp, false)
      throw new SparkException(
        s"snapshot $table/v=$v: lost the version race, retry")
    }
    v
  }

  /** Highest registered version, 0 if the table has none. */
  def latestVersion(spark: SparkSession, root: String, table: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val ld = logDir(root, table)
    if (!fs.exists(ld)) 0L
    else fs.listStatus(ld).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.endsWith(".tmp"))
      .map(_.toLong).foldLeft(0L)(math.max)
  }

  /** Retention GC — drop every registered version except the newest
    * `keepLast`, returning the dropped numbers. Per version the LOG
    * ENTRY is removed first (one atomic delete — the version becomes
    * unaddressable before any data disappears, the mirror of commit's
    * publish-then-register order), then the version directory. A
    * reader that resolved a path before expiry ran can lose it
    * mid-scan — the standard time-travel GC caveat; retention windows
    * are sized to query length. Version numbers stay monotonic:
    * latestVersion keys off the surviving log entries, so expired
    * numbers are never reissued. */
  def expire(spark: SparkSession, root: String, table: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    val ld = logDir(root, table)
    if (!fs.exists(ld)) return Seq.empty
    val versions = fs.listStatus(ld).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.endsWith(".tmp"))
      .map(_.toLong).sorted
    val drop = versions.dropRight(keepLast)
    drop.foreach { v =>
      fs.delete(new Path(ld, s"$v"), false)
      fs.delete(new Path(tableDir(root, table), s"v=$v"), true)
    }
    drop.toSeq
  }

  /** Read one sink of a version; `version = 0` resolves to latest. */
  def read(spark: SparkSession, root: String, table: String,
      version: Long = 0L, sink: String = "data"): DataFrame = {
    val v = if (version > 0) version else latestVersion(spark, root, table)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    if (!fs.exists(new Path(logDir(root, table), s"$v")))
      throw new SparkException(s"snapshot $table/v=$v is not registered")
    spark.read.parquet(new Path(tableDir(root, table), s"v=$v/$sink").toString)
  }
}
