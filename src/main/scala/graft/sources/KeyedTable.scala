package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.SparkException
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Key-range-manifested versioned table with FILE-PRUNED copy-on-write
  * merge — the storage layout that makes a continuous change feed
  * O(delta · fanout) per merge instead of O(table).
  *
  * Layout under a root:
  *
  * {{{
  *   <root>/<table>/files/<name>.parquet    immutable, key-sorted data files
  *   <root>/<table>/_manifests/<N>          version N: "relpath\tmin\tmax\trows" lines
  *   <root>/<table>/_stage/...              in-flight writes (never read)
  * }}}
  *
  * A version is a LIST OF FILES with their key ranges (read from the
  * parquet footer statistics the key-sorted write produces — the
  * `q_sorted_export` layout discipline made load-bearing). Files are
  * immutable and SHARED across versions: a merge writes only
  * replacement files for the ranges a change batch actually touches and
  * re-references every other file from the previous manifest, so the
  * bytes rewritten per merge track the delta, not the table. The
  * manifest registers via create-temp + atomic rename (the
  * [[SnapshotCatalog]] linearization point; the reference analog is the
  * output-commit decision in
  * `tez-mapreduce/src/main/java/org/apache/tez/mapreduce/committer/MROutputCommitter.java`
  * and the DAG-success commit in
  * `tez-dag/src/main/java/org/apache/tez/dag/app/dag/impl/DAGImpl.java`).
  *
  * Pruning invariant: file key ranges are kept NON-OVERLAPPING, so a
  * key maps to at most one file ([[graft.functions.IntervalSlotBroadcast]]).
  * The initial write range-partitions on the key; every merge
  * re-partitions its output BY SLOT (original file index, or gap index
  * for keys no file holds), so each replacement file's span stays
  * inside its predecessor's span and each appended file's span stays
  * inside one inter-file gap.
  *
  * At 100 TB: the manifest is O(#files) driver metadata; the slot probe
  * is a broadcast binary search per change key (never a row × file
  * join); the rewrite reads and writes only the touched files at full
  * cluster parallelism. Accumulated small append files are coalesced by
  * the MANIFEST-AWARE [[KeyedTable.compact]] (the generic [[Compaction]]
  * pass must never touch a keyed table — it would rewrite files behind
  * the manifests and orphan every version).
  */
object KeyedTable {

  final case class FileEntry(relPath: String, minKey: Long, maxKey: Long,
      rows: Long)

  /** What one merge touched — the evidence `files_rewritten ≪
    * files_total` on a sparse batch (DeltaMergeSpec asserts it). */
  final case class MergeStats(version: Long, filesTotal: Int,
      filesCarried: Int, filesRewritten: Int, filesAppended: Int)

  private def tableDir(root: String, table: String) = new Path(root, table)
  private def filesDir(root: String, table: String) =
    new Path(tableDir(root, table), "files")
  private def manifestDir(root: String, table: String) =
    new Path(tableDir(root, table), "_manifests")

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Highest registered version, 0 if none. */
  def latestVersion(spark: SparkSession, root: String, table: String): Long = {
    val fs = fsOf(spark, root)
    val md = manifestDir(root, table)
    if (!fs.exists(md)) 0L
    else fs.listStatus(md).filter(_.isFile)
      .map(_.getPath.getName)
      .filterNot(n => n.endsWith(".tmp") || n.endsWith(".claim"))
      .map(_.toLong).foldLeft(0L)(math.max)
  }

  /** Read a version's manifest, sorted by minKey. */
  def manifest(spark: SparkSession, root: String, table: String,
      version: Long = 0L): Seq[FileEntry] = {
    val fs = fsOf(spark, root)
    val v = if (version > 0) version else latestVersion(spark, root, table)
    val p = new Path(manifestDir(root, table), s"$v")
    if (!fs.exists(p))
      throw new SparkException(s"keyed table $table/v=$v is not registered")
    val in = fs.open(p)
    val body = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    body.split("\n").filter(_.nonEmpty).map { line =>
      val Array(rp, mn, mx, n) = line.split("\t")
      FileEntry(rp, mn.toLong, mx.toLong, n.toLong)
    }.toSeq.sortBy(_.minKey)
  }

  /** Read one version (latest when 0) as a DataFrame. */
  def read(spark: SparkSession, root: String, table: String,
      version: Long = 0L): DataFrame = {
    val td = tableDir(root, table).toString
    val paths = manifest(spark, root, table, version)
      .map(e => s"$td/${e.relPath}")
    spark.read.parquet(paths: _*)
  }

  /** Key min/max/rowcount from the parquet FOOTER — a metadata read,
    * no data pages touched. None when the file holds zero rows. */
  private def footerRange(conf: org.apache.hadoop.conf.Configuration,
      path: Path, keyCol: String): Option[(Long, Long, Long)] = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = rd.getFooter.getBlocks.asScala
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var rows = 0L
      blocks.foreach { b =>
        rows += b.getRowCount
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == keyCol)
          .getOrElse(throw new SparkException(
            s"$path: no column chunk for key '$keyCol'"))
        val st = c.getStatistics
        if ((st == null || st.isEmpty) && b.getRowCount > 0)
          throw new SparkException(s"$path: key '$keyCol' has no footer stats")
        if (b.getRowCount > 0) {
          mn = math.min(mn, st.genericGetMin.asInstanceOf[java.lang.Long])
          mx = math.max(mx, st.genericGetMax.asInstanceOf[java.lang.Long])
        }
      }
      if (rows == 0) None else Some((mn, mx, rows))
    } finally rd.close()
  }

  /** Stage-write `df`, then move its part files into `files/` under
    * fresh names and return their footer-derived entries. */
  private def stageIn(spark: SparkSession, root: String, table: String,
      keyCol: String, tag: String)(write: String => Unit): Seq[FileEntry] = {
    val fs = fsOf(spark, root)
    val conf = spark.sessionState.newHadoopConf()
    // uid rides into the destination file names: data files from
    // different merges can never collide (a name collision would rename
    // over a live file still referenced by older manifests)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(tableDir(root, table), s"_stage/${tag}_$uid")
    write(stage.toString)
    val fd = filesDir(root, table)
    fs.mkdirs(fd)
    // partitionBy writes land under <stage>/__slot=<s>/part-*.parquet;
    // plain writes under <stage>/part-*.parquet — collect both shapes
    def parts(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) parts(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val entries = parts(stage).zipWithIndex.flatMap { case (p, i) =>
      footerRange(conf, p, keyCol).map { case (mn, mx, rows) =>
        val name = s"${tag}_${uid}_$i.parquet"
        val dest = new Path(fd, name)
        if (!fs.rename(p, dest))
          throw new SparkException(s"keyed table: rename $p -> $dest failed")
        FileEntry(s"files/$name", mn, mx, rows)
      }
    }
    fs.delete(stage, true)
    entries
  }

  /** Register `entries` as version `v` — which must be EXACTLY the
    * writer's snapshot version + 1, never recomputed at commit time: a
    * writer that re-read `latestVersion` here would happily commit on
    * top of a version it never saw and silently drop that version's
    * changes (the lost-update hole the claim alone does not close).
    * The slot is CLAIMED by an atomic exclusive create of `<v>.claim`
    * (create with overwrite=false is atomic on local FS and HDFS alike —
    * unlike rename-to-existing, whose failure semantics differ per FS),
    * then the manifest body lands by tmp-write + rename. Of N writers
    * sharing a snapshot, exactly one wins the claim; every loser throws
    * CLEANLY after staging (its orphaned data files are unreferenced and
    * [[expire]] GCs them — ConcurrentMergeSpec proves both halves).
    * Claim files persist beside their manifests and are GC'd together. */
  private def commitManifest(spark: SparkSession, root: String, table: String,
      entries: Seq[FileEntry], v: Long): Long = {
    val fs = fsOf(spark, root)
    val md = manifestDir(root, table)
    fs.mkdirs(md)
    // the claim primitive must be ATOMIC exclusive-create. On HDFS,
    // create(overwrite=false) is (one namenode op); on the local FS it
    // is CHECK-THEN-CREATE (RawLocalFileSystem), so two racers can both
    // pass it and then both write the same <v>.tmp — use the kernel's
    // O_CREAT|O_EXCL via File.createNewFile there instead
    val claim = new Path(md, s"$v.claim")
    val claimed =
      if ("file".equalsIgnoreCase(fs.getUri.getScheme))
        new java.io.File(claim.toUri.getPath match {
          case null => claim.toString.stripPrefix("file:")
          case p => p
        }).createNewFile()
      else
        try { fs.create(claim, false).close(); true }
        catch { case _: java.io.IOException => false }
    if (!claimed)
      throw new SparkException(s"keyed table $table/v=$v: lost the version race")
    val tmp = new Path(md, s"$v.tmp")
    val fin = new Path(md, s"$v")
    val out = fs.create(tmp, true)
    out.write(entries.map(e =>
      s"${e.relPath}\t${e.minKey}\t${e.maxKey}\t${e.rows}")
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, fin)) {
      fs.delete(tmp, false)
      throw new SparkException(s"keyed table $table/v=$v: manifest rename failed")
    }
    v
  }

  /** Full build: range-partition on the key into ~`nFiles` key-sorted
    * files (tight, non-overlapping footer ranges) and register v1 (or
    * the next version). The write is one range shuffle — the same
    * total-order layout `q_sorted_export` proves, made addressable. */
  def write(spark: SparkSession, root: String, table: String, df: DataFrame,
      keyCol: String, nFiles: Int): Long = {
    require(df.schema(keyCol).dataType == LongType,
      s"keyed table key '$keyCol' must be BIGINT")
    val baseV = latestVersion(spark, root, table)
    val entries = stageIn(spark, root, table, keyCol, "base") { dir =>
      df.repartitionByRange(nFiles, col(keyCol))
        .sortWithinPartitions(keyCol)
        .write.mode("overwrite").parquet(dir)
    }
    commitManifest(spark, root, table, entries, baseV + 1)
  }

  /** FILE-PRUNED MERGE: apply a key-local change batch, rewriting only
    * the files whose key range the batch intersects.
    *
    * `mergeFn(cur, changes)` must be KEY-LOCAL: its output keys are a
    * subset of `keys(cur) ∪ keys(changes)`, each output row depends
    * only on its key's rows from both sides, and
    * `mergeFn(cur, ∅) ≡ cur` (untouched files are carried by
    * reference, which asserts exactly that identity). The CDC
    * upsert/delete/insert join is the canonical instance.
    *
    * Plan shape: one broadcast binary-search probe tags every change
    * key with its slot (file index or gap index); the touched-file set
    * collects bounded by #files; ONE job rewrites the touched files
    * (scan of touched files only — the change batch joins inside
    * `mergeFn`, AQE broadcasts the small side); ONE job appends
    * gap-keyed inserts. Output partitions BY SLOT so every replacement
    * span nests inside its predecessor and every append span nests
    * inside one gap — ranges stay non-overlapping for the next probe.
    *
    * Concurrency: OPTIMISTIC. Each call reads the latest manifest, does
    * its work against that snapshot, and commits the next version via an
    * atomic exclusive claim — of two racing merges on one table, exactly
    * one commits; the loser throws (`lost the version race`) AFTER
    * staging, leaving orphaned unreferenced data files that [[expire]]
    * GCs (ConcurrentMergeSpec proves both halves). The probe function
    * name and broadcast are unique per call, so concurrent merges on the
    * SAME session cannot corrupt each other's plans either.
    *
    * Empty table: a table registered from a zero-row frame has an empty
    * manifest; an insert-only merge then passes `mergeFn` a zero-row
    * `cur` whose schema is the CHANGE frame's schema (there is no table
    * schema yet to read), and the merge output defines the table schema.
    */
  def mergeDelta(outerSpark: SparkSession, root: String, table: String,
      changes: DataFrame, keyCol: String)(
      mergeFn: (DataFrame, DataFrame) => DataFrame): MergeStats = {
    // analyze/read through the CHANGES' session: under foreachBatch the
    // micro-batch frame is bound to a session CLONE whose function
    // registry snapshot predates this call — registering on the outer
    // session would leave the probe unresolvable here
    val spark = changes.sparkSession
    val baseV = latestVersion(spark, root, table)
    val entries = manifest(spark, root, table, baseV)
    val td = tableDir(root, table).toString
    val ranges = spark.sparkContext.broadcast(
      (entries.map(_.minKey).toArray, entries.map(_.maxKey).toArray))
    // unique per call: two merges sharing a session must not rebind each
    // other's probe to the wrong broadcast mid-plan
    val slotFn =
      s"graft_file_slot_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      slotFn,
      exprs => graft.functions.IntervalSlotBroadcast(ranges, exprs(0)),
      "scala_udf")
    val slotted = changes
      .withColumn("__slot",
        org.apache.spark.sql.functions.expr(s"$slotFn($keyCol)"))
      .persist()
    try {
      // ONE bounded pass over the batch decides both work items: the
      // distinct slot set is ≤ touched-files + touched-gaps, and a
      // trigger whose batch hits no gap (or no file) skips that whole
      // job — a steady change feed rarely pays both per trigger
      val slots = slotted.select("__slot").distinct()
        .collect().map(_.getInt(0)).sorted
      val touched = slots.filter(_ >= 0)
      val hasGaps = slots.exists(_ < 0)
      val touchedSet = touched.toSet

      // ONE WRITE JOB for both work items (r13, the r12 verdict's
      // item 3 — a merge used to submit separate rewrite and append
      // write jobs; at steady-feed batch sizes each extra job is pure
      // driver/scheduler overhead): the rewrite frame (touched files
      // merged with their slice of the batch) and the append frame
      // (gap-keyed inserts merged into an empty current) are UNIONED
      // and staged in a single partitionBy("__slot") write. Slots are
      // disjoint (file index ≥ 0, gap index < 0), so each staged file
      // still holds exactly one slot's rows and every span-nesting
      // guarantee is unchanged.
      val rewriteFrame: Option[DataFrame] =
        if (touched.isEmpty) None
        else {
          val curTouched = spark.read.parquet(
            touched.map(i => s"$td/${entries(i).relPath}").toIndexedSeq: _*)
          val chTouched = slotted.filter(col("__slot") >= 0).drop("__slot")
          Some(mergeFn(curTouched, chTouched)
            .withColumn("__slot", org.apache.spark.sql.functions
              .expr(s"$slotFn($keyCol)")))
        }
      val appendFrame: Option[DataFrame] =
        if (!hasGaps) None
        else {
          // no data files yet → the change frame's schema stands in for
          // the table schema (insert-only merge into an empty table)
          val curSchema =
            if (entries.isEmpty) changes.schema
            else spark.read.parquet(s"$td/${entries.head.relPath}").schema
          val emptyCur = spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], curSchema)
          val chGap = slotted.filter(col("__slot") < 0)
          Some(mergeFn(emptyCur, chGap.drop("__slot"))
            .withColumn("__slot", org.apache.spark.sql.functions
              .expr(s"$slotFn($keyCol)")))
        }
      val staged: Seq[FileEntry] = (rewriteFrame, appendFrame) match {
        case (None, None) => Seq.empty
        case (a, b) =>
          val all = (a.toSeq ++ b.toSeq).reduce(_ unionByName _)
          stageIn(spark, root, table, keyCol, "mrg") { dir =>
            all.repartition(math.max(1, slots.length), col("__slot"))
              .sortWithinPartitions("__slot", keyCol)
              .write.mode("overwrite").partitionBy("__slot").parquet(dir)
          }
      }
      // classify staged files for the stats contract: a rewrite file's
      // span nests inside its predecessor's span (slot ≥ 0), an append
      // file's inside a gap — so minKey-inside-an-old-range IS the
      // rewrite test (ranges are non-overlapping; DeltaMergeSpec pins
      // the exact counts)
      def isRewrite(e: FileEntry): Boolean =
        entries.exists(en => e.minKey >= en.minKey && e.minKey <= en.maxKey)
      val (rewritten, appended) = staged.partition(isRewrite)

      val carried = entries.zipWithIndex
        .filterNot { case (_, i) => touchedSet(i) }.map(_._1)
      val v = commitManifest(spark, root, table,
        carried ++ rewritten ++ appended, baseV + 1)
      MergeStats(v, entries.size, carried.size, rewritten.size, appended.size)
    } finally {
      slotted.unpersist()
      spark.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(slotFn))
      ranges.destroy()
    }
  }

  /** What one compaction touched. */
  final case class CompactStats(version: Long, filesBefore: Int,
      filesAfter: Int, filesCompacted: Int)

  /** MANIFEST-AWARE COMPACTION: coalesce runs of adjacent small files —
    * the per-gap append debris a sustained change feed accumulates
    * ([[mergeDelta]] writes one file per touched gap per trigger) — into
    * range-partitioned files of ~`targetRows`, registered as a new
    * version. This is the versioned replacement for pointing the generic
    * [[Compaction]] pass at the table, which would rewrite files behind
    * the manifest's back and orphan every version.
    *
    * Files stay immutable and shared: old versions still resolve
    * byte-identically, and the replaced small files become unreferenced
    * in the new version only — [[expire]] GCs them once no surviving
    * manifest lists them. Non-overlap is preserved: entries are sorted
    * and pairwise disjoint, a run is a consecutive slice of them, its
    * rewrite range-partitions inside the run's own key span, and
    * separate runs never merge — so every output file's span is disjoint
    * from every carried file's and from every other run's.
    *
    * A run must have ≥ 2 files, each under `targetRows`; a table with no
    * such run commits NOTHING (no empty version churn) and reports the
    * current version. At 100 TB this is the same O(debris) job shape as
    * the merge itself: only the small files are read or written, at full
    * cluster parallelism, one job per run of the handful the feed built.
    */
  def compact(spark: SparkSession, root: String, table: String,
      keyCol: String, targetRows: Long): CompactStats = {
    require(targetRows > 0, "targetRows must be positive")
    val baseV = latestVersion(spark, root, table)
    val entries = manifest(spark, root, table, baseV) // sorted by minKey
    val runs = scala.collection.mutable.ListBuffer.empty[Seq[FileEntry]]
    val cur = scala.collection.mutable.ListBuffer.empty[FileEntry]
    entries.foreach { e =>
      if (e.rows < targetRows) cur += e
      else { if (cur.size >= 2) runs += cur.toSeq; cur.clear() }
    }
    if (cur.size >= 2) runs += cur.toSeq
    if (runs.isEmpty)
      return CompactStats(baseV, entries.size, entries.size, 0)
    val td = tableDir(root, table).toString
    val rewritten = runs.toSeq.flatMap { run =>
      val nOut = math.max(1,
        ((run.map(_.rows).sum + targetRows - 1) / targetRows).toInt)
      val df = spark.read.parquet(
        run.map(e => s"$td/${e.relPath}").toIndexedSeq: _*)
      stageIn(spark, root, table, keyCol, "cmp") { dir =>
        df.repartitionByRange(nOut, col(keyCol))
          .sortWithinPartitions(keyCol)
          .write.mode("overwrite").parquet(dir)
      }
    }
    val replaced = runs.flatten.map(_.relPath).toSet
    val carried = entries.filterNot(e => replaced(e.relPath))
    val v = commitManifest(spark, root, table,
      carried ++ rewritten, baseV + 1)
    CompactStats(v, entries.size, carried.size + rewritten.size,
      replaced.size)
  }

  /** Retention GC: drop all but the newest `keepLast` manifests, then
    * delete every data file no SURVIVING manifest references — the
    * shared-file analog of [[SnapshotCatalog.expire]] (unregister
    * first, delete second, so readers never resolve a path that is
    * about to vanish... beyond the standard time-travel GC caveat). */
  def expire(spark: SparkSession, root: String, table: String,
      keepLast: Int): (Seq[Long], Int) = {
    require(keepLast >= 1, "must keep at least the latest version")
    val fs = fsOf(spark, root)
    val md = manifestDir(root, table)
    if (!fs.exists(md)) return (Seq.empty, 0)
    val versions = fs.listStatus(md).filter(_.isFile)
      .map(_.getPath.getName)
      .filterNot(n => n.endsWith(".tmp") || n.endsWith(".claim"))
      .map(_.toLong).sorted.toSeq
    val drop = versions.dropRight(keepLast)
    drop.foreach { v =>
      fs.delete(new Path(md, s"$v"), false)
      fs.delete(new Path(md, s"$v.claim"), false)
    }
    val live = versions.drop(drop.size)
      .flatMap(v => manifest(spark, root, table, v)).map(_.relPath).toSet
    val fd = filesDir(root, table)
    var removed = 0
    if (fs.exists(fd)) fs.listStatus(fd).filter(_.isFile).foreach { st =>
      if (!live(s"files/${st.getPath.getName}")) {
        fs.delete(st.getPath, false)
        removed += 1
      }
    }
    (drop, removed)
  }
}
