package graft.ops

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-format sink/source round trips under the DuckDB oracle — the
  * §2a MROutput text-format surface (Tez's TextOutputFormat /
  * KeyValuesWriter path, e.g.
  * tez-mapreduce/src/main/java/org/apache/tez/mapreduce/output/MROutput.java:38)
  * exercised end-to-end: the declared query WRITES the table through the
  * format (parallel, one file per task — no coalesce; at 100 TB the
  * export is as wide as the cluster) and returns the RE-READ frame, so
  * the driver's bit-exact compare proves serialization round-trips:
  * Double.toString/Jackson shortest-repr parsing is value-exact for
  * doubles, and timestamps are exported as epoch seconds (the
  * format-portable convention every query in this repo uses).
  */
object FormatQueries {

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "odate_epoch")

  private def ordersProj(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).selectExpr("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice",
      "unix_timestamp(o_orderdate) AS odate_epoch")

  private val oracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS odate_epoch
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_csv_roundtrip" -> QueryDef(
      (s, d) => {
        val proj = ordersProj(s, d)
        val out = s"${graft.ProcScratch.base}/fmt/csv_${new java.io.File(d).getName}"
        proj.write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(proj.schema).option("header", "true").csv(out)
          .orderBy("o_orderkey")
      },
      oracle),

    // JSON additionally exercises a NESTED record: two columns travel
    // inside a struct and are re-flattened after the schema'd read.
    "q_json_roundtrip" -> QueryDef(
      (s, d) => {
        val nested = ordersProj(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          struct(col("o_orderstatus"), col("o_totalprice")).as("info"),
          col("odate_epoch"))
        val out = s"${graft.ProcScratch.base}/fmt/json_${new java.io.File(d).getName}"
        nested.write.mode("overwrite").json(out)
        s.read.schema(nested.schema).json(out)
          .select(col("o_orderkey"), col("o_custkey"),
            col("info.o_orderstatus"), col("info.o_totalprice"),
            col("odate_epoch"))
          .orderBy("o_orderkey")
      },
      oracle),

    // ORC completes the columnar-format matrix (csv/json/text/binrec
    // are row formats; parquet is the fixture's own format, exercised
    // by every scan): same projection through Spark's built-in ORC
    // source — dictionary/RLE encodings, stripe-level splits, and
    // predicate-pushdown-capable statistics all come with the format.
    // ORC stores doubles and longs losslessly, so the round trip is
    // bit-exact with no string-parsing caveats.
    "q_orc_roundtrip" -> QueryDef(
      (s, d) => {
        val proj = ordersProj(s, d)
        val out = s"${graft.ProcScratch.base}/fmt/orc_${new java.io.File(d).getName}"
        proj.write.mode("overwrite").orc(out)
        s.read.schema(proj.schema).orc(out)
          .orderBy("o_orderkey")
      },
      oracle),

    // Round trip through the CUSTOM DataSource V2 connector
    // (graft.sources.LineTextSource, format "graft-text") in BOTH
    // directions: documents are exported as delimited text through the
    // connector's write path (task attempt files + job-level commit —
    // the MROutputCommitter analog), re-read through its byte-range
    // splits (4 KB — dozens of mid-line boundaries), parsed, and
    // compared bit-exact against the original table. This puts the
    // connector's split AND commit contracts under the driver's oracle
    // gate, not just under its spec.
    "q_textfile_roundtrip" -> QueryDef(
      (s, d) => {
        val out = s"${graft.ProcScratch.base}/fmt/text_${new java.io.File(d).getName}"
        Tables.documents(s, d)
          .selectExpr("concat(doc_id, '|', lang, '|', n_chars) AS value")
          .write.mode("overwrite").format("graft-text").save(out)
        s.read.format("graft-text").option("splitSize", "4096").load(out)
          .selectExpr("split(value, '\\\\|') AS p")
          .selectExpr("CAST(p[0] AS BIGINT) AS doc_id", "p[1] AS lang",
            "CAST(p[2] AS BIGINT) AS n_chars")
          .orderBy("doc_id")
      },
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"),

    // Round trip through the SPLITTABLE BINARY container
    // (graft.sources.BinaryRecordSource, format "graft-binrec" — the
    // SequenceFile-style sync-marker format completing MRInput's "any
    // InputFormat" claim for delimiter-free data): documents travel as
    // opaque UTF-8 payloads, written with a small sync interval and
    // re-read through 4 KB byte-range splits so dozens of boundaries
    // land mid-record and the sync-scan repair does the work. Decode +
    // parse closes the loop under the driver's bit-exact oracle.
    "q_binrec_roundtrip" -> QueryDef(
      (s, d) => {
        val out = s"${graft.ProcScratch.base}/fmt/bin_${new java.io.File(d).getName}"
        Tables.documents(s, d)
          .selectExpr(
            "CAST(concat(doc_id, '|', lang, '|', n_chars) AS BINARY) AS value")
          .write.mode("overwrite").option("syncIntervalBytes", "1024")
          .format("graft-binrec").save(out)
        s.read.format("graft-binrec").option("splitSize", "4096").load(out)
          .selectExpr("split(CAST(value AS STRING), '\\\\|') AS p")
          .selectExpr("CAST(p[0] AS BIGINT) AS doc_id", "p[1] AS lang",
            "CAST(p[2] AS BIGINT) AS n_chars")
          .orderBy("doc_id")
      },
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"),

    // HADOOP-COMPAT round trip: documents travel as (LongWritable, Text)
    // records through an ACTUAL Hadoop SequenceFile — written via
    // saveAsSequenceFile (SequenceFileOutputFormat) and re-read via
    // sc.sequenceFile (SequenceFileInputFormat + WritableConverter) —
    // the literal "any Hadoop InputFormat" contract of the reference's
    // MRInput (tez-mapreduce/src/main/java/org/apache/tez/mapreduce/
    // input/MRInput.java:87): a user with existing SequenceFile/Writable
    // data reads it through the same InputFormat class they already
    // name, splits and all, with no conversion step. The Writable
    // shuttle objects never leak into the frame (the converter copies),
    // and the DataFrame boundary is one narrow map.
    "q_seqfile_roundtrip" -> QueryDef(
      (s, d) => {
        val out = s"${graft.ProcScratch.base}/fmt/seq_${new java.io.File(d).getName}"
        val hpath = new org.apache.hadoop.fs.Path(out)
        val fs = hpath.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(hpath)) fs.delete(hpath, true)
        Tables.documents(s, d)
          .selectExpr("doc_id", "concat(lang, '|', n_chars) AS v")
          .rdd.map(r => (r.getLong(0), r.getString(1)))
          .saveAsSequenceFile(out)
        val back = s.sparkContext.sequenceFile[Long, String](out)
        s.createDataFrame(back).toDF("doc_id", "v")
          .selectExpr("doc_id", "split(v, '\\\\|') AS p")
          .selectExpr("doc_id", "p[0] AS lang",
            "CAST(p[1] AS BIGINT) AS n_chars")
          .orderBy("doc_id")
      },
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"),

    // AVRO round trip through the ACTUAL Hadoop Avro container format
    // (AvroKeyOutputFormat → AvroKeyInputFormat over GenericRecord,
    // org.apache.avro.mapreduce — the other format a Hadoop/Tez shop
    // names by InputFormat class next to SequenceFile, same MRInput
    // "any InputFormat" contract, MRInput.java:87). Schema'd records
    // (long/string/long), block-compressible container with sync
    // markers → splittable on read exactly like the reference's splits.
    // The GenericRecord shuttle is copied to primitives inside the same
    // map (Avro readers REUSE the record object — the classic
    // Hadoop-format trap the Writable note above documents for
    // SequenceFile; `toString` + unboxing make the copy).
    "q_avro_roundtrip" -> QueryDef(
      (s, d) => {
        import org.apache.avro.Schema
        import org.apache.avro.generic.{GenericData, GenericRecord}
        import org.apache.avro.mapred.AvroKey
        import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
        import org.apache.hadoop.io.NullWritable
        import org.apache.hadoop.mapreduce.Job

        val schemaJson =
          """{"type":"record","name":"Doc","fields":[
            |{"name":"doc_id","type":"long"},
            |{"name":"lang","type":"string"},
            |{"name":"n_chars","type":"long"}]}""".stripMargin
        val out = s"${graft.ProcScratch.base}/fmt/avro_${new java.io.File(d).getName}"
        val hpath = new org.apache.hadoop.fs.Path(out)
        val fs = hpath.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(hpath)) fs.delete(hpath, true)
        val wJob = Job.getInstance(s.sparkContext.hadoopConfiguration)
        AvroJob.setOutputKeySchema(wJob, new Schema.Parser().parse(schemaJson))
        Tables.documents(s, d)
          .selectExpr("doc_id", "lang", "n_chars").rdd
          .mapPartitions { it =>
            val sch = new Schema.Parser().parse(schemaJson)
            it.map { r =>
              val rec = new GenericData.Record(sch)
              rec.put("doc_id", r.getLong(0))
              rec.put("lang", r.getString(1))
              rec.put("n_chars", r.getLong(2))
              (new AvroKey[GenericRecord](rec), NullWritable.get())
            }
          }
          .saveAsNewAPIHadoopFile(out,
            classOf[AvroKey[GenericRecord]], classOf[NullWritable],
            classOf[AvroKeyOutputFormat[GenericRecord]], wJob.getConfiguration)
        val rJob = Job.getInstance(s.sparkContext.hadoopConfiguration)
        AvroJob.setInputKeySchema(rJob, new Schema.Parser().parse(schemaJson))
        val back = s.sparkContext.newAPIHadoopFile(out,
          classOf[AvroKeyInputFormat[GenericRecord]],
          classOf[AvroKey[GenericRecord]], classOf[NullWritable],
          rJob.getConfiguration)
          .map { case (k, _) =>
            val rec = k.datum()
            (rec.get("doc_id").asInstanceOf[Long],
              rec.get("lang").toString,
              rec.get("n_chars").asInstanceOf[Long])
          }
        s.createDataFrame(back).toDF("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      },
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"),

    // SCHEMA EVOLUTION across file generations — the reality of reading
    // years of accumulated data at 100 TB: generation 1 files carry
    // (o_orderkey, o_custkey, cents); generation 2 adds o_orderstatus.
    // One mergeSchema read reconciles both (parquet footers union;
    // missing columns null-fill for old files — the reader adapts to
    // the data, the MRInput contract yet again), and the rollup treats
    // the null-filled legacy rows as their own 'legacy' bucket. The
    // oracle recomputes the same rollup from the SOURCE table, so the
    // gate checks the whole write→evolve→merge→read pipeline end to
    // end. Cents are exact BIGINTs; generation assignment is a
    // deterministic key parity.
    "q_schema_evolution" -> QueryDef(
      (s, d) => {
        val out = s"${graft.ProcScratch.base}/fmt/evo_${new java.io.File(d).getName}"
        val base = Tables.orders(s, d).selectExpr("o_orderkey", "o_custkey",
          "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents",
          "o_orderstatus")
        base.filter("o_orderkey % 2 = 0")
          .drop("o_orderstatus")
          .write.mode("overwrite").parquet(s"$out/gen=1")
        base.filter("o_orderkey % 2 = 1")
          .write.mode("overwrite").parquet(s"$out/gen=2")
        s.read.option("mergeSchema", "true").parquet(s"$out/gen=1", s"$out/gen=2")
          .selectExpr("coalesce(o_orderstatus, 'legacy') AS status_bucket",
            "cents")
          .groupBy("status_bucket")
          .agg(count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"))
          .orderBy("status_bucket")
      },
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
        |    ELSE 'legacy' END AS status_bucket,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders
        |GROUP BY status_bucket ORDER BY status_bucket""".stripMargin),

    // COMPRESSED-CONTAINER round trip — gzip'd CSV through the same
    // export projection (MRInput/TextInputFormat reads compressed text
    // transparently via the codec factory; Spark's text sources do the
    // same from the file extension). The 100 TB codec trade is encoded
    // here deliberately: gzip is NOT splittable, so each .csv.gz file
    // is one read task — the writer repartitions to many files to keep
    // read parallelism file-granular (the operational rule for
    // compressed text at scale: many medium files, or a splittable
    // container like parquet+zstd, never one giant .gz). The re-read
    // frame under the bit-exact oracle proves the codec path preserves
    // every value.
    // SORTED BOUNDED-FILE EXPORT — write-side layout control: rows
    // hash-route to their key's partition (repartition on o_custkey),
    // sort WITHIN each write task (sortWithinPartitions — a local
    // sort, never a global range shuffle), and cap file size via
    // maxRecordsPerFile (the writer rolls to a new file mid-task).
    // The result is the layout downstream range readers want at
    // 100 TB: every file internally key-sorted with bounded size, so
    // parquet row-group min/max stats are tight and merge-readers
    // stream without re-sorting. SortedExportSpec asserts the
    // physical layout (per-file row cap + per-file sortedness); the
    // oracle proves the roundtrip loses nothing.
    "q_sorted_export" -> QueryDef(
      (s, d) => {
        val proj = ordersProj(s, d)
        val out = s"${graft.ProcScratch.base}/fmt/sorted_${new java.io.File(d).getName}"
        proj.repartition(col("o_custkey"))
          .sortWithinPartitions("o_custkey", "o_orderkey")
          .write.mode("overwrite")
          .option("maxRecordsPerFile", "4096")
          .parquet(out)
        s.read.parquet(out).orderBy("o_orderkey")
      },
      oracle),

    // Parquet + zstd — the splittable-columnar-compressed combination a
    // 100 TB corpus actually stores (vs q_gzip_roundtrip's deliberately
    // non-splittable text path): zstd ~snappy decode speed at gzip-class
    // ratios, and row-group splitting is unaffected by the codec, so
    // read parallelism is row-group-granular regardless of file count.
    // The re-read frame under the bit-exact oracle proves codec + stats
    // round-trip (footer statistics are written for zstd pages too).
    "q_zstd_roundtrip" -> QueryDef(
      (s, d) => {
        val proj = ordersProj(s, d)
        val out = s"${graft.ProcScratch.base}/fmt/zstd_${new java.io.File(d).getName}"
        proj.write.mode("overwrite")
          .option("compression", "zstd").parquet(out)
        s.read.parquet(out).orderBy("o_orderkey")
      },
      oracle),

    "q_gzip_roundtrip" -> QueryDef(
      (s, d) => {
        val proj = ordersProj(s, d)
        val out = s"${graft.ProcScratch.base}/fmt/gz_${new java.io.File(d).getName}"
        proj.repartition(8)
          .write.mode("overwrite").option("header", "true")
          .option("compression", "gzip").csv(out)
        s.read.schema(proj.schema).option("header", "true").csv(out)
          .orderBy("o_orderkey")
      },
      oracle)
  )
}
