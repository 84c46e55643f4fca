package graft.ops

import graft.oracle.{DuckSql, SparkSql}
import graft.{QueryDef, Tables}

/** Multimodal-column plumbing, declared-query slice.
  *
  * Real multimodal pipelines carry image/audio/video as opaque `binary`
  * columns with typed metadata and decode them in batched partition-local
  * UDFs — that full plumbing (schema, partitioning, batch shape, stubbed
  * decoder) lives in graft.multimodal.BinaryPipeline and its spec. This
  * declared query covers the oracle-checkable part: binary length
  * accounting and a deterministic fake feature over the bytes, computed
  * identically in DuckDB.
  */
object MultimodalQueries {

  /** Frames per media row — every fixture doc has ≥ NFrames bytes, so
    * the sampler's min(n, len) clamp never engages and the oracle can
    * fix the frame count. (Declared BEFORE `defs`: vals initialize in
    * declaration order and the oracle string captures it eagerly.) */
  private val NFrames = 4

  val defs: Map[String, QueryDef] = Map(
    "q_multimodal_meta" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .selectExpr(
            "doc_id",
            s"CAST(${SparkSql.octetLen("text")} AS BIGINT) AS n_bytes",
            s"CAST(${SparkSql.polyHash("text", 32)} AS BIGINT) AS content_hash",
            s"CAST(${SparkSql.octetLen("text")} % 640 AS INT) AS fake_width",
            s"CAST(${SparkSql.octetLen("text")} % 480 AS INT) AS fake_height")
          .orderBy("doc_id"),
      s"""SELECT doc_id,
         |  CAST(${DuckSql.octetLen("text")} AS BIGINT) AS n_bytes,
         |  CAST(${DuckSql.polyHash("text", 32)} AS BIGINT) AS content_hash,
         |  CAST(${DuckSql.octetLen("text")} % 640 AS INT) AS fake_width,
         |  CAST(${DuckSql.octetLen("text")} % 480 AS INT) AS fake_height
         |FROM documents ORDER BY doc_id""".stripMargin),

    // The frame-sampling pipeline itself (graft.multimodal.BinaryPipeline
    // .frameSample: Dataset.map over opaque binary payloads → posexplode)
    // under the DuckDB oracle: the stub "codec" is a polynomial hash over
    // evenly-split byte slices, which SQL reproduces exactly — fixture
    // text is pure ASCII, so byte i of the payload IS char i+1 of the
    // text (asserted across SFs; a real codec swaps in behind the same
    // plumbing and keeps everything around it). Partition-local per row;
    // the only shuffle is the output ORDER BY.
    "q_multimodal_frames" -> QueryDef(
      (s, d) => {
        val media = graft.multimodal.BinaryPipeline.mediaFromDocuments(s, d)
        graft.multimodal.BinaryPipeline.frameSample(media, NFrames)
          .orderBy("media_id", "frame_idx")
      },
      s"""SELECT media_id, frame_idx, frame_hash
         |FROM (${framesSql("documents")})
         |ORDER BY media_id, frame_idx""".stripMargin),

    // MEDIA DEDUP BY FRAME SIGNATURE — the video/image near-dup stage a
    // multimodal corpus build runs after frame sampling: two payloads
    // whose sampled frame hashes all agree are duplicates (with a real
    // codec these become perceptual frame hashes; the stub keeps the
    // arithmetic oracle-replicable). Composition: binary payload →
    // decode-stub frame sample (partition-local) → per-media signature
    // fold (one bounded-fan-in shuffle: NFrames rows per media) →
    // signature groupBy. At 100 TB the shuffle carries one BIGINT per
    // frame — never payload bytes; payloads die at the sampler.
    // Output follows the q_dedup_exact contract: every signature group
    // with its member count (dup clusters are the n_media > 1 rows —
    // at sf0.001 the fixture has none, so a HAVING would go empty).
    "q_multimodal_dup" -> QueryDef(
      (s, d) => {
        val media = graft.multimodal.BinaryPipeline.mediaFromDocuments(s, d)
        val frames = graft.multimodal.BinaryPipeline.frameSample(media, NFrames)
        frames.groupBy("media_id")
          .agg(org.apache.spark.sql.functions.expr(
            "aggregate(array_sort(collect_list(struct(frame_idx, frame_hash)))," +
              s" CAST(0 AS BIGINT), (a, x) -> (a * 31 + x.frame_hash) % ${graft.oracle.Dialect.M})")
            .as("sig"))
          .groupBy("sig")
          .agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n_media"),
            org.apache.spark.sql.functions.min("media_id").as("min_media_id"),
            org.apache.spark.sql.functions.max("media_id").as("max_media_id"))
          .orderBy("sig")
      }, {
        val dk = DuckSql
        val fold = dk.foldBig("list(frame_hash ORDER BY frame_idx)",
          "a", "x", s"((a * 31 + x) % ${graft.oracle.Dialect.M})")
        s"""WITH frames AS (${framesSql("documents")}),
           |med AS (
           |  SELECT media_id, $fold AS sig
           |  FROM frames GROUP BY media_id)
           |SELECT sig, count(*) AS n_media,
           |  min(media_id) AS min_media_id, max(media_id) AS max_media_id
           |FROM med GROUP BY sig
           |ORDER BY sig""".stripMargin
      }),

    "q_multimodal_ingest" -> ingestDef,

    // REAL CODEC ROUND TRIP (r11): deterministic PNGs are ENCODED with
    // JVM ImageIO (one payload per doc id, partition-local), carried as
    // an opaque binary column, and DECODED back partition-local to
    // dims + per-channel pixel sums. The oracle computes the EXPECTED
    // stats from the generator's integer formulas — never touching a
    // codec — so any encode/decode defect (channel order, row stride,
    // truncation) breaks the hash-exact compare. PNG is lossless, so
    // exact equality is the contract, not a tolerance. At 100 TB the
    // per-row cost is the decode itself; payloads never shuffle (stats
    // are computed where the bytes sit; only the fixed-width stats
    // rows move into the ORDER BY).
    "q_multimodal_decode" -> QueryDef(
      (s, d) => graft.multimodal.BinaryPipeline
        .imageStats(graft.multimodal.BinaryPipeline.mediaPng(s, d))
        .orderBy("media_id"),
      pngStatsSql),

    // The real-codec INGEST: PNG payloads framed with an 8-byte
    // big-endian id travel the splittable graft-binrec container
    // (write → byte-range split read), then decode to stats — the full
    // production media path (container → split → real decode) with
    // ARBITRARY payload bytes exercising the container's sync-marker
    // repair (the text-framed q_multimodal_ingest could not: '|'
    // separators need ASCII). Same oracle: the round trip must be
    // invisible.
    // REAL AUDIO ROUND TRIP (r12 — the repo's last stub replaced):
    // deterministic 16-bit PCM WAVs are ENCODED with the JDK's
    // javax.sound.sampled (one payload per doc id, partition-local),
    // carried as an opaque binary column, and DECODED back
    // partition-local to rate / channels / frame count / amplitude
    // sums. The oracle computes the EXPECTED stats from the
    // generator's integer formulas — never touching a codec — so any
    // header, endianness, interleave, or sign defect breaks the
    // hash-exact compare. PCM is lossless: exact equality, no
    // tolerance. Same scale shape as q_multimodal_decode: payloads
    // never shuffle; only fixed-width stats rows enter the ORDER BY.
    "q_multimodal_audio" -> QueryDef(
      (s, d) => graft.multimodal.BinaryPipeline
        .audioStats(graft.multimodal.BinaryPipeline.mediaWav(s, d))
        .orderBy("media_id"),
      wavStatsSql),

    "q_multimodal_ingest_png" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val out =
          s"${graft.ProcScratch.base}/mm/png_${new java.io.File(d).getName}"
        graft.multimodal.BinaryPipeline.mediaPng(s, d)
          .select("media_id", "payload").as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, p) =>
            Tuple1(graft.multimodal.BinaryPipeline.frameId(id, p))
          })
          .toDF("value")
          .write.mode("overwrite").option("syncIntervalBytes", "2048")
          .format("graft-binrec").save(out)
        val media = s.read.format("graft-binrec")
          .option("splitSize", graft.multimodal.BinaryPipeline
            .adaptiveSplitSize(s, out).toString)
          .load(out)
          .select("value").as[Array[Byte]]
          .mapPartitions(_.map(v =>
            (graft.multimodal.BinaryPipeline.unframeId(v),
              graft.multimodal.BinaryPipeline.unframePayload(v))))
          .toDF("media_id", "payload")
        graft.multimodal.BinaryPipeline.imageStats(media).orderBy("media_id")
      },
      pngStatsSql)
  )

  /** DuckDB oracle of the PNG stats queries: the synthPng generator's
    * integer formulas evaluated arithmetically — w = 8 + id%24,
    * h = 8 + id%16, channel(x, y) = affine(id, x, y) % 256 — summed
    * over the pixel grid with list folds. Shared by q_multimodal_decode
    * and q_multimodal_ingest_png (the container round trip must be
    * invisible). */
  private def pngStatsSql: String = {
    def chanSum(body: String): String =
      "CAST(list_sum(flatten(list_transform(range(0, 8 + doc_id % 24), " +
        s"x -> list_transform(range(0, 8 + doc_id % 16), y -> $body)))) " +
        "AS BIGINT)"
    s"""SELECT doc_id AS media_id,
       |  CAST(8 + doc_id % 24 AS INT) AS width,
       |  CAST(8 + doc_id % 16 AS INT) AS height,
       |  ${chanSum("(doc_id + x + y) % 256")} AS r_sum,
       |  ${chanSum("(doc_id + 2*x + 3*y + 7) % 256")} AS g_sum,
       |  ${chanSum("(3*doc_id + 5*x + 11*y + 13) % 256")} AS b_sum
       |FROM documents ORDER BY media_id""".stripMargin
  }

  /** DuckDB oracle of q_multimodal_audio: the synthWav generator's
    * integer formulas evaluated arithmetically — rate = 8000 +
    * (id%4)·4000, channels = 1 + id%2, frames = 64 + id%192,
    * sample(i, ch) = (7·id + 31·i + 101·ch + 13) % 65536 − 32768 —
    * summed over the (frame, channel) grid with list folds, mirroring
    * pngStatsSql's device for the pixel grid. */
  private def wavStatsSql: String = {
    def ampSum(body: String): String =
      "CAST(list_sum(flatten(list_transform(range(0, 64 + doc_id % 192), " +
        "i -> list_transform(range(0, 1 + doc_id % 2), " +
        s"ch -> $body)))) AS BIGINT)"
    val sample = "((doc_id * 7 + i * 31 + ch * 101 + 13) % 65536 - 32768)"
    s"""SELECT doc_id AS media_id,
       |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
       |  CAST(1 + doc_id % 2 AS INT) AS channels,
       |  CAST(64 + doc_id % 192 AS BIGINT) AS n_frames,
       |  ${ampSum(sample)} AS amp_sum,
       |  ${ampSum(s"abs($sample)")} AS amp_abs_sum
       |FROM documents ORDER BY media_id""".stripMargin
  }

  /** END-TO-END MULTIMODAL INGEST: media payloads travel through the
    * splittable binary container (graft-binrec write → byte-range
    * split read, ids framed in-band), then the decode-stub frame
    * sampler and signature dedup run over the RE-READ payloads — the
    * full path a real media corpus takes (container → split → decode →
    * dedup), composing both custom connectors' contracts with the
    * multimodal pipeline under one oracle. The oracle is identical to
    * q_multimodal_dup's: the container round trip must be invisible. */
  private def ingestDef: QueryDef = QueryDef(
    (s, d) => {
      val out = s"${graft.ProcScratch.base}/mm/ingest_${new java.io.File(d).getName}"
      Tables.documents(s, d)
        .selectExpr("CAST(concat(doc_id, '|', text) AS BINARY) AS value")
        .write.mode("overwrite").option("syncIntervalBytes", "2048")
        .format("graft-binrec").save(out)
      val media = s.read.format("graft-binrec")
        .option("splitSize", graft.multimodal.BinaryPipeline
          .adaptiveSplitSize(s, out).toString)
        .load(out)
        .selectExpr("CAST(value AS STRING) AS v")
        .selectExpr(
          "CAST(substring_index(v, '|', 1) AS BIGINT) AS media_id",
          "CAST(substring(v, instr(v, '|') + 1) AS BINARY) AS payload")
      val frames = graft.multimodal.BinaryPipeline.frameSample(media, NFrames)
      frames.groupBy("media_id")
        .agg(org.apache.spark.sql.functions.expr(
          "aggregate(array_sort(collect_list(struct(frame_idx, frame_hash)))," +
            s" CAST(0 AS BIGINT), (a, x) -> (a * 31 + x.frame_hash) % ${graft.oracle.Dialect.M})")
          .as("sig"))
        .groupBy("sig")
        .agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_media"),
          org.apache.spark.sql.functions.min("media_id").as("min_media_id"),
          org.apache.spark.sql.functions.max("media_id").as("max_media_id"))
        .orderBy("sig")
    }, {
      val dk = DuckSql
      val fold = dk.foldBig("list(frame_hash ORDER BY frame_idx)",
        "a", "x", s"((a * 31 + x) % ${graft.oracle.Dialect.M})")
      s"""WITH frames AS (${framesSql("documents")}),
         |med AS (
         |  SELECT media_id, $fold AS sig
         |  FROM frames GROUP BY media_id)
         |SELECT sig, count(*) AS n_media,
         |  min(media_id) AS min_media_id, max(media_id) AS max_media_id
         |FROM med GROUP BY sig
         |ORDER BY sig""".stripMargin
    })

  /** DuckDB frame-hash table (media_id, frame_idx, frame_hash) over a
    * documents-shaped table — per (doc, frame): h = fold of
    * (h*31 + byte) % M over the byte slice [start, end), seeded 17 (the
    * seed rides as a pseudo-element at i = start so the 0-seeded fold
    * reproduces it: 0*31 + 17 = 17). Mirrors
    * [[graft.multimodal.BinaryPipeline.sampleFrameHashes]] exactly. */
  private def framesSql(table: String): String = {
    val dk = DuckSql
    val hash = dk.foldBig(
      dk.transform(
        dk.seqIncl("start_i", "end_i"), "i",
        "CASE WHEN i = start_i THEN 17" +
          " ELSE CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) END"),
      "a", "x", s"((a * 31 + x) % ${graft.oracle.Dialect.M})")
    s"""SELECT media_id, frame_idx, CAST($hash AS BIGINT) AS frame_hash
       |FROM (
       |  SELECT media_id, text, frame_idx,
       |    ${dk.idiv(s"frame_idx * len", NFrames.toString)} AS start_i,
       |    ${dk.idiv(s"(frame_idx + 1) * len", NFrames.toString)} AS end_i
       |  FROM (
       |    SELECT doc_id AS media_id, text, length(text) AS len,
       |      CAST(unnest(generate_series(0, ${NFrames - 1})) AS INT)
       |        AS frame_idx
       |    FROM $table))""".stripMargin
  }
}
