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
      }, {
        val dk = DuckSql
        // per (doc, frame): h = fold of (h*31 + byte) % M over the slice
        // [start, end), seeded 17 — the seed rides as a pseudo-element at
        // i = start so the 0-seeded fold reproduces it: 0*31 + 17 = 17.
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
           |    FROM documents))
           |ORDER BY media_id, frame_idx""".stripMargin
      })
  )

}
