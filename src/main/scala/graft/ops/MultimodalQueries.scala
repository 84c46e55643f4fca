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
         |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
