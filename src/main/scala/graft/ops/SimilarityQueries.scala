package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions
import graft.oracle.{Dialect, DuckSql, SparkSql}
import graft.{QueryDef, ScratchCache, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Three tiers:
  *  - q_dedup_embedding: cosine near-duplicate pairs, brute-force within
  *    the full (small) table — correctness baseline.
  *  - q_ann_cosine: exact brute-force top-k neighbors for a query subset;
  *    the query side is broadcast, the corpus never shuffles, and the
  *    per-query top-k runs through a rank window (at 100 TB: per-partition
  *    top-k then k·P merge).
  *  - q_ann_lsh: random-hyperplane LSH bucketing (6 planes → 64 buckets),
  *    neighbors searched only within a bucket: the linear-scale path.
  *    Hyperplane coefficients come from a deterministic LCG evaluated
  *    identically in both engines.
  *
  * Performance: dot products run through the custom codegen'd
  * `graft_vec_dot` expression (graft.functions.VecDot) and each vector's
  * squared norm is computed ONCE per row, not per pair — cosine =
  * dot / sqrt(n2_a * n2_b). Summation order matches the DuckDB oracle's
  * list_reduce exactly, so values stay bit-identical.
  */
object SimilarityQueries {

  private val NearDupThreshold = 0.4
  private val TopK = 5
  private val NPlanes = 6
  // Salted variant: split any LSH bucket larger than this many rows into
  // ceil(n/cap) salt shards. The cap is deliberately tiny so the fixture
  // actually exercises multi-shard buckets; a production corpus sets it to
  // whatever pair count one reducer can chew (e.g. 10k rows → 1e8 pairs).
  private val SaltBucketRows = 8

  /** Deterministic pseudo-random hyperplane coefficient r_{p,d} in
    * [-0.5, 0.5): LCG over the flattened (plane, dim) index. Exact
    * integer arithmetic + one exact division in both engines. */
  private def planeCoef(d: Dialect, p: String, dim: String): String = {
    val idx = s"(($p) * 64 + ($dim))"
    s"(CAST(((CAST(1103515245 AS BIGINT) * $idx + 12345) % 2147483648) AS DOUBLE) / 2147483648.0 - 0.5)"
  }

  /** LSH bucket id of an embedding column: bit p set iff the projection
    * onto hyperplane p is positive. `nPlanes` is the scale knob — buckets
    * = 2^nPlanes, chosen so per-bucket pair counts stay tractable as the
    * corpus grows (more planes → smaller buckets → fewer pairs/bucket). */
  private def lshBucket(d: Dialect, emb: String, nPlanes: Int = NPlanes): String = {
    val proj = d.foldDbl(
      d.transform(d.seqIncl("1", "64"), "dd",
        s"${planeCoef(d, "p", "dd - 1")} * ${d.elemAtDbl(emb, "dd")}"),
      "acc", "v", "acc + v")
    d.foldBig(
      d.transform(d.seqIncl("0", (nPlanes - 1).toString), "p",
        s"CASE WHEN $proj > 0 THEN ${d.shiftL("CAST(1 AS BIGINT)", "p")} ELSE 0 END"),
      "a", "x", "a + x")
  }

  /** Embeddings with squared norm + LSH bucket for a caller-chosen plane
    * count — the parameterized entry point the AnnLshSpec scale test and
    * the LSH queries build on. Bucketing runs through the native
    * codegen'd `graft_lsh_bucket` (bit-identical to the SQL fold form the
    * DuckDB oracle evaluates — see graft.functions.LshBucketExpr). */
  def lshBucketed(s: SparkSession, d: String, nPlanes: Int): DataFrame = {
    GraftFunctions.register(s)
    graft.functions.TextHashFunctions.register(s)
    Tables.embeddings(s, d)
      .selectExpr("vec_id", "embedding",
        "graft_vec_dot(embedding, embedding) AS n2",
        s"graft_lsh_bucket(embedding, $nPlanes) AS bucket")
  }

  private val NCells = 16

  /** IVF coarse-quantizer cell: argmin over NCells deterministic
    * pseudo-random centroids of squared L2 distance. Centroid coords use
    * the same LCG as the LSH planes with a decorrelating index offset;
    * `list_position(dists, min)` gives a deterministic first-min
    * tie-break in both engines. */
  /** Per-row list of squared L2 distances to the NCells centroids. */
  private def ivfDists(d: Dialect, emb: String): String = {
    val dist = d.foldDbl(
      d.transform(d.seqIncl("1", "64"), "dd",
        s"(${d.elemAtDbl(emb, "dd")} - ${planeCoef(d, "(7000 + jj)", "dd - 1")}) * " +
          s"(${d.elemAtDbl(emb, "dd")} - ${planeCoef(d, "(7000 + jj)", "dd - 1")})"),
      "acc", "v", "acc + v")
    d.transform(d.seqIncl("0", (NCells - 1).toString), "jj", dist)
  }

  /** 1-based first-position argmin of a distance-list expression. */
  private def argminPos(d: Dialect, dists: String): String = d match {
    case graft.oracle.SparkSql =>
      s"array_position($dists, array_min($dists))"
    case _ =>
      s"list_position($dists, list_min($dists))"
  }

  private def ivfCell(d: Dialect, emb: String): String =
    argminPos(d, ivfDists(d, emb))

  /** DuckDB norm-augmented embeddings CTE (squared norm once per row). */
  private def duckNormCte: String =
    s"""e AS (SELECT vec_id, embedding,
       |  ${DuckSql.dotDbl("embedding", "embedding")} AS n2 FROM embeddings)""".stripMargin

  private def duckCos(a: String, b: String): String =
    s"(${DuckSql.dotDbl(s"$a.embedding", s"$b.embedding")} / sqrt($a.n2 * $b.n2))"

  /** Shared oracle for q_ann_lsh and q_ann_lsh_salted: salting never
    * changes WHICH pairs meet (every corpus row lands in exactly one salt
    * shard and every query probes all shards), so both queries must
    * reproduce this same bucket join bit-for-bit. */
  private lazy val lshOracle: String = {
    val d = DuckSql
    s"""WITH eb AS (SELECT vec_id, embedding,
       |    ${d.dotDbl("embedding", "embedding")} AS n2,
       |    CAST(${lshBucket(d, "embedding")} AS BIGINT) AS bucket
       |  FROM embeddings)
       |SELECT query_id, neighbor_id, bucket, cosine, rn FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
       |    ${duckCos("q", "c")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${duckCos("q", "c")} DESC, c.vec_id) AS rn
       |  FROM eb q JOIN eb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |) WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    // Brute-force cosine near-duplicate pairs.
    "q_dedup_embedding" -> QueryDef(
      (s, d) => {
        GraftFunctions.register(s)
        val e = Tables.embeddings(s, d)
          .selectExpr("vec_id", "embedding",
            "graft_vec_dot(embedding, embedding) AS n2")
        val a = e.selectExpr("vec_id AS vec_id_a", "embedding AS ea", "n2 AS na2")
        val b = e.selectExpr("vec_id AS vec_id_b", "embedding AS eb", "n2 AS nb2")
        a.crossJoin(b)
          .filter(col("vec_id_a") < col("vec_id_b"))
          .selectExpr("vec_id_a", "vec_id_b",
            "(graft_vec_dot(ea, eb) / sqrt(na2 * nb2)) AS cosine")
          .filter(col("cosine") >= NearDupThreshold)
          .orderBy("vec_id_a", "vec_id_b")
      },
      s"""WITH $duckNormCte
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |  ${duckCos("a", "b")} AS cosine
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${duckCos("a", "b")} >= $NearDupThreshold
         |ORDER BY vec_id_a, vec_id_b""".stripMargin),

    // Bucketed near-dup pairs — the scale path for q_dedup_embedding's
    // declared-weak all-pairs crossJoin. Multi-probe hyperplane LSH:
    // candidate pairs are those whose plane-sign buckets differ in AT MOST
    // ONE bit (a near-dup pair that straddles a single hyperplane is still
    // found; brute force remains the recall oracle). Probe-side rows emit
    // their bucket plus its NPlanes single-bit flips, the corpus side
    // keeps its exact bucket, so a qualifying pair matches EXACTLY ONE
    // probe row — disjoint candidates, no dedup shuffle (the SimHash
    // trick). Corpus never broadcasts; the join is a (NPlanes+1)-fold
    // replicated equi-join on bucket — linear, not quadratic.
    "q_dedup_embedding_lsh" -> QueryDef(
      (s, d) => {
        val e = ScratchCache.scratch(lshBucketed(s, d, NPlanes))
        val flips = (0 until NPlanes)
          .map(p => s"CAST(${graft.oracle.SparkSql.xorB("bucket", (1L << p).toString)} AS BIGINT)")
          .mkString(", ")
        val probes = e.selectExpr("vec_id AS vec_id_a", "embedding AS ea",
            "n2 AS na2", s"explode(array(bucket, $flips)) AS bucket")
        val corpus = e.selectExpr("vec_id AS vec_id_b", "embedding AS eb",
          "n2 AS nb2", "bucket")
        probes.join(corpus, Seq("bucket"))
          .filter(col("vec_id_a") < col("vec_id_b"))
          .selectExpr("vec_id_a", "vec_id_b",
            "(graft_vec_dot(ea, eb) / sqrt(na2 * nb2)) AS cosine")
          .filter(col("cosine") >= NearDupThreshold)
          .orderBy("vec_id_a", "vec_id_b")
      }, {
        val d = DuckSql
        s"""WITH eb AS (SELECT vec_id, embedding,
           |    ${d.dotDbl("embedding", "embedding")} AS n2,
           |    CAST(${lshBucket(d, "embedding")} AS BIGINT) AS bucket
           |  FROM embeddings)
           |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           |  ${duckCos("a", "b")} AS cosine
           |FROM eb a JOIN eb b ON a.vec_id < b.vec_id
           |  AND bit_count(${d.xorB("a.bucket", "b.bucket")}) <= 1
           |WHERE ${duckCos("a", "b")} >= $NearDupThreshold
           |ORDER BY vec_id_a, vec_id_b""".stripMargin
      }),

    // Exact brute-force top-k: query side broadcast, corpus scanned once.
    "q_ann_cosine" -> QueryDef(
      (s, d) => {
        GraftFunctions.register(s)
        val e = Tables.embeddings(s, d)
          .selectExpr("vec_id", "embedding",
            "graft_vec_dot(embedding, embedding) AS n2")
        val q = e.filter(col("vec_id") < 20)
          .selectExpr("vec_id AS query_id", "embedding AS qe", "n2 AS qn2")
        val c = e.selectExpr("vec_id AS neighbor_id", "embedding AS ce", "n2 AS cn2")
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))
        c.crossJoin(broadcast(q))
          .filter(col("query_id") =!= col("neighbor_id"))
          .selectExpr("query_id", "neighbor_id",
            "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= TopK)
          .orderBy("query_id", "rn")
      },
      s"""WITH $duckNormCte
         |SELECT query_id, neighbor_id, cosine, rn FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${duckCos("q", "c")} AS cosine,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${duckCos("q", "c")} DESC, c.vec_id) AS rn
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20
         |) WHERE rn <= $TopK ORDER BY query_id, rn""".stripMargin),

    // LSH-bucketed ANN: join only within hyperplane-sign buckets. The
    // bucketed frame is scratch-persisted so the self-join's two branches
    // don't each recompute norms + buckets over the corpus.
    "q_ann_lsh" -> QueryDef(
      (s, d) => {
        val e = ScratchCache.scratch(lshBucketed(s, d, NPlanes))
        val q = e.selectExpr("vec_id AS query_id", "embedding AS qe",
          "n2 AS qn2", "bucket")
        val c = e.selectExpr("vec_id AS neighbor_id", "embedding AS ce",
          "n2 AS cn2", "bucket")
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))
        q.join(c, Seq("bucket"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .selectExpr("query_id", "neighbor_id", "bucket",
            "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("query_id", "rn")
      }, lshOracle),

    // Salted LSH ANN: same semantics as q_ann_lsh (same oracle — salting
    // is a pure re-partitioning of the bucket join), but a bucket with
    // more than SaltBucketRows corpus rows is split into ceil(n/cap) salt
    // shards: corpus rows hash to ONE shard, query rows probe ALL shards
    // of their bucket. A hot bucket (skewed hyperplane region — at 100 TB
    // some region of embedding space is always over-dense) therefore
    // becomes ceil(n/cap) bounded reducers instead of one giant one. The
    // per-bucket count frame is 2^NPlanes rows → broadcast.
    "q_ann_lsh_salted" -> QueryDef(
      (s, d) => {
        val e = ScratchCache.scratch(lshBucketed(s, d, NPlanes))
        val counts = e.groupBy("bucket").agg(count(lit(1)).as("bn"))
        val sized = e.join(broadcast(counts), Seq("bucket"))
          .withColumn("nsalt",
            greatest(lit(1L), ceil(col("bn") / lit(SaltBucketRows))).cast("int"))
        val c = sized.selectExpr("vec_id AS neighbor_id", "embedding AS ce",
          "n2 AS cn2", "bucket",
          "CAST(pmod(xxhash64(vec_id), nsalt) AS INT) AS salt")
        val q = sized.selectExpr("vec_id AS query_id", "embedding AS qe",
          "n2 AS qn2", "bucket", "nsalt")
          .withColumn("salt", explode(sequence(lit(0), col("nsalt") - 1)))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))
        q.join(c, Seq("bucket", "salt"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .selectExpr("query_id", "neighbor_id", "bucket",
            "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("query_id", "rn")
      }, lshOracle),

    // Incremental ANN: a batch of ARRIVING vectors (vec_id % 10 = 0, the
    // next ingest micro-batch) probes the EXISTING corpus's IVF cells
    // for neighbors — never arrival×arrival or corpus×corpus. At 100 TB
    // the corpus is write-time partitioned by cell (cells are stable:
    // deterministic centroids), so each batch reads only the cells its
    // vectors quantize to; per-batch cost ∝ batch size, not corpus size
    // — the vector twin of q_dedup_incremental.
    "q_ann_incremental" -> QueryDef(
      (s, d) => {
        GraftFunctions.register(s)
        graft.functions.TextHashFunctions.register(s)
        val e = ScratchCache.scratch(Tables.embeddings(s, d)
          .selectExpr("vec_id", "embedding",
            "graft_vec_dot(embedding, embedding) AS n2",
            s"CAST(graft_ivf_cell(embedding, $NCells) AS INT) AS cell"))
        val q = e.filter(col("vec_id") % 10 === 0)
          .selectExpr("vec_id AS arrival_id", "embedding AS qe", "n2 AS qn2", "cell")
        val c = e.filter(col("vec_id") % 10 =!= 0)
          .selectExpr("vec_id AS neighbor_id", "embedding AS ce", "n2 AS cn2", "cell")
        val w = Window.partitionBy("arrival_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))
        q.join(c, Seq("cell"))
          .selectExpr("arrival_id", "neighbor_id", "cell",
            "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("arrival_id", "rn")
      }, {
        val d = DuckSql
        s"""WITH eb AS (SELECT vec_id, embedding,
           |    ${d.dotDbl("embedding", "embedding")} AS n2,
           |    CAST(${ivfCell(d, "embedding")} AS INT) AS cell
           |  FROM embeddings)
           |SELECT arrival_id, neighbor_id, cell, cosine, rn FROM (
           |  SELECT q.vec_id AS arrival_id, c.vec_id AS neighbor_id, q.cell,
           |    ${duckCos("q", "c")} AS cosine,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${duckCos("q", "c")} DESC, c.vec_id) AS rn
           |  FROM eb q JOIN eb c ON q.cell = c.cell
           |  WHERE q.vec_id % 10 = 0 AND c.vec_id % 10 <> 0
           |) WHERE rn <= 3 ORDER BY arrival_id, rn""".stripMargin
      }),

    // IVF-flat ANN: coarse-quantize into NCells Voronoi cells, then search
    // only within the query's cell. The other linear-scale path next to
    // hyperplane LSH: at 100 TB the corpus is write-time partitioned by
    // cell, so a query touches one partition (plus neighbor cells for
    // recall, not modeled here).
    "q_ann_ivf" -> QueryDef(
      (s, d) => {
        GraftFunctions.register(s)
        graft.functions.TextHashFunctions.register(s)
        // native argmin expression (bit-identical to the SQL fold) +
        // persist so the self-join doesn't assign cells twice
        val e = ScratchCache.scratch(Tables.embeddings(s, d)
          .selectExpr("vec_id", "embedding",
            "graft_vec_dot(embedding, embedding) AS n2",
            s"CAST(graft_ivf_cell(embedding, $NCells) AS INT) AS cell"))
        val q = e.selectExpr("vec_id AS query_id", "embedding AS qe",
          "n2 AS qn2", "cell")
        val c = e.selectExpr("vec_id AS neighbor_id", "embedding AS ce",
          "n2 AS cn2", "cell")
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))
        q.join(c, Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .selectExpr("query_id", "neighbor_id", "cell",
            "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("query_id", "rn")
      }, {
        val d = DuckSql
        s"""WITH eb AS (SELECT vec_id, embedding,
           |    ${d.dotDbl("embedding", "embedding")} AS n2,
           |    CAST(${ivfCell(d, "embedding")} AS INT) AS cell
           |  FROM embeddings)
           |SELECT query_id, neighbor_id, cell, cosine, rn FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell,
           |    ${duckCos("q", "c")} AS cosine,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${duckCos("q", "c")} DESC, c.vec_id) AS rn
           |  FROM eb q JOIN eb c ON q.cell = c.cell AND q.vec_id <> c.vec_id
           |) WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin
      }),

    // IVF with nprobe=2 — the canonical recall knob: each query probes
    // its nearest AND second-nearest cell. Only the QUERY side fans out
    // (x2 rows through the banded join); the corpus keeps one row per
    // vector in its home cell — at 100 TB the index never duplicates,
    // recall/cost scales with nprobe, and a (query, neighbor) pair can't
    // appear twice because cell2 <> cell1 by construction (the mask sets
    // the chosen cell's distance to +inf before the second argmin).
    "q_ann_ivf_probe2" -> QueryDef(
      (s, d) => {
        GraftFunctions.register(s)
        graft.functions.TextHashFunctions.register(s)
        // native argmin/argmin2 expressions (graft_ivf_cell2 masks the
        // nearest cell and rescans — bit-identical to the oracle's
        // +inf-mask CTE chain, one codegen'd call instead of three HOFs)
        val e = ScratchCache.scratch(Tables.embeddings(s, d)
          .selectExpr("vec_id", "embedding",
            "graft_vec_dot(embedding, embedding) AS n2",
            s"CAST(graft_ivf_cell(embedding, $NCells) AS INT) AS cell1",
            s"CAST(graft_ivf_cell2(embedding, $NCells) AS INT) AS cell2"))
        val probes = e.selectExpr("vec_id AS query_id", "embedding AS qe",
            "n2 AS qn2", "cell1 AS cell")
          .unionAll(e.selectExpr("vec_id AS query_id", "embedding AS qe",
            "n2 AS qn2", "cell2 AS cell"))
        val c = e.selectExpr("vec_id AS neighbor_id", "embedding AS ce",
          "n2 AS cn2", "cell1 AS cell")
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))
        probes.join(c, Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .selectExpr("query_id", "neighbor_id", "cell",
            "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("query_id", "rn")
      }, {
        val d = DuckSql
        s"""WITH v0 AS (SELECT vec_id, embedding,
           |    ${d.dotDbl("embedding", "embedding")} AS n2,
           |    ${ivfDists(d, "embedding")} AS dists
           |  FROM embeddings),
           |v1 AS (SELECT *, CAST(${argminPos(d, "dists")} AS INT) AS cell1 FROM v0),
           |v2 AS (SELECT *, list_transform(generate_series(1, $NCells),
           |    ii -> CASE WHEN ii = cell1 THEN CAST('infinity' AS DOUBLE)
           |          ELSE dists[ii] END) AS dists2 FROM v1),
           |v3 AS (SELECT *, CAST(${argminPos(d, "dists2")} AS INT) AS cell2 FROM v2),
           |probes AS (
           |  SELECT vec_id, embedding, n2, cell1 AS cell FROM v3
           |  UNION ALL
           |  SELECT vec_id, embedding, n2, cell2 AS cell FROM v3
           |)
           |SELECT query_id, neighbor_id, cell, cosine, rn FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell,
           |    ${duckCos("q", "c")} AS cosine,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${duckCos("q", "c")} DESC, c.vec_id) AS rn
           |  FROM probes q JOIN v3 c ON q.cell = c.cell1 AND q.vec_id <> c.vec_id
           |) WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin
      })
  )
}
