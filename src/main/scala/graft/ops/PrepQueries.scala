package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, max, min, struct, sum}

import graft.oracle.{Dialect, DuckSql, SparkSql}
import graft.{QueryDef, Tables}

/** Training-batch preparation family — the operators that sit between a
  * curated corpus and the training loop (extension mandate alongside
  * SURVEY.md §2; same surface class as the curation family).
  *
  *  - q_seq_pack: GPT-style sequence packing — documents concatenated
  *    in a deterministic order and chopped into fixed-token training
  *    sequences; per-document placement accounting.
  *  - q_temperature_mix: multinomial temperature resampling weights per
  *    language (the multilingual-corpus mixing recipe: p_l ∝ share^α
  *    with α < 1 boosting low-resource slices).
  *  - q_inverted_index: posting-list construction (token → document
  *    frequency, total term frequency, capped posting sample) — the
  *    search-index / corpus-exploration op.
  *  - q_bpe_pairs: adjacent-character-pair frequencies over the token
  *    vocabulary — the first merge-candidate table of byte-pair-encoding
  *    tokenizer training (Sennrich et al., ACL'16).
  *
  * Scale notes are per-query below; the common theme is that nothing
  * here materializes corpus-sized driver or single-partition state:
  * the packing prefix-sum is two-phase (per-range partials + an
  * offset table bounded by the partition count), the mixing weights
  * aggregate to language cardinality, and the index shuffles only
  * distinct (token, doc) pairs with a top-k head.
  */
object PrepQueries {

  /** Tokens per packed training sequence. */
  private val SeqBudget = 256L

  /** Contiguous doc_id ranges for the distributed prefix-sum — the
    * offset table has exactly this many rows, independent of corpus
    * size (at 100 TB you'd size it to the scan's partition count; the
    * mechanism is identical). */
  private val PackParts = 16L

  /** Temperature exponent α for multinomial resampling. */
  private val Alpha = 0.3

  /** Posting-sample cap and output head for the inverted index. */
  private val PostCap = 5
  private val IndexTop = 100

  /** Chunking geometry: 64-token windows every 48 tokens (16 overlap). */
  private val ChunkTokens = 64
  private val ChunkStride = 48

  def defs: Map[String, QueryDef] = Map(

    // SEQUENCE PACKING — the training-loader step: concatenate all
    // documents in doc_id order and cut the token stream into
    // fixed-SeqBudget sequences; report, per document, which sequences
    // it lands in (first/last sequence index, how many sequences it
    // spans, its offset inside the first one).
    //
    // Scale shape: the global running token total is a DISTRIBUTED
    // prefix-sum, not a single-partition window — docs are bucketed
    // into contiguous doc_id ranges, stage 1 computes per-range totals
    // (a PackParts-row table whose own prefix-sum is trivially
    // bounded), stage 2 adds the broadcast range offset to a
    // within-range running sum. Driver state: one scalar (max doc_id).
    // A naive `Window.orderBy(doc_id)` with no partition key would
    // serialize the whole corpus through one task — the classic
    // 100 TB failure this shape avoids.
    "q_seq_pack" -> QueryDef(
      (s, d) => {
        val dl = SparkSql
        val docs = Tables.documentsParallel(s, d)
          .selectExpr("doc_id",
            s"CAST(${dl.sizeL(dl.tokens("text"))} AS BIGINT) AS n_tok")
          .filter(col("n_tok") > 0)
        // bounded scalar: range width for contiguous pid assignment
        val maxId = docs.agg(max("doc_id")).head().getLong(0)
        val span = maxId / PackParts + 1
        val withPid = docs.selectExpr(
          "doc_id", "n_tok", s"CAST(doc_id div $span AS INT) AS pid")
        // stage 1: per-range totals; the offset window runs over
        // PackParts rows, never the corpus
        val offsets = withPid.groupBy("pid")
          .agg(sum("n_tok").as("ptot"))
          .withColumn("offset",
            coalesce(sum("ptot").over(Window.orderBy("pid")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("pid", "offset")
        // stage 2: within-range running sum + broadcast offset
        val w = Window.partitionBy("pid").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        withPid.join(broadcast(offsets), Seq("pid"))
          .withColumn("cum",
            coalesce(sum("n_tok").over(w), lit(0L)) + col("offset"))
          .selectExpr(
            "doc_id", "n_tok",
            s"(cum div $SeqBudget) AS first_seq",
            s"((cum + n_tok - 1) div $SeqBudget) AS last_seq",
            s"(((cum + n_tok - 1) div $SeqBudget) - (cum div $SeqBudget) + 1) AS n_seqs",
            s"(cum % $SeqBudget) AS seq_offset")
          .orderBy("doc_id")
      }, {
        val dl = DuckSql
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    CAST(${dl.sizeL(dl.tokens("text"))} AS BIGINT) AS n_tok
           |  FROM documents),
           |nz AS (SELECT doc_id, n_tok FROM toks WHERE n_tok > 0),
           |c AS (
           |  SELECT doc_id, n_tok,
           |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS cum
           |  FROM nz)
           |SELECT doc_id, n_tok,
           |  (cum // $SeqBudget) AS first_seq,
           |  ((cum + n_tok - 1) // $SeqBudget) AS last_seq,
           |  (((cum + n_tok - 1) // $SeqBudget) - (cum // $SeqBudget) + 1) AS n_seqs,
           |  (cum % $SeqBudget) AS seq_offset
           |FROM c ORDER BY doc_id""".stripMargin
      }),

    // TEMPERATURE MIXING — per-language multinomial resampling weights:
    // share_l = n_l / N, p_l ∝ share_l^α (α = 0.3 boosts low-resource
    // languages), q_l = normalized sampling probability, boost = q/share
    // (the up/down-sampling factor an epoch applies). The single
    // transcendental (power) is quantized to ppm IMMEDIATELY; every
    // downstream op (normalization, boost, epoch size) is pure BIGINT
    // arithmetic — order-independent and engine-identical.
    //
    // Scale shape: one map-side-combinable count per language, then
    // two scalar cross-joins over a language-cardinality table.
    // Nothing here grows with the corpus.
    "q_temperature_mix" -> QueryDef(
      (s, d) => {
        val byLang = Tables.documents(s, d)
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        val tot = byLang.agg(sum("n_docs").as("n_total"))
        val p = byLang.crossJoin(broadcast(tot))
          .selectExpr("lang", "n_docs", "n_total",
            s"CAST(floor(power(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), $Alpha)" +
              " * 1000000.0 + 0.5) AS BIGINT) AS p_micro")
        val ps = p.agg(sum("p_micro").as("p_sum"))
        p.crossJoin(broadcast(ps))
          .selectExpr("lang", "n_docs",
            "((n_docs * 1000000) div n_total) AS share_ppm",
            "p_micro",
            "((p_micro * 1000000) div p_sum) AS q_ppm",
            "((((p_micro * 1000000) div p_sum) * n_total) div 1000000) AS epoch_docs",
            "((((p_micro * 1000000) div p_sum) * 1000000) div ((n_docs * 1000000) div n_total)) AS boost_ppm")
          .orderBy("lang")
      },
      s"""WITH by_lang AS (
         |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM by_lang),
         |p AS (
         |  SELECT lang, n_docs, n_total,
         |    CAST(floor(power(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), $Alpha)
         |      * 1000000.0 + 0.5) AS BIGINT) AS p_micro
         |  FROM by_lang, tot),
         |ps AS (SELECT CAST(sum(p_micro) AS BIGINT) AS p_sum FROM p)
         |SELECT lang, n_docs,
         |  ((n_docs * 1000000) // n_total) AS share_ppm,
         |  p_micro,
         |  ((p_micro * 1000000) // p_sum) AS q_ppm,
         |  ((((p_micro * 1000000) // p_sum) * n_total) // 1000000) AS epoch_docs,
         |  ((((p_micro * 1000000) // p_sum) * 1000000) // ((n_docs * 1000000) // n_total)) AS boost_ppm
         |FROM p, ps ORDER BY lang""".stripMargin),

    // INVERTED INDEX — token → (document frequency, total term
    // frequency, first-PostCap posting sample), head = the IndexTop
    // highest-df tokens with a full deterministic tie-break.
    //
    // Scale shape: the shuffle key space is distinct (token, doc)
    // pairs — vocabulary-bounded, with per-doc tf computed map-side
    // under partial aggregation; the head is a TakeOrdered top-k, not
    // a global sort materialization. Posting lists are CAPPED before
    // leaving the aggregate (a real index would write full postings
    // per token to a partitioned sink; the capped sample keeps the
    // declared result driver-safe at any corpus size).
    "q_inverted_index" -> QueryDef(
      (s, d) => {
        val dl = SparkSql
        Tables.documentsParallel(s, d)
          .selectExpr("doc_id", s"explode(${dl.tokens("text")}) AS token")
          .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
          .groupBy("token")
          .agg(count(lit(1)).as("df"),
            sum("tf").as("tf_total"),
            org.apache.spark.sql.functions.expr(
              s"concat_ws('|', transform(slice(array_sort(collect_list(doc_id)), 1, $PostCap)," +
                " x -> CAST(x AS STRING))) ").as("postings"))
          .orderBy(col("df").desc, col("token"))
          .limit(IndexTop)
      }, {
        val dl = DuckSql
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(${dl.tokens("text")}) AS token
           |  FROM documents),
           |per_doc AS (
           |  SELECT token, doc_id, count(*) AS tf
           |  FROM tok GROUP BY token, doc_id),
           |post AS (
           |  SELECT token, CAST(count(*) AS BIGINT) AS df,
           |    CAST(sum(tf) AS BIGINT) AS tf_total,
           |    array_to_string(list_transform(
           |      list_slice(list(doc_id ORDER BY doc_id), 1, $PostCap),
           |      x -> CAST(x AS VARCHAR)), '|') AS postings
           |  FROM per_doc GROUP BY token)
           |SELECT token, df, tf_total, postings
           |FROM post ORDER BY df DESC, token LIMIT $IndexTop""".stripMargin
      }),

    // PHRASE SEARCH over a POSITIONAL index — the retrieval operator
    // the plain inverted index cannot serve: "row scan" as a phrase
    // requires token POSITIONS, matched by the classic adjacency join
    // (postings of term1 at p ⋈ postings of term2 at p−1 on (doc,
    // pos)). Scale shape: after the one tokenize pass (scratch-shared
    // by both term branches), ONLY the queried terms' postings move —
    // the join is on (doc_id, pos), cardinality ≈ the two posting
    // lists, never the corpus. The oracle is algorithm-INDEPENDENT
    // (substring occurrence counting via replace-length), valid here
    // because the fixture vocabulary has no prefix/suffix collisions
    // for the phrase terms and docs are single-space tokenized, so
    // token adjacency ≡ substring occurrence; two unrelated
    // algorithms agreeing is the strongest oracle form in this repo.
    "q_phrase_search" -> QueryDef(
      (s, d) => {
        val dl = SparkSql
        val pos = graft.ScratchCache.scratch(
          Tables.documentsParallel(s, d)
            .selectExpr("doc_id",
              s"posexplode(${dl.tokens("text")}) AS (pos, token)"))
        val t1 = pos.filter(col("token") === "row")
          .select("doc_id", "pos")
        val t2 = pos.filter(col("token") === "scan")
          .selectExpr("doc_id", "pos - 1 AS pos")
        t1.join(t2, Seq("doc_id", "pos"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_occurrences"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  CAST((length(text) - length(replace(text, 'row scan', '')))
        |    / length('row scan') AS BIGINT) AS n_occurrences
        |FROM documents
        |WHERE contains(text, 'row scan')
        |ORDER BY doc_id""".stripMargin),

    // BPE MERGE CANDIDATES — per language, the top-10 adjacent
    // character pairs by frequency, where a pair's frequency is the sum
    // of the corpus counts of every vocabulary token containing it (one
    // occurrence per position). The classic BPE-training trick is
    // exercised structurally: pairs are generated from the
    // vocabulary-WITH-counts, never by re-scanning the corpus per merge
    // round — after the one (lang, token) count shuffle, the pair table
    // is bounded by |vocab| × max_token_len, so each further merge
    // round of a real trainer costs vocab-sized work. All counts are
    // BIGINT; rank ties break on the pair text so the cutoff is
    // deterministic in both engines.
    "q_bpe_pairs" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{expr, length, row_number}
        val vocab = Tables.documentsParallel(s, d)
          .selectExpr("lang", s"explode(${SparkSql.tokensRe("text")}) AS t")
          .groupBy("lang", "t").agg(count(lit(1)).as("cnt"))
        val pairs = vocab
          .filter(length(col("t")) >= 2)
          .selectExpr("lang", "cnt",
            "explode(transform(sequence(1, length(t) - 1)," +
              " i -> substring(t, i, 2))) AS pair")
          .groupBy("lang", "pair").agg(sum("cnt").as("cnt"))
        pairs
          .withColumn("rnk", row_number().over(
            Window.partitionBy("lang")
              .orderBy(col("cnt").desc, col("pair").asc)))
          .filter(col("rnk") <= 10)
          .selectExpr("lang", "CAST(rnk AS BIGINT) AS rnk", "pair", "cnt")
          .orderBy("lang", "rnk")
      }, {
        val dl = DuckSql
        s"""WITH vocab AS (
           |  SELECT lang, t, CAST(count(*) AS BIGINT) AS cnt FROM (
           |    SELECT lang, unnest(${dl.tokensRe("text")}) AS t
           |    FROM documents)
           |  GROUP BY lang, t),
           |pairs AS (
           |  SELECT lang, pair, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
           |    SELECT lang, cnt,
           |      unnest(list_transform(generate_series(1, length(t) - 1),
           |        i -> substr(t, i, 2))) AS pair
           |    FROM vocab WHERE length(t) >= 2)
           |  GROUP BY lang, pair)
           |SELECT lang, CAST(rnk AS BIGINT) AS rnk, pair, cnt FROM (
           |  SELECT lang, pair, cnt,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY cnt DESC, pair) AS rnk
           |  FROM pairs)
           |WHERE rnk <= 10
           |ORDER BY lang, rnk""".stripMargin
      }),

    // BPE MERGE APPLICATION — the iteration step q_bpe_pairs feeds:
    // take each language's TOP merge candidate, apply it to the
    // vocabulary (every occurrence of the pair collapses to one merged
    // symbol — replace() is leftmost non-overlapping in both engines,
    // which is exactly BPE's merge order for a single pair), and
    // re-count the pair table over the merged vocabulary — the
    // pair-count → merge → re-count loop that IS tokenizer training.
    // The merged symbol is '#', unreachable in tokensRe output, so the
    // substitution is unambiguous. Per-round cost stays VOCAB-bounded:
    // the merge and the re-count both run over (lang, token, cnt),
    // never the corpus.
    "q_bpe_encode" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{broadcast, expr, length, row_number}
        val vocab = graft.ScratchCache.scratch(
          Tables.documentsParallel(s, d)
            .selectExpr("lang", s"explode(${SparkSql.tokensRe("text")}) AS t")
            .groupBy("lang", "t").agg(count(lit(1)).as("cnt")))
        def pairCounts(src: org.apache.spark.sql.DataFrame, tcol: String,
            keys: Seq[String]) =
          src.filter(length(col(tcol)) >= 2)
            .selectExpr(keys ++ Seq("cnt",
              s"explode(transform(sequence(1, length($tcol) - 1)," +
                s" i -> substring($tcol, i, 2))) AS pair"): _*)
            .groupBy((keys :+ "pair").map(col): _*).agg(sum("cnt").as("cnt"))
        val top1 = pairCounts(vocab, "t", Seq("lang"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang")
              .orderBy(col("cnt").desc, col("pair").asc)))
          .filter(col("rn") === 1)
          .select(col("lang"), col("pair").as("merge_pair"))
        val merged = vocab.join(broadcast(top1), "lang")
          .selectExpr("lang", "merge_pair", "cnt",
            "replace(t, merge_pair, '#') AS t2")
        pairCounts(merged, "t2", Seq("lang", "merge_pair"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("lang")
              .orderBy(col("cnt").desc, col("pair").asc)))
          .filter(col("rnk") <= 5)
          .selectExpr("lang", "merge_pair", "CAST(rnk AS BIGINT) AS rnk",
            "pair", "cnt")
          .orderBy("lang", "rnk")
      }, {
        val dl = DuckSql
        s"""WITH vocab AS (
           |  SELECT lang, t, CAST(count(*) AS BIGINT) AS cnt FROM (
           |    SELECT lang, unnest(${dl.tokensRe("text")}) AS t
           |    FROM documents)
           |  GROUP BY lang, t),
           |p1 AS (
           |  SELECT lang, pair, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
           |    SELECT lang, cnt,
           |      unnest(list_transform(generate_series(1, length(t) - 1),
           |        i -> substr(t, i, 2))) AS pair
           |    FROM vocab WHERE length(t) >= 2)
           |  GROUP BY lang, pair),
           |top1 AS (
           |  SELECT lang, pair AS merge_pair FROM (
           |    SELECT lang, pair,
           |      row_number() OVER (PARTITION BY lang
           |        ORDER BY cnt DESC, pair) AS rn
           |    FROM p1) WHERE rn = 1),
           |merged AS (
           |  SELECT v.lang, t1.merge_pair, v.cnt,
           |    replace(v.t, t1.merge_pair, '#') AS t2
           |  FROM vocab v JOIN top1 t1 ON v.lang = t1.lang),
           |p2 AS (
           |  SELECT lang, merge_pair, pair, CAST(sum(cnt) AS BIGINT) AS cnt
           |  FROM (
           |    SELECT lang, merge_pair, cnt,
           |      unnest(list_transform(generate_series(1, length(t2) - 1),
           |        i -> substr(t2, i, 2))) AS pair
           |    FROM merged WHERE length(t2) >= 2)
           |  GROUP BY lang, merge_pair, pair)
           |SELECT lang, merge_pair, CAST(rnk AS BIGINT) AS rnk, pair, cnt
           |FROM (
           |  SELECT lang, merge_pair, pair, cnt,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY cnt DESC, pair) AS rnk
           |  FROM p2)
           |WHERE rnk <= 5
           |ORDER BY lang, rnk""".stripMargin
      }),

    // BPE SECOND MERGE ROUND — the q_bpe_encode loop unrolled one round
    // deeper: round 1's top pair collapses to '#', the pair table is
    // re-counted over the merged vocabulary (where '#'-adjacent pairs
    // now compete — the merged symbol is a first-class alphabet member,
    // exactly BPE's training dynamics), round 2's winner collapses to
    // '@', and the output is the post-round-2 pair table. Proves the
    // round structure COMPOSES: each round is vocab-bounded (merge +
    // re-count over (lang, token, cnt), never the corpus), so a real
    // N-round trainer is this same stage iterated with a driver loop
    // holding only the merge table — the reference-scale property. Both
    // sentinels are unreachable in tokensRe output and replace() is
    // leftmost non-overlapping in both engines, so the substitution
    // chain is deterministic and oracle-exact.
    "q_bpe_encode2" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{broadcast, length, row_number}
        val vocab = graft.ScratchCache.scratch(
          Tables.documentsParallel(s, d)
            .selectExpr("lang", s"explode(${SparkSql.tokensRe("text")}) AS t")
            .groupBy("lang", "t").agg(count(lit(1)).as("cnt")))
        def pairCounts(src: org.apache.spark.sql.DataFrame, tcol: String,
            keys: Seq[String]) =
          src.filter(length(col(tcol)) >= 2)
            .selectExpr(keys ++ Seq("cnt",
              s"explode(transform(sequence(1, length($tcol) - 1)," +
                s" i -> substring($tcol, i, 2))) AS pair"): _*)
            .groupBy((keys :+ "pair").map(col): _*).agg(sum("cnt").as("cnt"))
        def top1(pairs: org.apache.spark.sql.DataFrame, keys: Seq[String],
            as: String) =
          pairs.withColumn("rn", row_number().over(
              Window.partitionBy(keys.map(col): _*)
                .orderBy(col("cnt").desc, col("pair").asc)))
            .filter(col("rn") === 1)
            .select((keys.map(col) :+ col("pair").as(as)): _*)
        val m1 = top1(pairCounts(vocab, "t", Seq("lang")), Seq("lang"), "merge1")
        val merged1 = graft.ScratchCache.scratch(
          vocab.join(broadcast(m1), "lang")
            .selectExpr("lang", "merge1", "cnt",
              "replace(t, merge1, '#') AS t2"))
        val m2 = top1(pairCounts(merged1, "t2", Seq("lang", "merge1")),
          Seq("lang", "merge1"), "merge2")
        val merged2 = merged1.join(broadcast(m2), Seq("lang", "merge1"))
          .selectExpr("lang", "merge1", "merge2", "cnt",
            "replace(t2, merge2, '@') AS t3")
        pairCounts(merged2, "t3", Seq("lang", "merge1", "merge2"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("lang")
              .orderBy(col("cnt").desc, col("pair").asc)))
          .filter(col("rnk") <= 5)
          .selectExpr("lang", "merge1", "merge2",
            "CAST(rnk AS BIGINT) AS rnk", "pair", "cnt")
          .orderBy("lang", "rnk")
      }, {
        val dl = DuckSql
        s"""WITH vocab AS (
           |  SELECT lang, t, CAST(count(*) AS BIGINT) AS cnt FROM (
           |    SELECT lang, unnest(${dl.tokensRe("text")}) AS t
           |    FROM documents)
           |  GROUP BY lang, t),
           |p1 AS (
           |  SELECT lang, pair, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
           |    SELECT lang, cnt,
           |      unnest(list_transform(generate_series(1, length(t) - 1),
           |        i -> substr(t, i, 2))) AS pair
           |    FROM vocab WHERE length(t) >= 2)
           |  GROUP BY lang, pair),
           |m1 AS (
           |  SELECT lang, pair AS merge1 FROM (
           |    SELECT lang, pair,
           |      row_number() OVER (PARTITION BY lang
           |        ORDER BY cnt DESC, pair) AS rn
           |    FROM p1) WHERE rn = 1),
           |merged1 AS (
           |  SELECT v.lang, m1.merge1, v.cnt,
           |    replace(v.t, m1.merge1, '#') AS t2
           |  FROM vocab v JOIN m1 ON v.lang = m1.lang),
           |p2 AS (
           |  SELECT lang, merge1, pair, CAST(sum(cnt) AS BIGINT) AS cnt
           |  FROM (
           |    SELECT lang, merge1, cnt,
           |      unnest(list_transform(generate_series(1, length(t2) - 1),
           |        i -> substr(t2, i, 2))) AS pair
           |    FROM merged1 WHERE length(t2) >= 2)
           |  GROUP BY lang, merge1, pair),
           |m2 AS (
           |  SELECT lang, merge1, pair AS merge2 FROM (
           |    SELECT lang, merge1, pair,
           |      row_number() OVER (PARTITION BY lang
           |        ORDER BY cnt DESC, pair) AS rn
           |    FROM p2) WHERE rn = 1),
           |merged2 AS (
           |  SELECT g.lang, g.merge1, m2.merge2, g.cnt,
           |    replace(g.t2, m2.merge2, '@') AS t3
           |  FROM merged1 g JOIN m2
           |    ON g.lang = m2.lang AND g.merge1 = m2.merge1),
           |p3 AS (
           |  SELECT lang, merge1, merge2, pair, CAST(sum(cnt) AS BIGINT) AS cnt
           |  FROM (
           |    SELECT lang, merge1, merge2, cnt,
           |      unnest(list_transform(generate_series(1, length(t3) - 1),
           |        i -> substr(t3, i, 2))) AS pair
           |    FROM merged2 WHERE length(t3) >= 2)
           |  GROUP BY lang, merge1, merge2, pair)
           |SELECT lang, merge1, merge2, CAST(rnk AS BIGINT) AS rnk, pair, cnt
           |FROM (
           |  SELECT lang, merge1, merge2, pair, cnt,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY cnt DESC, pair) AS rnk
           |  FROM p3)
           |WHERE rnk <= 5
           |ORDER BY lang, rnk""".stripMargin
      }),

    // N-ROUND BPE TRAINER — the q_bpe_encode/encode2 round structure
    // driven by an actual LOOP (rounds 1..4), emitting the artifact a
    // tokenizer trainer actually produces: the per-language MERGE TABLE
    // (round, winning pair, its count at selection). Each round is
    // count-pairs → argmax-per-lang → collapse-to-sentinel over the
    // (lang, token, cnt) vocabulary — vocab-bounded, never a corpus
    // rescan — and the driver loop holds nothing but the round counter
    // and the (tiny, broadcast) per-round winners. Sentinels
    // '#','@','%','&' are unreachable in tokensRe output, so merged
    // symbols are first-class alphabet members in later rounds (real
    // BPE dynamics: round-2 pairs may contain round-1's symbol). The
    // oracle unrolls the identical 4 rounds as MATERIALIZED CTEs
    // (inlined, each round would re-scan documents per reference).
    "q_bpe_train4" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{broadcast, length, row_number}
        val sentinels = Seq("#", "@", "%", "&")
        var voc = graft.ScratchCache.scratch(
          Tables.documentsParallel(s, d)
            .selectExpr("lang", s"explode(${SparkSql.tokensRe("text")}) AS t")
            .groupBy("lang", "t").agg(count(lit(1)).as("cnt")))
        val rounds = (1 to sentinels.size).map { r =>
          // per-lang argmax as min(struct(-cnt, pair)) — the identical
          // (cnt DESC, pair ASC) tie law as the oracle's ROW_NUMBER,
          // but MAP-COMBINABLE: the winner reduces partially before the
          // per-lang exchange instead of sorting every (lang, pair)
          // count through a window per round (r13, guide §2.3)
          val top = graft.ScratchCache.scratch(voc
            .filter(length(col("t")) >= 2)
            .selectExpr("lang", "cnt",
              "explode(transform(sequence(1, length(t) - 1)," +
                " i -> substring(t, i, 2))) AS pair")
            .groupBy("lang", "pair").agg(sum("cnt").as("cnt"))
            .groupBy("lang")
            .agg(min(struct((-col("cnt")).as("nc"), col("pair"))).as("w"))
            .select(col("lang"), col("w.pair").as("merge_pair"),
              (-col("w.nc")).as("cnt")))
          voc = graft.ScratchCache.scratch(
            voc.join(broadcast(top.select("lang", "merge_pair")), "lang")
              .selectExpr("lang",
                s"replace(t, merge_pair, '${sentinels(r - 1)}') AS t", "cnt"))
          top.selectExpr("lang", s"CAST($r AS BIGINT) AS round",
            "merge_pair", "cnt")
        }
        rounds.reduce(_ unionByName _).orderBy("lang", "round")
      }, {
        val dl = DuckSql
        val sentinels = Seq("#", "@", "%", "&")
        def round(r: Int, prev: String): String =
          s"""p$r AS MATERIALIZED (
             |  SELECT lang, pair, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
             |    SELECT lang, cnt,
             |      unnest(list_transform(generate_series(1, length(t) - 1),
             |        i -> substr(t, i, 2))) AS pair
             |    FROM $prev WHERE length(t) >= 2)
             |  GROUP BY lang, pair),
             |t$r AS MATERIALIZED (
             |  SELECT lang, pair AS merge_pair, cnt FROM (
             |    SELECT lang, pair, cnt,
             |      row_number() OVER (PARTITION BY lang
             |        ORDER BY cnt DESC, pair) AS rn
             |    FROM p$r) WHERE rn = 1),
             |v$r AS MATERIALIZED (
             |  SELECT v.lang, replace(v.t, t1.merge_pair,
             |    '${sentinels(r - 1)}') AS t, v.cnt
             |  FROM $prev v JOIN t$r t1 ON v.lang = t1.lang)""".stripMargin
        val rounds = (1 to sentinels.size)
          .map(r => round(r, if (r == 1) "v0" else s"v${r - 1}"))
          .mkString(",\n")
        val out = (1 to sentinels.size)
          .map(r => s"SELECT lang, CAST($r AS BIGINT) AS round, merge_pair, cnt FROM t$r")
          .mkString("\nUNION ALL\n")
        s"""WITH v0 AS MATERIALIZED (
           |  SELECT lang, t, CAST(count(*) AS BIGINT) AS cnt FROM (
           |    SELECT lang, unnest(${dl.tokensRe("text")}) AS t
           |    FROM documents)
           |  GROUP BY lang, t),
           |$rounds
           |SELECT lang, round, merge_pair, cnt FROM (
           |$out)
           |ORDER BY lang, round""".stripMargin
      }),

    // DOCUMENT CHUNKING — the retrieval/context-window prep op: every
    // document splits into 64-token windows on a 48-token stride
    // (16-token overlap, so no boundary-spanning phrase is lost), each
    // chunk carrying its offset, length, and a rolling content
    // fingerprint (the chunk-level dedup / provenance key). Where
    // q_seq_pack CONCATENATES docs into fixed training sequences, this
    // keeps doc boundaries and OVERLAPS windows — the two ends of the
    // sequence-prep spectrum.
    //
    // Scale shape: one corpus scan; the window generator and per-chunk
    // hashing are pure map-side HOFs (explode of a bounded start
    // sequence, slice, fold) — no shuffle at all until the final
    // ORDER BY, and a production run would write chunks partitioned by
    // doc hash instead of sorting. Short docs clamp to one partial
    // window in both engines.
    "q_doc_chunks" -> QueryDef(
      (s, dir) => {
        val dl = SparkSql
        val fp = dl.foldBig(
          dl.transform("ctoks", "t", dl.polyHash("t", 12)),
          "acc", "h", s"(acc * 131 + h) % ${Dialect.M}")
        Tables.documentsParallel(s, dir)
          .selectExpr("doc_id", s"${dl.tokens("text")} AS toks")
          .selectExpr("doc_id", "toks",
            s"explode(sequence(1, greatest(size(toks), 1), $ChunkStride)) AS st")
          .selectExpr("doc_id",
            s"CAST((st - 1) div $ChunkStride AS BIGINT) AS chunk_idx",
            "CAST(st AS BIGINT) AS start_tok",
            s"slice(toks, st, $ChunkTokens) AS ctoks")
          .selectExpr("doc_id", "chunk_idx", "start_tok",
            "CAST(size(ctoks) AS BIGINT) AS n_tokens", s"$fp AS fp")
          .orderBy("doc_id", "chunk_idx")
      }, {
        val dl = DuckSql
        val fp = dl.foldBig(
          dl.transform("ctoks", "t", dl.polyHash("t", 12)),
          "acc", "h", s"(acc * 131 + h) % ${Dialect.M}")
        s"""WITH docs AS (SELECT doc_id, ${dl.tokens("text")} AS toks
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, toks,
           |    unnest(generate_series(1, greatest(${dl.sizeL("toks")}, 1),
           |      $ChunkStride)) AS st
           |  FROM docs),
           |c AS (
           |  SELECT doc_id,
           |    CAST((st - 1) // $ChunkStride AS BIGINT) AS chunk_idx,
           |    CAST(st AS BIGINT) AS start_tok,
           |    list_slice(toks, st, st + ${ChunkTokens - 1}) AS ctoks
           |  FROM st)
           |SELECT doc_id, chunk_idx, start_tok,
           |  CAST(${dl.sizeL("ctoks")} AS BIGINT) AS n_tokens,
           |  CAST($fp AS BIGINT) AS fp
           |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
      }))
}
