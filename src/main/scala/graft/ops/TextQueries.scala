package graft.ops

import org.apache.spark.sql.functions.{count, lit, sum}

import graft.oracle.{Dialect, DuckSql, SparkSql}
import graft.{QueryDef, Tables}

/** Text-analysis family over the `documents` table — the operators a
  * training-data pipeline runs on raw text at 100 TB (beyond the Tez
  * reference surface; SURVEY.md §2c gap analysis / extension mandate).
  *
  * All arithmetic is generated for BOTH engines from graft.oracle.Dialect
  * so the DuckDB oracle is bit-identical: integer token counts, one-shot
  * double divisions, deterministic polynomial hashes.
  *
  * Scale notes: every query here is embarrassingly parallel per document
  * (narrow scan → project → small groupBy), i.e. map-side only except the
  * final aggregate — these pipelines are scan-bound at 100 TB, exactly
  * what you want.
  */
object TextQueries {

  private def both(f: Dialect => String): (String, String) =
    (f(SparkSql), f(DuckSql))

  // ---- q_text_stats: per-document quality scoring ----
  private def statsExprs(d: Dialect): Seq[String] = {
    val toks = d.tokens("text")
    val nTok = d.sizeL(toks)
    val nDis = d.sizeL(d.distinctL(toks))
    val totChars = d.foldBig(d.transform(toks, "t", "length(t)"), "a", "x", "a + x")
    val stops = d.sizeL(d.filterL(toks, "t", "t IN ('the', 'a', 'of', 'and')"))
    Seq(
      s"CAST($nTok AS BIGINT) AS n_tokens",
      s"CAST($nDis AS BIGINT) AS n_distinct",
      s"(CAST($totChars AS DOUBLE) / $nTok) AS avg_token_len",
      s"(CAST($nDis AS DOUBLE) / $nTok) AS distinct_ratio",
      s"(CAST($stops AS DOUBLE) / $nTok) AS stopword_ratio",
      s"(0.5 * (CAST($nDis AS DOUBLE) / $nTok) + 0.3 * (CAST($stops AS DOUBLE) / $nTok)" +
        s" + 0.2 * least(CAST($nTok AS DOUBLE) / 100.0, 1.0)) AS quality_score")
  }

  // ---- q_lang_id: wordlist-scoring language guess ----
  // Marker stopword lists per language. NOTE: the fixture text is a
  // shared synthetic vocabulary, so real-language markers rarely hit and
  // the tie-break dominates — the query demonstrates the scoring
  // mechanism (hit-count argmax with deterministic priority), which is
  // what the oracle checks.
  private val markers = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "zai", "le", "he"))

  private def langExprs(d: Dialect): Seq[String] = {
    val toks = d.tokens("text")
    val scores = markers.map { case (lang, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      lang -> d.sizeL(d.filterL(toks, "t", s"t IN ($inList)"))
    }
    val scoreCols = scores.map { case (l, e) => s"CAST($e AS BIGINT) AS score_$l" }
    val others = (l: String) => scores.filter(_._1 != l).map(_._2)
    val pred = scores.map { case (l, e) =>
      s"WHEN $e >= greatest(${others(l).mkString(", ")}) THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    scoreCols :+ s"$pred AS pred_lang"
  }

  // ---- q_token_count: whitespace + BPE-ish regex tokenization ----
  private def tokenCountExprs(d: Dialect): Seq[String] = {
    val ws = d.tokens("text")
    val re = d.tokensRe("text")
    val bpe = d.foldBig(
      d.transform(re, "t", d.idiv("length(t) + 3", "4")), "a", "x", "a + x")
    Seq(
      s"CAST(${d.sizeL(ws)} AS BIGINT) AS n_ws_tokens",
      s"CAST(${d.sizeL(re)} AS BIGINT) AS n_re_tokens",
      s"CAST($bpe AS BIGINT) AS n_bpe_units")
  }

  // ---- q_doc_fingerprint: rolling polynomial hash over token hashes ----
  private def fingerprintExpr(d: Dialect): String = {
    val toks = d.tokens("text")
    val tokHashes = d.transform(toks, "t", d.polyHash("t", 12))
    d.foldBig(tokHashes, "acc", "h", s"(acc * 131 + h) % ${Dialect.M}")
  }

  val defs: Map[String, QueryDef] = {
    val statsD = statsExprs(DuckSql)
    val (langS, langD) = (langExprs(SparkSql), langExprs(DuckSql))
    val tcD = tokenCountExprs(DuckSql)
    val (fpS, fpD) = both(fingerprintExpr)

    Map(
      // Spark side runs the one-pass native TextStatsExpr; the ratio
      // expressions divide the same integers in the same order as the
      // oracle's HOF pipeline, so values stay bit-identical.
      "q_text_stats" -> QueryDef(
        (s, dir) => {
          graft.functions.TextHashFunctions.register(s)
          Tables.documentsParallel(s, dir)
            .selectExpr("doc_id", "lang",
              s"graft_text_stats(${SparkSql.tokens("text")}) AS st")
            .selectExpr("doc_id", "lang",
              "st.n_tokens AS n_tokens",
              "st.n_distinct AS n_distinct",
              "(CAST(st.total_chars AS DOUBLE) / st.n_tokens) AS avg_token_len",
              "(CAST(st.n_distinct AS DOUBLE) / st.n_tokens) AS distinct_ratio",
              "(CAST(st.stop_hits AS DOUBLE) / st.n_tokens) AS stopword_ratio",
              "(0.5 * (CAST(st.n_distinct AS DOUBLE) / st.n_tokens)" +
                " + 0.3 * (CAST(st.stop_hits AS DOUBLE) / st.n_tokens)" +
                " + 0.2 * least(CAST(st.n_tokens AS DOUBLE) / 100.0, 1.0)) AS quality_score")
            .orderBy("doc_id")
        },
        s"""SELECT doc_id, lang, ${statsD.mkString(", ")}
           |FROM documents ORDER BY doc_id""".stripMargin),

      "q_lang_id" -> QueryDef(
        (s, dir) =>
          Tables.documentsParallel(s, dir)
            .selectExpr(Seq("doc_id", "lang") ++ langS: _*)
            .orderBy("doc_id"),
        s"""SELECT doc_id, lang, ${langD.mkString(", ")}
           |FROM documents ORDER BY doc_id""".stripMargin),

      // Per-(lang, source) corpus token accounting — the shuffle is tiny
      // (100 groups) regardless of corpus size; all heavy work is map-side.
      // The Spark side runs the one-pass native TokenCountsExpr (no token
      // arrays materialized); integer outputs equal the oracle's dual HOF
      // splits exactly (graft.functions.TextHashKernels.tokenCounts).
      "q_token_count" -> QueryDef(
        (s, dir) => {
          graft.functions.TextHashFunctions.register(s)
          Tables.documentsParallel(s, dir)
            .selectExpr("lang", "source", "graft_token_counts(text) AS tc")
            .selectExpr("lang", "source",
              "tc.n_ws_tokens AS n_ws_tokens",
              "tc.n_re_tokens AS n_re_tokens",
              "tc.n_bpe_units AS n_bpe_units")
            .groupBy("lang", "source")
            .agg(
              count(lit(1)).as("n_docs"),
              sum("n_ws_tokens").as("sum_ws_tokens"),
              sum("n_re_tokens").as("sum_re_tokens"),
              sum("n_bpe_units").as("sum_bpe_units"))
            .orderBy("lang", "source")
        },
        s"""SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(n_ws_tokens) AS BIGINT) AS sum_ws_tokens,
           |  CAST(sum(n_re_tokens) AS BIGINT) AS sum_re_tokens,
           |  CAST(sum(n_bpe_units) AS BIGINT) AS sum_bpe_units
           |FROM (SELECT lang, source, ${tcD.mkString(", ")} FROM documents)
           |GROUP BY lang, source ORDER BY lang, source""".stripMargin),

      // Per-doc repetition ratio: the fraction of word-3-gram slots whose
      // shingle repeats an earlier one (1 - distinct/total). Repetitive
      // boilerplate is a primary removal signal in corpus curation; the
      // arithmetic is two integers and one division, so both engines
      // agree exactly. Map-side only.
      "q_repetition" -> QueryDef(
        (s, dir) => {
          graft.functions.TextHashFunctions.register(s)
          val toks = SparkSql.tokens("text")
          Tables.documentsParallel(s, dir)
            .selectExpr("doc_id",
              s"greatest(size($toks) - 2, 1) AS n_shingles",
              s"size(graft_shingle_hash_set($toks)) AS n_distinct_shingles")
            .selectExpr("doc_id", "n_shingles", "n_distinct_shingles",
              "(CAST(n_shingles - n_distinct_shingles AS DOUBLE) / n_shingles)" +
                " AS repetition_ratio")
            .orderBy("doc_id")
        }, {
          val d = DuckSql
          val toks = d.tokens("text")
          val distinctSh =
            d.sizeL(d.distinctL(d.transform(d.shingles3(toks), "s", d.polyHash("s", 24))))
          s"""SELECT doc_id, n_shingles, n_distinct_shingles,
             |  (CAST(n_shingles - n_distinct_shingles AS DOUBLE) / n_shingles)
             |    AS repetition_ratio
             |FROM (SELECT doc_id,
             |    greatest(${d.sizeL(toks)} - 2, 1) AS n_shingles,
             |    $distinctSh AS n_distinct_shingles
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin
        }),

      // Gopher-style quality gate: boolean removal flags composed from
      // the one-pass stats, plus the surviving-document verdict. The
      // thresholds are fixture-scaled; the mechanism (flag columns a
      // curation pipeline audits before dropping) is what is checked.
      "q_quality_filter" -> QueryDef(
        (s, dir) => {
          graft.functions.TextHashFunctions.register(s)
          Tables.documentsParallel(s, dir)
            .selectExpr("doc_id",
              s"graft_text_stats(${SparkSql.tokens("text")}) AS st")
            .selectExpr("doc_id",
              "(st.n_tokens < 20) AS too_short",
              "(st.n_tokens > 500) AS too_long",
              "((CAST(st.n_distinct AS DOUBLE) / st.n_tokens) < 0.3) AS low_diversity",
              "((CAST(st.stop_hits AS DOUBLE) / st.n_tokens) < 0.01) AS low_stopwords")
            .selectExpr("doc_id", "too_short", "too_long", "low_diversity",
              "low_stopwords",
              "(NOT (too_short OR too_long OR low_diversity OR low_stopwords)) AS keep")
            .orderBy("doc_id")
        }, {
          val d = DuckSql
          val toks = d.tokens("text")
          val nTok = d.sizeL(toks)
          val nDis = d.sizeL(d.distinctL(toks))
          val stops = d.sizeL(d.filterL(toks, "t", "t IN ('the', 'a', 'of', 'and')"))
          s"""SELECT doc_id, too_short, too_long, low_diversity, low_stopwords,
             |  (NOT (too_short OR too_long OR low_diversity OR low_stopwords)) AS keep
             |FROM (SELECT doc_id,
             |    ($nTok < 20) AS too_short,
             |    ($nTok > 500) AS too_long,
             |    ((CAST($nDis AS DOUBLE) / $nTok) < 0.3) AS low_diversity,
             |    ((CAST($stops AS DOUBLE) / $nTok) < 0.01) AS low_stopwords
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin
        }),

      "q_doc_fingerprint" -> QueryDef(
        (s, dir) =>
          Tables.documentsParallel(s, dir)
            .selectExpr("doc_id", s"CAST($fpS AS BIGINT) AS fingerprint")
            .orderBy("doc_id"),
        s"""SELECT doc_id, CAST($fpD AS BIGINT) AS fingerprint
           |FROM documents ORDER BY doc_id""".stripMargin)
    )
  }
}
