package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The custom expression family (TokenPolyHashes / ShingleHashSet3 /
  * SimHashExpr / IntersectSizeExpr / TextStatsExpr / IvfCellExpr / VecDot)
  * must participate in codegen, not fall back to interpreted eval.
  *
  * `factoryMode=CODEGEN_ONLY` makes expression-level codegen failures
  * throw, and `codegen.fallback=false` makes whole-stage compile failures
  * throw — so a broken doGenCode fails these tests instead of silently
  * degrading to the interpreted path.
  */
class CodegenSpec extends AnyFunSuite {
  import SparkTestSession._

  private val exprHeavy = Seq(
    "q_dedup_simhash", "q_dedup_minhash", "q_dedup_ngram",
    "q_dedup_minhash_weighted", "q_ann_lsh_salted", "q_dedup_embedding_lsh",
    "q_contamination", "q_dedup_incremental",
    "q_text_stats", "q_token_count", "q_ann_ivf", "q_ann_ivf_probe2",
    "q_ann_cosine", "q_dedup_embedding")

  private def withForcedCodegen[T](body: => T): T = {
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  for (name <- exprHeavy) {
    test(s"$name executes with codegen forced (no interpreted fallback)") {
      withForcedCodegen {
        assert(SparkEntry.queries(name)(spark, sf).collect().nonEmpty)
      }
    }
  }

  test("codegen and interpreted eval agree bit-for-bit") {
    def run(mode: String): Array[Row] = {
      val conf = spark.conf
      val prev = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      conf.set("spark.sql.codegen.factoryMode", mode)
      try SparkEntry.queries("q_dedup_simhash")(spark, sf).collect()
      finally conf.set("spark.sql.codegen.factoryMode", prev)
    }
    assert(run("CODEGEN_ONLY").sameElements(run("NO_CODEGEN")))
  }
}
