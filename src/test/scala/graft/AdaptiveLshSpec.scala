package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior of the density-adaptive LSH refinement (q_ann_lsh_adaptive /
  * ops.SimilarityQueries.lshRefined) — the clustered-corpus fix for the
  * LSH occupancy limit the r08 stress measured (hot bucket 2365 vs
  * median 7 at 30×, pair mass 196×; salting re-partitions the join but
  * never shrinks the volume).
  *
  * The contract under test:
  *  - membership: refinement only SPLITS buckets — (bucket, cell) groups
  *    partition each base bucket; cold buckets (≤ cap rows) keep one
  *    cell (-1) with membership unchanged;
  *  - every hot bucket actually splits (≥ 2 sub-cells), and the
  *    candidate-pair mass Σc² strictly drops wherever a split happened;
  *  - determinism: strided member seeds + exact integer argmin routing
  *    make the assignment a pure function of the corpus — two
  *    invocations agree row-for-row (the property that lets a 100 TB
  *    corpus be write-time partitioned by the refined key);
  *  - recall@3 against brute-force truth holds a pinned floor (the
  *    split trades recall for bounded occupancy; the floor documents
  *    the measured trade and catches routing regressions).
  */
class AdaptiveLshSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val refined = {
    val df = ops.SimilarityQueries.lshRefined(spark, sf)
      .select("vec_id", "bucket", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ScratchCache.release()
    df
  }

  test("refinement partitions buckets: cold unchanged, hot split") {
    val byBucket = refined.groupBy(_._2)
    val cap = ops.SimilarityQueries.LshCellRows
    val hot = byBucket.filter(_._2.length > cap)
    val cold = byBucket.filter(_._2.length <= cap)
    assert(hot.nonEmpty, "fixture must exercise the split path")
    assert(cold.nonEmpty, "fixture must exercise the cold path")
    // cold buckets keep exactly one cell: -1
    cold.foreach { case (b, rows) =>
      assert(rows.map(_._3).distinct.toSeq == Seq(-1L),
        s"cold bucket $b must keep the single cell -1")
    }
    // every hot bucket really splits, and its pair mass strictly drops
    hot.foreach { case (b, rows) =>
      val cells = rows.groupBy(_._3).map(_._2.length)
      assert(cells.size >= 2, s"hot bucket $b (n=${rows.length}) must split")
      val split = cells.map(c => c.toDouble * c).sum
      val whole = rows.length.toDouble * rows.length
      assert(split < whole,
        s"hot bucket $b pair mass must drop: $split !< $whole")
    }
  }

  test("assignment is deterministic across invocations") {
    val again = ops.SimilarityQueries.lshRefined(spark, sf)
      .select("vec_id", "bucket", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ScratchCache.release()
    assert(refined.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("adaptive-LSH recall@3 holds its pinned floor") {
    functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding",
        "graft_vec_dot(embedding, embedding) AS n2")
    val q = e.selectExpr("vec_id AS query_id", "embedding AS qe", "n2 AS qn2")
    val c = e.selectExpr("vec_id AS neighbor_id", "embedding AS ce", "n2 AS cn2")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val truth = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .selectExpr("query_id", "neighbor_id",
        "(graft_vec_dot(qe, ce) / sqrt(qn2 * cn2)) AS cosine")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("q_ann_lsh_adaptive")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ScratchCache.release()
    val recall = (truth & got).size.toDouble / truth.size
    info(f"adaptive-LSH recall@3 = $recall%.3f (truth ${truth.size})")
    // Fixture context: the fixture-tiny cap (8) splits EVERY bucket of
    // the near-uniform corpus into ~8-row cells, so top-3 recall is
    // floor-bounded by cell size — measured 0.039, deterministic. The
    // cap is the recall/cost knob (candidates/probe ≈ cap at candidate
    // mass N·cap): this declared query pins the tiny default so every
    // fixture SF exercises the split path under the DuckDB oracle,
    // while AnnClusteredStress measures the production-shaped point
    // (cap = 125, the IVF occupancy target) on the clustered corpus —
    // see SCALE_r08_clustered_ann*.json for the occupancy/recall rows
    // next to the hash and trained quantizers. The floor pins the
    // deterministic fixture value against routing regressions.
    assert(recall >= 0.03, f"recall collapsed: $recall%.3f")
  }
}
