package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ANN-LSH scale knobs (VERDICT r02 item 6): plane count is a real
  * parameter (bucket space = 2^planes), and oversized buckets are salted
  * into bounded shards without changing results. */
class AnnLshSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucket space scales with the plane-count knob") {
    val b2 = ops.SimilarityQueries.lshBucketed(spark, sf, 2)
      .select("bucket").distinct().count()
    val b6 = ops.SimilarityQueries.lshBucketed(spark, sf, 6)
      .select("bucket").distinct().count()
    assert(b2 <= 4, s"2 planes must yield <= 4 buckets, got $b2")
    assert(b6 <= 64, s"6 planes must yield <= 64 buckets, got $b6")
    assert(b6 > b2, s"more planes must spread rows over more buckets ($b2 -> $b6)")
  }

  test("salting engages on the fixture and preserves results exactly") {
    // the salted query must actually split buckets here, not no-op
    val maxBucket = ops.SimilarityQueries.lshBucketed(spark, sf, 6)
      .groupBy("bucket").count().agg(org.apache.spark.sql.functions.max("count"))
      .collect()(0).getLong(0)
    assert(maxBucket > 8, s"fixture too small to exercise salting (max bucket $maxBucket)")

    val plain = SparkEntry.queries("q_ann_lsh")(spark, sf).collect()
    val salted = SparkEntry.queries("q_ann_lsh_salted")(spark, sf).collect()
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain),
      "salted LSH diverged from unsalted — salting must be a pure re-partitioning")
  }
}
