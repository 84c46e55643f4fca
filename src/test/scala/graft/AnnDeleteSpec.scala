package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletes on the SERVED ANN index (q_ann_delete's mechanics): the
  * index is a versioned keyed table, a delete batch must (1) remove
  * exactly its keys, (2) rewrite ONLY the files whose key range the
  * batch touches — O(delta·fanout), never O(table) — and (3) leave the
  * pre-delete version readable (time travel over immutable shared
  * files). The probe-equality CLAIM (delete-then-probe ≡ probe of the
  * never-inserted corpus) is gated by the declared query's DuckDB
  * oracle; this spec gates the storage evidence the oracle can't see.
  */
class AnnDeleteSpec extends AnyFunSuite {
  import SparkTestSession._

  test("sparse delete prunes files, removes exactly its keys, keeps history") {
    val root = s"${ProcScratch.base}/spec_ann_delete"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val e = ops.SimilarityQueries.trainedCells(spark, sf)
    try {
      val v1 = sources.KeyedTable.write(spark, root, "annidx",
        e.select("vec_id", "embedding", "n2", "cell"), "vec_id", 8)
      val n0 = sources.KeyedTable.read(spark, root, "annidx").count()
      // a key-LOCAL delete batch: one narrow id range, so only the
      // file(s) spanning it may be rewritten
      val lo = 0L
      val hi = n0 / 8
      val deletes = e.filter(col("vec_id").between(lo, hi))
        .select("vec_id")
      val nDel = deletes.count()
      assert(nDel > 0)
      val stats = sources.KeyedTable.mergeDelta(spark, root, "annidx",
        deletes, "vec_id") { (cur, ch) =>
        cur.join(ch.select("vec_id"), Seq("vec_id"), "left_anti")
      }
      // the pruning contract: a range-local batch must not rewrite the
      // whole table
      assert(stats.filesRewritten < stats.filesTotal,
        s"delete rewrote ${stats.filesRewritten} of ${stats.filesTotal}")
      assert(stats.filesCarried > 0)
      val after = sources.KeyedTable.read(spark, root, "annidx")
      assert(after.count() === n0 - nDel)
      assert(after.filter(col("vec_id").between(lo, hi)).count() === 0L,
        "deleted keys survive in the post-delete version")
      // history: the pre-delete version still reads complete
      assert(sources.KeyedTable.read(spark, root, "annidx", v1).count()
        === n0)
    } finally ScratchCache.release()
  }
}
