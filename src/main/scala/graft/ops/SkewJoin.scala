package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins — the explicit analog of
  * Tez's FairShuffleVertexManager `FAIR_PARALLELISM` routing
  * (tez-runtime-library/.../vertexmanager/FairShuffleVertexManager.java:
  * 113-132), which splits one oversized source partition across several
  * destination tasks.
  *
  * First line of defense is AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, asserted in AqeSpec) — it
  * needs no code. Salting is for the cases AQE cannot fix: a single
  * hot KEY (not just a hot partition) joined against a non-broadcastable
  * right side. The big side gets a deterministic per-row salt; the small
  * side is replicated once per salt; the join key becomes (key, salt) so
  * one hot key fans out over `buckets` reducers.
  */
object SkewJoin {

  /** Inner equi-join with the big side salted into `buckets` sub-keys.
    * Result rows equal `big.join(small, key)` exactly (asserted in
    * SkewSpec); only the shuffle distribution changes. */
  def saltedInnerJoin(
      big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = big.withColumn(
      "__graft_salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val replicated = small.withColumn(
      "__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__graft_salt"), "inner")
      .drop("__graft_salt")
  }
}
