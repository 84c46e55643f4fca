package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries heavy-hitters sketch as a typed Aggregator — the
  * bounded-state candidate pass of the two-phase exact heavy-hitters
  * pipeline (q_heavy_hitters).
  *
  * Reference shape: the combiner surface
  * (tez-runtime-library/.../MRCombiner.java:118) exists precisely so a
  * reduce's input can be shrunk map-side when the aggregation admits
  * partial merging. Misra–Gries is the classic instance where the
  * partial state is provably BOUNDED (≤ k-1 counters per task)
  * regardless of input size or key cardinality — unlike a hash
  * aggregate, whose partial state grows with distinct keys.
  *
  * Guarantee (Misra & Gries 1982; merge form Agarwal et al. 2013): after
  * summarizing any stream of n tokens with k counters, every token whose
  * true count exceeds n/k is present in the summary, and merging two
  * summaries by count-sum followed by subtracting the k-th largest count
  * preserves the deviation bound. Spark runs `reduce` map-side per
  * partition (ObjectHashAggregate partial) and `merge` on the single
  * final reducer — each map task ships ≤ k-1 (token, count) pairs, so
  * at 100 TB the shuffle for THIS aggregation is #tasks × k rows, not
  * the corpus' token multiset. A second exact counting pass over only
  * the ≤ k-1 candidates (broadcast semi-join) removes false positives,
  * making the final answer exact — which is what lets a sketch query
  * sit under a bit-exact SQL oracle.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], tok: String): Map[String, Long] =
    m.get(tok) match {
      case Some(c) => m.updated(tok, c + 1)
      case None if m.size < k - 1 => m.updated(tok, 1L)
      case None =>
        // decrement-all step: drop zeroed counters
        m.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size < k) summed
    else {
      // subtract the k-th largest count from all (the streaming
      // decrement generalized to batches), keep positives: ≤ k-1 remain
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      summed.collect { case (t, c) if c > kth => t -> (c - kth) }
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
