package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed bounded top-k aggregator — the scalable replacement for
  * window-sort secondary sort.
  *
  * Reference shape: Tez secondary sort keeps ALL rows flowing through a
  * partition+sort edge with a grouping comparator (tez-tests/.../
  * SecondarySort.java:136-148); the window `row_number` rendition in
  * q_secondary_sort does the same (shuffle every row, sort within
  * partitions). This Aggregator instead keeps a bounded k-element buffer
  * per group, so Spark runs it as a partial ObjectHashAggregate BEFORE
  * the shuffle — at 100 TB only k rows per (group, map task) cross the
  * wire, the Tez-combiner idea (MRCombiner.java:118) applied to top-k.
  *
  * Ordering: ascending by (l_shipdate, l_orderkey, l_linenumber) —
  * identical to the q_secondary_sort oracle, which this query reuses.
  */
case class LineKeyed(
    l_suppkey: Long,
    l_shipdate: java.sql.Timestamp,
    l_orderkey: Long,
    l_linenumber: Int)

class TopKByShipdate(k: Int)
    extends Aggregator[LineKeyed, List[LineKeyed], List[LineKeyed]] {

  private def lt(a: LineKeyed, b: LineKeyed): Boolean = {
    val c1 = a.l_shipdate.compareTo(b.l_shipdate)
    if (c1 != 0) c1 < 0
    else if (a.l_orderkey != b.l_orderkey) a.l_orderkey < b.l_orderkey
    else a.l_linenumber < b.l_linenumber
  }

  /** insert into a sorted (ascending) list, keeping at most k. */
  private def insert(buf: List[LineKeyed], x: LineKeyed): List[LineKeyed] = {
    if (buf.lengthCompare(k) >= 0 && lt(buf.last, x)) buf
    else {
      val (lo, hi) = buf.span(lt(_, x))
      (lo ::: x :: hi).take(k)
    }
  }

  override def zero: List[LineKeyed] = Nil
  override def reduce(buf: List[LineKeyed], x: LineKeyed): List[LineKeyed] =
    insert(buf, x)
  override def merge(a: List[LineKeyed], b: List[LineKeyed]): List[LineKeyed] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[LineKeyed]): List[LineKeyed] = buf

  override def bufferEncoder: Encoder[List[LineKeyed]] =
    ExpressionEncoder[List[LineKeyed]]()
  override def outputEncoder: Encoder[List[LineKeyed]] =
    ExpressionEncoder[List[LineKeyed]]()
}
