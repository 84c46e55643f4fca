package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth check for q_cc_largestar: the declared 6-alternation
  * large-star/small-star output must equal EXACT connected components
  * (per-node minimum reachable id) of the same sampled edge set,
  * computed here with a driver-side union-find. Equality with true CC
  * also PROVES the fixed point was reached on this fixture — an
  * unconverged star graph would misassign some node. (The DuckDB oracle
  * pins the same algebra; this spec pins the SEMANTICS independently of
  * both engines' shared round-unrolled formulation.)
  */
class CcLargeStarSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q_cc_largestar equals union-find ground truth on sf0.001") {
    // the same thinned co-purchase edge set the query builds
    val edges = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
      .groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("a"), col("parts"))
      .select(col("a"), explode(col("parts")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .filter(expr("(CAST(a AS BIGINT) * 1000003 + b) % 53 = 0"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node id in the component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val label: Map[Long, Long] = nodes.groupBy(find).toSeq.flatMap {
      case (_, ns) => val m = ns.min; ns.map(_ -> m)
    }.toMap

    val got = SparkEntry.queries("q_cc_largestar")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == label.keySet,
      s"node sets differ: ${got.size} vs ${label.size}")
    val bad = label.collect { case (n, m) if got(n) != m => n }
    assert(bad.isEmpty,
      s"${bad.size} nodes mislabeled (unconverged or wrong), e.g. ${bad.take(5)}")
    // and the label structure is a star rooted at component minima
    assert(got.forall { case (n, c) => c <= n && got(c) == c },
      "labels are not component-minimum roots")
  }
}
