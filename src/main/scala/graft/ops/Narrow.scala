package graft.ops

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** Narrow (no-shuffle) dependencies — the ONE_TO_ONE edge family.
  *
  * Reference: EdgeProperty.DataMovementType.ONE_TO_ONE routes producer
  * task i's output to exactly consumer task i
  * (tez-api/.../dag/api/EdgeProperty.java:49, OneToOneEdgeManager;
  * exercised by tez-tests/.../BroadcastAndOneToOneExample.java:58-150).
  *
  * Spark expresses this as narrow dependencies: chained `mapPartitions`
  * stay in ONE stage (whole-stage pipelining — no exchange, no
  * materialization between operators, which is Tez's DAG-fusion win
  * over MapReduce), and `zipPartitions` pairs co-partitioned RDDs
  * partition-by-partition. At 100 TB a ONE_TO_ONE chain is free; the
  * planner only breaks it when a width change forces a shuffle.
  */
object Narrow {

  /** Chain per-partition transforms; Spark pipelines all of them into a
    * single stage (asserted in NarrowSpec — the plan has no Exchange). */
  def chain[T: Encoder](ds: Dataset[T], fns: Seq[Iterator[T] => Iterator[T]]): Dataset[T] =
    fns.foldLeft(ds)((d, f) => d.mapPartitions(f))

  /** ONE_TO_ONE combine of two identically-partitioned RDDs. */
  def oneToOne[A: ClassTag, B: ClassTag, C: ClassTag](
      left: RDD[A], right: RDD[B])(
      f: (Iterator[A], Iterator[B]) => Iterator[C]): RDD[C] = {
    require(left.getNumPartitions == right.getNumPartitions,
      s"ONE_TO_ONE requires equal partition counts: " +
        s"${left.getNumPartitions} vs ${right.getNumPartitions}")
    left.zipPartitions(right)(f)
  }

  /** True when the physical plan contains no shuffle exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
