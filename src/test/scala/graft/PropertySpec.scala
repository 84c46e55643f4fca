package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded random trials) mirroring the reference's
  * semantics-bearing unit suites (SURVEY.md §5 / FIXTURES.md §B):
  *  - grouping yields each key exactly once with all its values
  *    (TestValuesIterator invariant);
  *  - sort output is non-decreasing and stable across partition counts
  *    (TestPipelinedSorter/TestTezMerger invariant);
  *  - equal keys land in equal partitions (HashPartitioner contract);
  *  - union preserves multiplicity, distinct removes it (UnionExample).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def trials(n: Int)(body: List[(Int, Int)] => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach { _ =>
      val kvs = List.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(10), rnd.nextInt(201) - 100))
      body(kvs)
    }
  }

  test("groupBy yields each key exactly once with all its values") {
    trials(5) { kvs =>
      val got = kvs.toDF("k", "v").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
      val want = kvs.groupBy(_._1).map { case (k, vs) =>
        k -> (vs.size.toLong, vs.map(_._2.toLong).sum)
      }
      assert(got == want)
    }
  }

  test("sort is non-decreasing and stable across partition counts") {
    trials(3) { kvs =>
      val a = kvs.toDF("k", "v").repartition(1)
        .orderBy("k", "v").collect().map(r => (r.getInt(0), r.getInt(1)))
      val b = kvs.toDF("k", "v").repartition(7)
        .orderBy("k", "v").collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(a.sameElements(b))
      assert(a.sameElements(a.sorted))
    }
  }

  test("equal keys land in equal partitions (hash partitioning contract)") {
    val df = (0 until 200).map(i => (i % 10, i)).toDF("k", "v")
      .repartition(8, col("k"))
      .withColumn("pid", spark_partition_id())
    val partsPerKey = df.groupBy("k")
      .agg(countDistinct("pid").as("nparts")).collect()
    assert(partsPerKey.forall(_.getLong(1) == 1L))
  }

  test("union preserves multiplicity; distinct removes it") {
    trials(3) { kvs =>
      val df = kvs.toDF("k", "v").select("k")
      val doubled = df.unionAll(df)
      assert(doubled.count() == 2L * kvs.size)
      val dk: Array[Int] = doubled.distinct().collect().map(_.getInt(0)).sorted
      val want: Array[Int] = kvs.map(_._1).distinct.sorted.toArray
      assert(dk.sameElements(want))
    }
  }
}

/** Dynamic-optimization parity (SURVEY.md §2e / §7 step 7): Tez's
  * ShuffleVertexManager auto-parallelism and FairShuffleVertexManager
  * skew handling map to Spark AQE — assert AQE actually engages. */
class AqeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("AQE coalesces shuffle partitions (ShuffleVertexManager parity)") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      // tiny shuffle → AQE should coalesce far below 64 reducers
      val df = Tables.lineitem(spark, sf)
        .groupBy("l_returnflag").agg(count(lit(1)))
      df.collect()
      val finalPartitions = df.rdd.getNumPartitions
      assert(finalPartitions < 64,
        s"AQE should coalesce 64 shuffle partitions, got $finalPartitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("AQE converts eligible sort-merge join to broadcast at runtime") {
    // nation is tiny: even without an explicit broadcast() hint the
    // runtime plan must end up broadcast, not shuffling the fact side.
    val c = Tables.customer(spark, sf)
    val n = Tables.nation(spark, sf)
    val j = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
