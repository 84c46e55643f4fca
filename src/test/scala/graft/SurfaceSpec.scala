package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewJoin
import graft.sources.Sources
import graft.streaming.EventStream

/** Source/sink round-trips (MRInput/MROutput/MultiMROutput parity). */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val sample = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    .limit(500)

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("csv round-trip preserves rows") {
    val p = tmp("csv")
    Sources.writeCsv(sample, p)
    val back = Sources.readCsv(spark, p)
    assert(back.count() == 500)
    assert(back.columns.sorted.sameElements(sample.columns.sorted))
  }

  test("json round-trip preserves rows") {
    val p = tmp("json")
    Sources.writeJson(sample, p)
    assert(Sources.readJson(spark, p).count() == 500)
  }

  test("orc round-trip preserves rows and values") {
    val p = tmp("orc")
    Sources.writeOrc(sample, p)
    val back = Sources.readOrc(spark, p)
    val a = back.orderBy("l_orderkey", "l_linenumber").collect()
    val b = sample.orderBy("l_orderkey", "l_linenumber").collect()
    assert(a.sameElements(b))
  }

  test("partitionBy write creates per-key directories and prunes on read") {
    val p = tmp("part")
    Sources.writePartitionedBy(sample, p, "l_returnflag")
    val dirs = new java.io.File(p).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("l_returnflag="))
    assert(dirs.length >= 2, dirs.mkString(","))
    val one = Sources.readParquet(spark, p)
      .filter(col("l_returnflag") === "R")
    one.collect()
    // partition pruning: scan reads only the matching directory
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(500))
  }

  test("text source reads lines") {
    val p = tmp("text")
    sample.select(concat_ws("|", col("l_orderkey"), col("l_returnflag")))
      .write.text(p)
    assert(Sources.readText(spark, p).count() == 500)
  }
}

/** Salted skew join equals the plain join (FairShuffleVertexManager parity). */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("salted join result equals unsalted join on skewed data") {
    // 90% of the big side hits one hot key
    val big = (1 to 5000).map(i => (if (i % 10 == 0) i % 7 else 1, i))
      .toDF("k", "v")
    val small = (0 to 6).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "name").orderBy("k", "v").collect()
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", 8)
      .select("k", "v", "name").orderBy("k", "v").collect()
    assert(salted.sameElements(plain))
  }
}

/** mapGroupsWithState custom state + extensions registration. */
class StatefulStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stateful per-user totals match the batch aggregate") {
    val q = EventStream.statefulUserTotals(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stateful_out")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.sameElements(batch))
  }

  test("graft functions usable from plain SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    graft.functions.TextHashFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_vec_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT))," +
        " array(CAST(2 AS FLOAT), CAST(3 AS FLOAT))) AS d").collect()
    assert(r.head.getDouble(0) == 9.0)
    val s = spark.sql(
      "SELECT graft_simhash(graft_token_hashes(array('a','b'), 12), 48) AS h")
      .collect()
    assert(s.head.getLong(0) != 0L)
  }
}
