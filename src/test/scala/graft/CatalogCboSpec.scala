package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Catalog tables + cost-based optimization — the session-reuse half of
  * the reference's client surface (`TezClient.java:384,613-650`: one AM
  * serves many DAGs, amortizing setup; the Spark analog beyond a shared
  * SparkSession is the CATALOG: tables saved once, ANALYZEd once, every
  * subsequent query planning against persisted statistics the way
  * Hive-on-Tez sizes its DAGs from metastore stats).
  *
  * Coverage:
  *  - saveAsTable + ANALYZE ... FOR ALL COLUMNS persists rowCount + NDV;
  *  - the SAME verbatim SQL the declared q_sql_* queries run over temp
  *    views returns identical rows against catalog tables with CBO on;
  *  - join REORDER is stats-driven: a pathologically-ordered join text
  *    (fact tables first) is re-ordered by CostBasedJoinReorder when
  *    stats + CBO are on, and left as written when CBO is off.
  */
class CatalogCboSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private val db = "graft_cat"
  private val tables =
    Seq("region", "nation", "customer", "supplier", "orders", "lineitem")

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  /** Fresh session: its OWN temp-view namespace and conf (other suites'
    * temp views must not shadow the catalog tables), sharing the
    * persistent catalog — the "second DAG in the session" in Tez terms. */
  private lazy val cs = {
    val s = spark.newSession()
    s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    rmrf(new java.io.File(s"/tmp/graft_warehouse/$db.db"))
    s.sql(s"CREATE DATABASE $db")
    s.catalog.setCurrentDatabase(db)
    val load: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("region" -> Tables.region, "nation" -> Tables.nation,
        "customer" -> Tables.customer, "supplier" -> Tables.supplier,
        "orders" -> Tables.orders, "lineitem" -> Tables.lineitem)
    tables.foreach { t =>
      // TIMESTAMP_NTZ columns become TIMESTAMP (LTZ) in the catalog
      // copy: Spark's FilterEstimation has no TimestampNTZType case
      // (MatchError under CBO), and with a UTC session the two types
      // carry identical instants
      val src = load(t)(s, sf)
      val cast = src.schema.fields.foldLeft(src) { (df, f) =>
        if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
          df.withColumn(f.name, df(f.name)
            .cast(org.apache.spark.sql.types.TimestampType))
        else df
      }
      cast.write.mode("overwrite").saveAsTable(t)
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    s
  }

  /** Timestamp-normalized collect: NTZ (temp-view run) and LTZ (catalog
    * run) stringify identically under the UTC session. */
  private def rowsOf(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
    val casted = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType ||
          f.dataType == org.apache.spark.sql.types.TimestampType)
        d.withColumn(f.name, d(f.name).cast("string"))
      else d
    }
    casted.collect()
  }

  /** Leaf relation names in plan order — the join order fingerprint. */
  private def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
      .map { s =>
        tables.find(t => s.contains(s"$db.$t") || s.contains(s"`$t`"))
          .getOrElse("?")
      }

  test("declared q_sql texts return identical rows from ANALYZEd catalog tables with CBO on") {
    cs.conf.set("spark.sql.cbo.enabled", "true")
    try {
      for (name <- Seq("q_sql_region_revenue", "q_sql_top_revenue")) {
        val catalogRows = rowsOf(cs.sql(ops.SqlQueries.texts(name)))
        val viewRows = rowsOf(SparkEntry.queries(name)(spark, sf))
        assert(catalogRows.sameElements(viewRows),
          s"$name diverged between catalog and temp-view execution")
      }
    } finally cs.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("ANALYZE persists rowCount into catalog table plan stats") {
    // .stats reads SQLConf.get from the ACTIVE session on this thread,
    // so cs (where cbo is on) must be active while we look
    cs.conf.set("spark.sql.cbo.enabled", "true")
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(cs)
    try {
      val li = cs.table("lineitem")
      val expected = li.count()
      assert(li.queryExecution.optimizedPlan.stats.rowCount
          .contains(BigInt(expected)),
        s"catalog rowCount stat missing: ${li.queryExecution.optimizedPlan.stats}")
    } finally {
      cs.conf.set("spark.sql.cbo.enabled", "false")
      prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  test("CBO join reorder is stats-driven: pathological join text gets re-ordered") {
    // the snowflake query written WORST-first: the two fact tables join
    // first in the text; dimension filters come last
    val pathological =
      s"""SELECT n_name AS nation,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, nation""".stripMargin

    def runWith(cbo: Boolean): (Seq[String], Array[org.apache.spark.sql.Row]) = {
      cs.conf.set("spark.sql.cbo.enabled", cbo.toString)
      cs.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      try {
        val df = cs.sql(pathological)
        (leafOrder(df), df.collect())
      } finally {
        cs.conf.set("spark.sql.cbo.enabled", "false")
        cs.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      }
    }
    val (offOrder, offRows) = runWith(cbo = false)
    val (onOrder, onRows) = runWith(cbo = true)
    // same answer either way...
    assert(onRows.sameElements(offRows))
    // ...and the same answer as the canonical declared query
    val declared = SparkEntry.queries("q_sql_region_revenue")(spark, sf).collect()
    assert(onRows.sameElements(declared))
    // the reorder actually used the statistics: the join tree is not the
    // text's tree anymore (CostBasedJoinReorder needs rowCount+NDV on
    // every side — exactly what ANALYZE persisted)
    assert(onOrder != offOrder,
      s"CBO did not reorder the pathological join: off=$offOrder on=$onOrder")
  }
}
