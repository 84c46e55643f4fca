package graft.ops

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Set-operation family: vertex-group union + distinct/intersect/except.
  *
  * Reference semantics:
  *  - Tez vertex-group union is pure concatenation (UNION ALL):
  *    ConcatenatedMergedKeyValueInput (tez-runtime-library/.../input/
  *    ConcatenatedMergedKeyValueInput.java:40-103), VertexGroup API
  *    (tez-api/.../dag/api/VertexGroup.java:42). `q_union_all_counts`
  *    preserves multiplicity to mirror that exactly.
  *  - UnionExample adds dedup on top (tez-tests/.../UnionExample.java:
  *    114-163) → `union().distinct()`.
  *  - intersect/except shapes come from CartesianProduct's membership
  *    filter (tez-examples/.../CartesianProduct.java:133-139) and
  *    JoinValidate's symmetric difference (JoinValidate.java:228-262).
  *
  * Scale note: union is a zero-shuffle concatenation of scans; the
  * distinct/intersect/except variants shuffle once on the key — Spark
  * plans them as aggregates/joins over the same single exchange.
  */
object SetQueries {

  val defs: Map[String, QueryDef] = Map(
    // Tez-native union semantics: concatenation, multiplicity preserved.
    // Count per key makes the declared output deterministic.
    "q_union_all_counts" -> QueryDef(
      (s, d) => {
        val a = Tables.orders(s, d).select(col("o_custkey").as("cust_key"))
        val b = Tables.customer(s, d).select(col("c_custkey").as("cust_key"))
        a.unionAll(b).groupBy("cust_key")
          .agg(count(lit(1)).as("n_occurrences"))
          .orderBy("cust_key")
      },
      """SELECT cust_key, count(*) AS n_occurrences FROM (
        |  SELECT o_custkey AS cust_key FROM orders
        |  UNION ALL
        |  SELECT c_custkey AS cust_key FROM customer
        |) GROUP BY cust_key ORDER BY cust_key""".stripMargin),

    // UnionExample's union + dedup.
    "q_union_distinct" -> QueryDef(
      (s, d) => {
        val a = Tables.orders(s, d).select(col("o_custkey").as("cust_key"))
        val b = Tables.customer(s, d).select(col("c_custkey").as("cust_key"))
        a.union(b).distinct().orderBy("cust_key")
      },
      """SELECT o_custkey AS cust_key FROM orders
        |UNION
        |SELECT c_custkey AS cust_key FROM customer
        |ORDER BY cust_key""".stripMargin),

    "q_intersect" -> QueryDef(
      (s, d) => {
        val a = Tables.orders(s, d).select(col("o_custkey").as("cust_key"))
        val b = Tables.customer(s, d).select(col("c_custkey").as("cust_key"))
        a.intersect(b).orderBy("cust_key")
      },
      """SELECT o_custkey AS cust_key FROM orders
        |INTERSECT
        |SELECT c_custkey AS cust_key FROM customer
        |ORDER BY cust_key""".stripMargin),

    // Non-empty at every SF: all customers minus those with high-value orders.
    "q_except" -> QueryDef(
      (s, d) => {
        val a = Tables.customer(s, d).select(col("c_custkey").as("cust_key"))
        val b = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("cust_key"))
        a.except(b).orderBy("cust_key")
      },
      """SELECT c_custkey AS cust_key FROM customer
        |EXCEPT
        |SELECT o_custkey AS cust_key FROM orders WHERE o_totalprice > 400000
        |ORDER BY cust_key""".stripMargin)
  )
}
