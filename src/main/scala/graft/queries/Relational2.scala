package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables
import graft.ops.AsOfJoin

/** Extended relational coverage: rollup, scalar subquery + HAVING,
  * UNION ALL, date parts, parser-path predicates + IN-list lookups,
  * cross join, correlated-style per-group thresholds, and the as-of
  * join. Same parity rules as [[Relational]].
  */
object Relational2 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def dsum(c: org.apache.spark.sql.Column) = sum(dec(c)).cast(DoubleType)

  // ---------------------------------------------------------------- q23
  /** ROLLUP hierarchy totals (grouping-set aggregation; one pass,
    * Expand keeps it a single shuffle). */
  private def q23(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q23Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Scalar subquery + HAVING: customers whose revenue beats the
    * all-customer average (exact decimal threshold on both sides). */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val perCust = o.groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("cust_total"))
    // scalar subquery as a broadcast 1-row cross join — no collect(),
    // the whole plan stays lazy and distributed
    val globalAvg = perCust.agg(
      (sum(dec(col("cust_total"))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("global_avg"))
    perCust.crossJoin(broadcast(globalAvg))
      .filter(col("cust_total") > col("global_avg"))
      .select("o_custkey", "cust_total")
      .orderBy("o_custkey")
  }

  private val q24Sql =
    """SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_total
      |FROM orders
      |GROUP BY o_custkey
      |HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > (
      |  SELECT CAST(SUM(CAST(cust_total AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |  FROM (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_total
      |        FROM orders GROUP BY o_custkey) t)
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q25
  /** UNION ALL of two tagged projections, re-aggregated. */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"),
        dec(col("c_acctbal")).as("bal"))
    val su = Tables.supplier(s, dir)
      .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"),
        dec(col("s_acctbal")).as("bal"))
    c.unionAll(su)
      .groupBy("nationkey", "side")
      .agg(count(lit(1)).as("n"), sum(col("bal")).cast(DoubleType).as("sum_bal"))
      .orderBy("nationkey", "side")
  }

  private val q25Sql =
    """SELECT nationkey, side, COUNT(*) AS n, CAST(SUM(bal) AS DOUBLE) AS sum_bal
      |FROM (
      |  SELECT c_nationkey AS nationkey, 'customer' AS side, CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey, 'supplier' AS side, CAST(s_acctbal AS DECIMAL(18,2)) AS bal FROM supplier)
      |GROUP BY nationkey, side
      |ORDER BY nationkey, side""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Date-part extraction + aggregation (year/month/quarter). */
  private def q26(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mth"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("yr", "qtr", "mth")

  private val q26Sql =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
      |  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mth,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY yr, qtr, mth""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Parser-path string predicate (ref P11) + IN-list filter (P10) +
    * narrow projection: filters expressed exactly as the reference
    * wrote them — strings through the SQL expression parser. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter("o_orderstatus = 'F' and o_totalprice > 150000")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey")

  private val q27Sql =
    """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 150000
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Cross join of two tiny dimensions (explicit cartesian) with a
    * left join back to facts — the grid-report shape. */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).select("r_regionkey", "r_name")
    val prios = Tables.orders(s, dir).select(col("o_orderpriority")).distinct()
    r.crossJoin(prios)
      .select("r_name", "o_orderpriority")
      .orderBy("r_name", "o_orderpriority")
  }

  private val q28Sql =
    """SELECT r_name, o_orderpriority
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
      |ORDER BY r_name, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Per-group threshold (correlated-subquery semantics via window):
    * customers above their own nation's average balance. */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val w = Window.partitionBy(col("c_nationkey"))
    c.withColumn("nation_avg",
        sum(dec(col("c_acctbal"))).over(w).cast(DoubleType) /
          count(lit(1)).over(w).cast(DoubleType))
      .filter(col("c_acctbal") > col("nation_avg"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_above_avg"))
      .orderBy("c_nationkey")
  }

  private val q29Sql =
    """SELECT c_nationkey, COUNT(*) AS n_above_avg
      |FROM (
      |  SELECT c_nationkey, c_acctbal,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_nationkey) AS DOUBLE)
      |      / CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS DOUBLE) AS nation_avg
      |  FROM customer) t
      |WHERE c_acctbal > nation_avg
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Backward as-of join: each event picks up its user's latest
    * order-day stats (right side pre-aggregated to unique
    * (custkey, day) so the as-of is deterministic). */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
      .select("event_id", "user_id", "ts")
    val orderDays = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_day_orders"), dsum(col("o_totalprice")).as("day_total"))
    AsOfJoin.backward(events, orderDays,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        valueCols = Seq("n_day_orders", "day_total"))
      .select("event_id", "user_id", "n_day_orders", "day_total")
      .orderBy("event_id")
  }

  private val q34Sql =
    """SELECT e.event_id, e.user_id, o.n_day_orders, o.day_total
      |FROM events e
      |ASOF LEFT JOIN (
      |  SELECT o_custkey, o_orderdate, COUNT(*) AS n_day_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
      |  FROM orders GROUP BY o_custkey, o_orderdate) o
      |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q23_rollup", q23, Some(q23Sql)),
    QueryDef("q24_having_subquery", q24, Some(q24Sql)),
    QueryDef("q25_union_all", q25, Some(q25Sql)),
    QueryDef("q26_date_parts", q26, Some(q26Sql)),
    QueryDef("q27_parser_filters", q27, Some(q27Sql)),
    QueryDef("q28_cross_join", q28, Some(q28Sql)),
    QueryDef("q29_corr_threshold", q29, Some(q29Sql)),
    QueryDef("q34_asof_join", q34, Some(q34Sql)))
}
