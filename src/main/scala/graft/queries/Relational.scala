package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables

/** Relational operator battery over the harness tables.
  *
  * Covers the reference's relational surface (SURVEY.md §2.2–§2.7:
  * projection, cast, dedup, null handling, filters, limits, conditional
  * aggregation) plus the join/groupBy/window/set-op surface any engine
  * user needs. Everything is declarative DataFrame API so Catalyst gets
  * pushdown, pruning, join selection and AQE for free; `broadcast()`
  * hints are only placed on dimension tables that stay small at any
  * scale (region/nation — fixed cardinality even at 100 TB).
  */
object Relational {

  /** Exact decimal view of a money/quantity double (2dp source data). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Order-insensitive exact sum of a 2dp double, surfaced as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  private val one = lit(1).cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: scan + filter + hash agg with
    * map-side partial aggregation; ~6 output groups so the shuffle is
    * tiny at any scale. Ref analog: A1/A2 (SURVEY §2.4). */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1)).cast(DoubleType)).as("avg_qty"),
        (dsum(col("l_discount")) / count(lit(1)).cast(DoubleType)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Selective filter + narrow projection: predicate and column pruning
    * must reach the parquet scan (PushedFilters / 5-col ReadSchema).
    * Ref analog: P1/P5/P11 projections + filters (SURVEY §2.2). */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast(TimestampType) &&
        col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Fact-fact shuffle join (lineitem ⨝ orders on orderkey) then a
    * dimension join; AQE picks broadcast for customer when it fits, at
    * 100 TB it degrades gracefully to shuffle join on custkey. */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q03Sql =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Dimension join + agg by brand. part is 1:~4 with lineitem so at
    * bench scale AQE broadcasts it; the code stays hint-free so a real
    * cluster can fall back to shuffle join when part outgrows memory. */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  private val q04Sql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q05
  /** 5-way star join. region/nation have fixed tiny cardinality at any
    * scale → explicit broadcast; fact joins shuffle on their keys. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  private val q05Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Window function: top-3 orders per customer by price. Single
    * shuffle on the partition key; rank pushdown (WindowGroupLimit)
    * keeps state bounded per key at scale. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }

  private val q06Sql =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Set ops: nations present in both customer and supplier bases
    * (INTERSECT) — distinct-based, shuffles only the key column. */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.intersect(su).orderBy("nationkey")
  }

  private val q07Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Set ops: orders that never shipped a line item (EXCEPT — distinct
    * on each side then hash anti; only the key column shuffles). */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(s, dir).select(col("o_orderkey").as("orderkey"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey").as("orderkey"))
    o.except(li).orderBy("orderkey")
  }

  private val q08Sql =
    """SELECT o_orderkey AS orderkey FROM orders
      |EXCEPT
      |SELECT l_orderkey AS orderkey FROM lineitem
      |ORDER BY orderkey""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Left-semi join (EXISTS): customers that placed at least one order,
    * counted per market segment. Semi join ships only the key side. */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_with_orders"))
      .orderBy("c_mktsegment")
  }

  private val q09Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_with_orders
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Left-anti join (NOT EXISTS): open orders with no line items yet,
    * counted per priority. */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_empty_orders"))
      .orderBy("o_orderpriority")
  }

  private val q10Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_empty_orders
      |FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Conditional aggregation over events (ref analog: A2/P12 per-column
    * null/sentinel probes — count(when ...) expressions in one pass). */
  private def q11(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("value") > 100, lit(1))).as("n_high_value"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  private val q11Sql =
    """SELECT event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(CASE WHEN value > 100 THEN 1 END) AS n_high_value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Event-time bucketing: hourly tumbling aggregation over the events
    * table — the batch twin of the streaming windowed agg. */
  private def q12(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  private val q12Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q13
  /** String/JSON extraction (ref analog: F1 from_json): pull the "k"
    * field out of the JSON props column with a regex (codegen'd, no
    * UDF) and aggregate by bucket. */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(IntegerType))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy("k_bucket")
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy("k_bucket")

  private val q13Sql =
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) % 10 AS k_bucket,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Exact distinct counting per group (shuffle-heavy op done right:
    * partial aggregation before exchange). */
  private def q14(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  private val q14Sql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_filter_project", q02, Some(q02Sql)),
    QueryDef("q03_top_customers", q03, Some(q03Sql)),
    QueryDef("q04_brand_volume", q04, Some(q04Sql)),
    QueryDef("q05_regional_revenue", q05, Some(q05Sql)),
    QueryDef("q06_order_rank", q06, Some(q06Sql)),
    QueryDef("q07_setop_intersect", q07, Some(q07Sql)),
    QueryDef("q08_setop_except", q08, Some(q08Sql)),
    QueryDef("q09_semi_join", q09, Some(q09Sql)),
    QueryDef("q10_anti_join", q10, Some(q10Sql)),
    QueryDef("q11_conditional_agg", q11, Some(q11Sql)),
    QueryDef("q12_hourly_events", q12, Some(q12Sql)),
    QueryDef("q13_json_extract", q13, Some(q13Sql)),
    QueryDef("q14_distinct_agg", q14, Some(q14Sql)))
}
