package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables

/** Third relational batch: pivot, generators (explode/UNNEST),
  * analytic window functions, string functions, null-handling
  * conditionals. Same parity rules as [[Relational]].
  */
object Relational3 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def dsum(c: org.apache.spark.sql.Column) = sum(dec(c)).cast(DoubleType)

  // ---------------------------------------------------------------- q36
  /** Pivot (wide conditional aggregation — one pass, no extra
    * shuffle vs the groupBy). */
  private def q36(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .orderBy("l_returnflag")

  private val q36Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Generator surface: explode the token array (1 row → n rows), then
    * re-aggregate — the UNNEST/flatten shape. */
  private def q37(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .filter(length(col("token")) > 3)
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occurrences") > 50)
      .orderBy("token")

  private val q37Sql =
    """SELECT t.token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
      |FROM documents, UNNEST(regexp_split_to_array(text, '\s+')) AS t(token)
      |WHERE length(t.token) > 3
      |GROUP BY t.token
      |HAVING COUNT(*) > 50
      |ORDER BY t.token""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Array functions: sort, slice, joined rendering (deterministic
    * per-row array manipulation). */
  private def q38(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat_ws("|", slice(array_sort(split(col("text"), "\\s+")), 1, 5))
          .as("first5_sorted"),
        size(array_distinct(split(col("text"), "\\s+"))).cast(LongType)
          .as("n_distinct_tokens"))
      .orderBy("doc_id")

  private val q38Sql =
    """SELECT doc_id,
      |  array_to_string(list_sort(regexp_split_to_array(text, '\s+'))[1:5], '|') AS first5_sorted,
      |  CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS n_distinct_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** String function battery over part names. */
  private def q39(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 12).as("name_prefix"),
        lpad(col("p_size").cast(StringType), 4, "0").as("size_padded"),
        length(replace(col("p_name"), lit(" "), lit(""))).as("name_len_nospace"),
        levenshtein(col("p_brand"), substring(col("p_type"), 1, 8)).as("brand_type_dist"))
      .orderBy("p_partkey")

  private val q39Sql =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_upper,
      |  substring(p_name, 1, 12) AS name_prefix,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      |  length(replace(p_name, ' ', '')) AS name_len_nospace,
      |  levenshtein(p_brand, substring(p_type, 1, 8)) AS brand_type_dist
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Analytic window battery: lag/lead deltas, quartiles and
    * percent_rank per customer order history. */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q40Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  o_totalprice - LAG(o_totalprice, 1) OVER w AS delta_prev,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Null-handling conditionals: nullif/coalesce/nvl2-style CASE over
    * exact decimal values. */
  private def q41(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(nullif(dec(col("l_discount")), dec(lit(0.0))), dec(lit(-1.0)))
          .cast(DoubleType).as("discount_or_sentinel"),
        when(col("l_tax") > 0.05, lit("high"))
          .when(col("l_tax") > 0.02, lit("mid"))
          .otherwise(lit("low")).as("tax_band"))
      .orderBy("l_orderkey", "l_linenumber")

  private val q41Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(COALESCE(NULLIF(CAST(l_discount AS DECIMAL(18,2)), CAST(0.0 AS DECIMAL(18,2))), CAST(-1.0 AS DECIMAL(18,2))) AS DOUBLE) AS discount_or_sentinel,
      |  CASE WHEN l_tax > 0.05 THEN 'high' WHEN l_tax > 0.02 THEN 'mid' ELSE 'low' END AS tax_band
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q46
  /** CUBE over two dimensions (all grouping sets in one Expand pass). */
  private def q46(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  private val q46Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Higher-order-function battery: filter/exists/forall/aggregate
    * lambdas over token arrays plus regexp_extract_all — all
    * whole-stage-codegen'd, no UDFs. */
  private def q47(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      // deliberate literal single-space split (NOT TextStats.tokens):
      // this query exercises the HOF surface, and its oracle pairs
      // with string_split(text, ' ') — both sides agree on any input
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(filter(col("toks"), t => length(t) > 5)).cast(LongType).as("n_long_tokens"),
        exists(col("toks"), t => t === "the").as("has_the"),
        forall(col("toks"), t => length(t) < 20).as("all_short"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t).cast(LongType))
          .as("sum_token_len"),
        size(regexp_extract_all(concat_ws(" ", col("toks")), lit("[a-z]+a[a-z]*"), lit(0)))
          .cast(LongType).as("n_with_a"))
      .orderBy("doc_id")

  private val q47Sql =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT) AS n_long_tokens,
      |  len(list_filter(string_split(text, ' '), t -> t = 'the')) > 0 AS has_the,
      |  len(list_filter(string_split(text, ' '), t -> length(t) >= 20)) = 0 AS all_short,
      |  CAST(list_sum(list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT))) AS BIGINT) AS sum_token_len,
      |  CAST(len(regexp_extract_all(text, '[a-z]+a[a-z]*', 0)) AS BIGINT) AS n_with_a
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q52
  /** RANGE-frame window: rolling 30-day order totals per customer —
    * the frame is value-bounded (event time), not row-bounded, so ties
    * and gaps behave identically in both engines. */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType).as("rolling_30d_total"),
        count(lit(1)).over(w).as("rolling_30d_orders"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val q52Sql =
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_30d_total,
      |  COUNT(*) OVER w AS rolling_30d_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Exact percentiles (linear interpolation): quantities are whole
    * numbers so interpolated medians are exact halves — safely
    * comparable across engines. */
  private def q53(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  private val q53Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q56
  /** Per-group z-score outlier detection — numeric cleaning for
    * training data. Mean/variance come from exact decimal sums
    * (x and x² at 2/4 dp are exact), so the derived doubles — and the
    * |z| > 3 boundary decisions — are identical in both engines. */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val stats = li.groupBy("l_returnflag").agg(
      dsum(col("l_extendedprice")).as("s1"),
      sum(col("l_extendedprice").cast(DecimalType(28, 4)) *
        col("l_extendedprice").cast(DecimalType(28, 4)))
        .cast(DoubleType).as("s2"),
      count(lit(1)).cast(DoubleType).as("n"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("sd", sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)))
    li.join(broadcast(stats), "l_returnflag")
      .withColumn("z", (col("l_extendedprice") - col("mean")) / col("sd"))
      .filter(abs(col("z")) > lit(1.7))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q56Sql =
    """WITH stats AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS s2,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_orderkey, l_linenumber, l.l_returnflag, l_extendedprice
      |FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
      |WHERE abs((l_extendedprice - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 1.7
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Time-series resample + gap fill: per-user hourly grid with
    * zero-activity rows and forward-filled value sums. */
  private def q57(s: SparkSession, dir: String): DataFrame =
    graft.ops.TimeSeries.resampleHourly(Tables.events(s, dir))
      .orderBy("user_id", "hour")

  private val q57Sql =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n_active,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
      |  FROM events),
      |grid AS (
      |  SELECT u.user_id, g.h
      |  FROM (SELECT DISTINCT user_id FROM events) u, bounds b,
      |    UNNEST(generate_series(b.mn, b.mx, INTERVAL 1 HOUR)) AS g(h))
      |SELECT g.user_id, g.h AS hour,
      |  COALESCE(n_active, 0) AS n_events,
      |  last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_value_sum
      |FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h
      |ORDER BY g.user_id, hour""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Histogram bucketing with width_bucket: order-value distribution
    * in 20 equal bins (integer bucket ids — exact both engines). */
  private def q58(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(20))
        .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("bucket")

  // DuckDB 1.0 has no width_bucket; same semantics spelled out with the
  // clamps width_bucket applies (values ≥ max → bucket 21, < min → 0)
  // mirrored explicitly, so the equivalence is structural rather than
  // an accident of the current data staying inside [0, 630000)
  private val q58Sql =
    """SELECT CAST(LEAST(GREATEST(floor(o_totalprice / 30000.0) + 1, 0), 21) AS BIGINT) AS bucket,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Batch sessionization (30-minute inactivity gap): per-session
    * event counts and exact value sums, keyed by second-truncated
    * session start (whole-second gap math so nanosecond-vs-microsecond
    * precision cannot flip a boundary). */
  private def q59(s: SparkSession, dir: String): DataFrame =
    graft.ops.TimeSeries.sessionize(Tables.events(s, dir), gapMinutes = 30)
      .orderBy("user_id", "session_start")

  private val q59Sql =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
      |      THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, date_trunc('second', min(ts)) AS session_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Range join (point-in-interval): per order, how many lineitems —
    * ANY order's — shipped inside the week after its order date. The
    * range predicate runs as a bucketized equi-join
    * ([[graft.ops.RangeJoin]]); a naive inequality join would plan as
    * BroadcastNestedLoopJoin. Oracle: DuckDB evaluates the inequality
    * join directly. */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val week = 7L
    // Pure DATE arithmetic (days since epoch): epoch-second math via a
    // timestamp cast would shift under a DST session timezone and
    // diverge from the oracle's date interval; all values here are
    // midnight-aligned, so day granularity is exact
    val orderS = unix_date(col("o_orderdate").cast("date"))
    val intervals = Tables.orders(s, dir).select(
      col("o_orderkey"),
      orderS.cast("long").as("w_start"),
      (orderS + week).cast("long").as("w_end"))
    // THE range-join scale move: collapse points to (value, weight)
    // BEFORE the join. Ship dates repeat ~250:1 at sf0.1, so the join
    // emits |distinct values in window| rows per interval instead of
    // |lineitems in window| — measured 43s → ~2s at sf0.1, and the
    // ratio only improves as the fact table grows against a bounded
    // time domain.
    val points = Tables.lineitem(s, dir)
      .select(unix_date(col("l_shipdate").cast("date")).cast("long").as("ship_s"))
      .groupBy("ship_s").agg(count(lit(1)).as("n_ship"))
    graft.ops.RangeJoin.pointInInterval(points, intervals,
      "ship_s", "w_start", "w_end", bucketWidth = week)
      .groupBy("o_orderkey").agg(sum(col("n_ship")).as("n_shipped"))
      .orderBy("o_orderkey")
  }

  private val q60Sql =
    """SELECT o.o_orderkey, COUNT(*) AS n_shipped
      |FROM orders o JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
      |GROUP BY 1
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Interval-overlap join: same-customer order pairs whose first-week
    * windows overlap — bucketized with the customer key inside the
    * equi-join and the max(start)-bucket trick instead of a distinct
    * pass ([[graft.ops.RangeJoin.intervalOverlap]]). */
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val week = 7L
    // day-granularity arithmetic for the same TZ-invariance as q60
    val oS = unix_date(col("o_orderdate").cast("date"))
    def side(suffix: String): DataFrame = Tables.orders(s, dir).select(
      col("o_custkey").as(s"cust_$suffix"), col("o_orderkey").as(s"key_$suffix"),
      oS.cast("long").as(s"s_$suffix"), (oS + week).cast("long").as(s"e_$suffix"))
    graft.ops.RangeJoin.intervalOverlap(side("a"), side("b"),
        "s_a", "e_a", "s_b", "e_b", bucketWidth = week,
        extraKeys = Seq(("cust_a", "cust_b")))
      .filter(col("key_a") < col("key_b"))
      .select(col("cust_a").as("o_custkey"), col("key_a"), col("key_b"))
      .orderBy("o_custkey", "key_a", "key_b")
  }

  private val q61Sql =
    """SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      | AND a.o_orderdate < b.o_orderdate + INTERVAL 7 DAY
      | AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
      |ORDER BY a.o_custkey, key_a, key_b""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Z-order (Morton) interleave of (l_partkey, l_suppkey): the
    * multi-column data-layout key — range-partition/sort by `z` before
    * a lake write and per-file min/max statistics prune scans on
    * EITHER key column ([[graft.ops.ZOrderExpr]]; locality property
    * spec-verified). Pure integer bit arithmetic, so DuckDB replays
    * the interleave exactly, bit by bit. */
  private def q70(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.ZOrderExpr.zorder(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy("l_orderkey", "l_linenumber")

  private val q70Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(list_sum(list_transform(range(0, 32), i ->
      |    (((l_partkey >> i) & 1) << (2*i)) + (((l_suppkey >> i) & 1) << (2*i + 1))
      |  )) AS BIGINT) AS z
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q70_zorder_layout", q70, Some(q70Sql)),
    QueryDef("q61_interval_overlap", q61, Some(q61Sql)),
    QueryDef("q60_range_join", q60, Some(q60Sql)),
    QueryDef("q59_sessionize", q59, Some(q59Sql)),
    QueryDef("q58_histogram", q58, Some(q58Sql)),
    QueryDef("q57_gap_fill", q57, Some(q57Sql)),
    QueryDef("q56_outliers", q56, Some(q56Sql)),
    QueryDef("q52_range_frame", q52, Some(q52Sql)),
    QueryDef("q53_percentiles", q53, Some(q53Sql)),
    QueryDef("q46_cube", q46, Some(q46Sql)),
    QueryDef("q47_hof_battery", q47, Some(q47Sql)),
    QueryDef("q36_pivot", q36, Some(q36Sql)),
    QueryDef("q37_explode_tokens", q37, Some(q37Sql)),
    QueryDef("q38_array_funcs", q38, Some(q38Sql)),
    QueryDef("q39_string_funcs", q39, Some(q39Sql)),
    QueryDef("q40_window_analytics", q40, Some(q40Sql)),
    QueryDef("q41_null_handling", q41, Some(q41Sql)))
}
