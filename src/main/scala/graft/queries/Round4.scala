package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Round-4 battery: lakehouse/maintenance operators (CDC merge,
  * bucketed layout, source round-trips) and graph/sketch operators
  * (integer PageRank, bloom-prefiltered decontamination, exact heavy
  * hitters). Same oracle discipline as every other battery — see
  * [[QueryDef]].
  */
object Round4 {

  // ---------------------------------------------------------------- q72
  /** Benchmark decontamination with a Bloom prefilter
    * ([[graft.ops.Dedup.bloomContaminationScores]]): reference grams
    * fold into a broadcastable bit array, corpus grams that pass it
    * are re-checked exactly — same exact answer as the q62 family, but
    * the reference side never needs to broadcast as an exact set.
    * Different slice (doc_id % 40) and threshold (≥ 3) than q62, so
    * the two queries don't share an oracle. */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // bloom sized for the harness reference slice (~12k distinct grams
    // at sf0.1 → 2^17 bits ≈ 10 bits/gram, ~1% fp); the library default
    // (2^22) is sized for benchmark suites of hundreds of millions of
    // grams and would only bloat this query's plan literal
    graft.ops.Dedup.bloomContaminationScores(
        docs.filter(col("doc_id") % 40 =!= 0),
        docs.filter(col("doc_id") % 40 === 0),
        numBits = 1 << 17)
      .filter(col("n_shared_grams") >= 3)
      .orderBy("doc_id")
  }

  private val q72Sql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
      |),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(t) - 2),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM toks WHERE len(t) >= 3
      |),
      |ref AS (
      |  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 40 = 0
      |),
      |hits AS (
      |  SELECT c.doc_id, COUNT(*) AS n_shared_grams
      |  FROM (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 40 <> 0) c
      |  JOIN ref USING (gram)
      |  GROUP BY c.doc_id
      |)
      |SELECT doc_id, n_shared_grams FROM hits
      |WHERE n_shared_grams >= 3
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q73
  /** PageRank over the customer⇄supplier trade graph (an edge per
    * direction of every distinct customer-supplier pair), 5 rounds of
    * exact integer-scaled arithmetic ([[graft.ops.PageRank]]) — the
    * oracle replays every round in DuckDB with the same floor
    * divisions, so the iterative join-agg loop is hash-checked end to
    * end. Suppliers get the 1,000,000 id offset to keep the two key
    * spaces disjoint. */
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val ol = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + lit(1000000L)).as("sp"))
      .distinct()
    val edges = ol.select(col("c").as("src"), col("sp").as("dst"))
      .union(ol.select(col("sp").as("src"), col("c").as("dst")))
    graft.ops.PageRank.ranks(edges, iterations = 5).orderBy("id")
  }

  /** One CTE per PageRank round — generated, so the oracle's round
    * count can never drift from the query's. */
  private val q73Sql = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      s"""p$i AS (
         |  SELECT v.id, (150000000000 // nn.n) + (85 * COALESCE(s.c, 0)) // 100 AS r
         |  FROM v CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(p${i - 1}.r // d.od) AS BIGINT) AS c
         |    FROM p${i - 1} JOIN e ON p${i - 1}.id = e.src JOIN d ON d.src = e.src
         |    GROUP BY e.dst) s ON s.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ol AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS sp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |),
       |e AS (
       |  SELECT c AS src, sp AS dst FROM ol
       |  UNION ALL
       |  SELECT sp AS src, c AS dst FROM ol
       |),
       |v AS (SELECT DISTINCT src AS id FROM (SELECT src FROM e UNION ALL SELECT dst FROM e) u(src)),
       |d AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
       |nn AS (SELECT COUNT(*) AS n FROM v),
       |p0 AS (SELECT v.id, 1000000000000 // nn.n AS r FROM v CROSS JOIN nn),
       |$steps
       |SELECT id, CAST(r AS BIGINT) AS rank_scaled FROM p$iters
       |ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------- q74
  /** Lakehouse MERGE: apply a CDC feed derived from orders onto the
    * customer snapshot ([[graft.ops.Merge.applyCdc]]) — latest change
    * per key wins (orderdate, orderkey ordering), every 97th order is
    * a delete tombstone, every 13th targets a brand-new key (insert
    * path). The winner-per-key is a map-side-combined max(struct), not
    * a window — the feed never shuffles whole. */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val k = when(col("o_orderkey") % 13 === 0, col("o_custkey") + 1000000L)
      .otherwise(col("o_custkey"))
    val changes = o.select(
      k.as("c_custkey"),
      concat(lit("Customer#"), k.cast("string")).as("c_name"),
      (k % 25).cast("int").as("c_nationkey"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderpriority").as("c_mktsegment"),
      col("o_orderdate").as("__v"),
      col("o_orderkey").as("__tie"),
      when(col("o_orderkey") % 97 === 0, lit("D")).otherwise(lit("U")).as("op"))
    graft.ops.Merge.applyCdc(base, changes, "c_custkey", Seq("__v", "__tie"))
      .orderBy("c_custkey")
  }

  private val q74Sql =
    """WITH ch AS (
      |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS k,
      |         o_totalprice, o_orderpriority, o_orderdate, o_orderkey,
      |         CASE WHEN o_orderkey % 97 = 0 THEN 'D' ELSE 'U' END AS op
      |  FROM orders
      |),
      |w AS (
      |  SELECT k, o_totalprice, o_orderpriority, op
      |  FROM (SELECT *, ROW_NUMBER() OVER (
      |          PARTITION BY k ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM ch)
      |  WHERE rn = 1
      |)
      |SELECT
      |  COALESCE(w.k, c.c_custkey) AS c_custkey,
      |  CASE WHEN w.k IS NOT NULL THEN 'Customer#' || CAST(w.k AS VARCHAR) ELSE c.c_name END AS c_name,
      |  CASE WHEN w.k IS NOT NULL THEN CAST(w.k % 25 AS INTEGER) ELSE c.c_nationkey END AS c_nationkey,
      |  CASE WHEN w.k IS NOT NULL THEN w.o_totalprice ELSE c.c_acctbal END AS c_acctbal,
      |  CASE WHEN w.k IS NOT NULL THEN w.o_orderpriority ELSE c.c_mktsegment END AS c_mktsegment
      |FROM customer c FULL JOIN w ON c.c_custkey = w.k
      |WHERE w.op IS NULL OR w.op <> 'D'
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q75
  /** Bucketed-layout join ([[graft.ops.Bucketing]]): both sides are
    * written bucketed+sorted by the join key, so the join itself plans
    * with no shuffle exchange on either side (EngineSpec asserts the
    * plan; this query checks the answer). The write cost is the point:
    * paid once at ingest, amortized over every later key-join. */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("graft-q75").toString
    graft.ops.Bucketing.writeBucketed(
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "graft_b75_orders", "o_custkey", 16, scratch)
    graft.ops.Bucketing.writeBucketed(
      Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
      "graft_b75_customer", "c_custkey", 16, scratch)
    s.table("graft_b75_orders")
      .join(s.table("graft_b75_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  private val q75Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Exact corpus heavy hitters ([[graft.ops.HeavyHitters]]): a
    * Misra-Gries sketch pass proposes ≤ k candidates (constant-size
    * partials through the exchange), an exact recount of only those
    * candidates decides — tokens with true count ≥ 0.3% of the stream.
    * The oracle is the naive full GROUP BY, which is exactly what the
    * sketch path must reproduce. */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(graft.ops.TextStats.tokens(col("text"))).as("token"))
    graft.ops.HeavyHitters.exact(toks, "token", support = 0.003)
      .orderBy(col("cnt").desc, col("token"))
  }

  private val q76Sql =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
      |),
      |n AS (SELECT COUNT(*) AS n FROM tok)
      |SELECT token, COUNT(*) AS cnt
      |FROM tok CROSS JOIN n
      |GROUP BY token, n.n
      |HAVING COUNT(*) >= CAST(CEIL(0.003 * n.n) AS BIGINT)
      |ORDER BY cnt DESC, token""".stripMargin

  // ---------------------------------------------------------------- q77
  /** JSON source/sink round-trip: project events to a typed slice,
    * write JSON lines, read back with an explicit schema (never
    * inference at scale — one pass saved and types pinned), aggregate.
    * The oracle aggregates the original parquet directly, so the
    * round-trip must be lossless. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("graft-q77").toString
    Tables.events(s, dir).select("event_id", "user_id", "event_type")
      .write.mode("overwrite").json(scratch)
    s.read.schema("event_id LONG, user_id LONG, event_type STRING").json(scratch)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("user_id")).as("sum_users"))
      .orderBy("event_type")
  }

  private val q77Sql =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(user_id) AS BIGINT) AS sum_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q78
  /** ORC source/sink round-trip — same contract as q77 over the other
    * columnar format users migrate from. */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("graft-q78").toString
    Tables.events(s, dir).select("event_id", "user_id", "event_type")
      .write.mode("overwrite").orc(scratch)
    s.read.orc(scratch)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy("event_type")
  }

  private val q78Sql =
    """SELECT event_type, COUNT(*) AS n_events,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q79
  /** SCD type-2 history ([[graft.ops.Merge.scd2History]]) over the q74
    * change feed: every upsert becomes a versioned row with its
    * validity interval; tombstones close intervals without appearing.
    * change_id (the orderkey) rides along as the deterministic
    * tie-break and output key. */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val changes = o.select(
      col("o_custkey").as("c_custkey"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderdate").as("valid_from"),
      col("o_orderkey").as("change_id"),
      when(col("o_orderkey") % 97 === 0, lit("D")).otherwise(lit("U")).as("op"))
    graft.ops.Merge.scd2History(changes, "c_custkey",
        Seq("valid_from", "change_id"))
      .orderBy("c_custkey", "valid_from", "change_id")
  }

  private val q79Sql =
    """SELECT c_custkey, c_acctbal, valid_from, change_id, valid_to
      |FROM (
      |  SELECT o_custkey AS c_custkey, o_totalprice AS c_acctbal,
      |         o_orderdate AS valid_from, o_orderkey AS change_id,
      |         CASE WHEN o_orderkey % 97 = 0 THEN 'D' ELSE 'U' END AS op,
      |         LEAD(o_orderdate) OVER (
      |           PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey) AS valid_to
      |  FROM orders)
      |WHERE op <> 'D'
      |ORDER BY c_custkey, valid_from, change_id""".stripMargin

  // ---------------------------------------------------------------- q80
  /** Snapshot diff ([[graft.ops.Merge.snapshotDiff]]): re-derive the
    * change feed by diffing the q74 merge result against the original
    * customer snapshot — inserts, deletes and updates classified by a
    * single full-outer join; unchanged keys (the bulk of the table)
    * never reach the output. */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val before = Tables.customer(s, dir)
    val after = q74(s, dir)
    graft.ops.Merge.snapshotDiff(before, after, "c_custkey")
      .orderBy("c_custkey")
  }

  private val q80Sql = {
    val merged = q74Sql.replace("ORDER BY c_custkey", "")
    s"""WITH m AS ($merged)
       |SELECT
       |  CASE WHEN c.c_custkey IS NULL THEN 'I'
       |       WHEN m.c_custkey IS NULL THEN 'D'
       |       ELSE 'U' END AS op,
       |  COALESCE(m.c_custkey, c.c_custkey) AS c_custkey,
       |  CASE WHEN m.c_custkey IS NOT NULL THEN m.c_name ELSE c.c_name END AS c_name,
       |  CASE WHEN m.c_custkey IS NOT NULL THEN m.c_nationkey ELSE c.c_nationkey END AS c_nationkey,
       |  CASE WHEN m.c_custkey IS NOT NULL THEN m.c_acctbal ELSE c.c_acctbal END AS c_acctbal,
       |  CASE WHEN m.c_custkey IS NOT NULL THEN m.c_mktsegment ELSE c.c_mktsegment END AS c_mktsegment
       |FROM customer c FULL JOIN m ON c.c_custkey = m.c_custkey
       |WHERE c.c_custkey IS NULL OR m.c_custkey IS NULL
       |   OR m.c_name IS DISTINCT FROM c.c_name
       |   OR m.c_nationkey IS DISTINCT FROM c.c_nationkey
       |   OR m.c_acctbal IS DISTINCT FROM c.c_acctbal
       |   OR m.c_mktsegment IS DISTINCT FROM c.c_mktsegment
       |ORDER BY c_custkey""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q72_bloom_decontaminate", q72, Some(q72Sql)),
    QueryDef("q73_pagerank", q73, Some(q73Sql)),
    QueryDef("q74_merge_upsert", q74, Some(q74Sql)),
    QueryDef("q75_bucketed_join", q75, Some(q75Sql)),
    QueryDef("q76_heavy_hitters", q76, Some(q76Sql)),
    QueryDef("q77_json_roundtrip", q77, Some(q77Sql)),
    QueryDef("q78_orc_roundtrip", q78, Some(q78Sql)),
    QueryDef("q79_scd2_history", q79, Some(q79Sql)),
    QueryDef("q80_snapshot_diff", q80, Some(q80Sql)))
}
