package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{KCore, PageRank, TextStats}

/** Round-14 battery additions, part 3: seeded graph proximity
  * (personalized PageRank), bigram-conditional fluency scoring, and
  * k-core density peeling. All reference-scope-none LLM-pipeline /
  * graph-infrastructure extensions (SURVEY §8).
  */
object Round14c {

  /** The q73 customer⇄supplier trade graph (an edge per direction of
    * every distinct pair; suppliers offset by 1e6 to keep key spaces
    * disjoint) — shared by q163 and q165. */
  private def tradePairs(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + lit(1000000L)).as("sp"))
      .distinct()
  }

  private val tradePairsSql =
    """ol AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS sp
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |)""".stripMargin

  // ---------------------------------------------------------------- q163
  /** PERSONALIZED PageRank ([[graft.ops.PageRank.personalizedRanks]]):
    * teleport mass restricted to a trusted customer cohort
    * (custkey ≡ 1 mod 97), 5 rounds of exact integer-scaled
    * arithmetic over the trade graph — rank becomes proximity to the
    * seeds, the retrieval-expansion / contamination-neighborhood
    * primitive. The oracle replays every round as a generated CTE
    * with the same floor divisions (the q73 pattern), seed mass
    * included. */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    val ol = tradePairs(s, dir)
    val edges = ol.select(col("c").as("src"), col("sp").as("dst"))
      .union(ol.select(col("sp").as("src"), col("c").as("dst")))
    val seeds = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("id"))
      .filter(col("id") % 97 === 1)
    PageRank.personalizedRanks(edges, seeds, iterations = 5).orderBy("id")
  }

  /** One CTE per round — generated, so the oracle's round count can
    * never drift from the query's. */
  private val q163Sql = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      s"""p$i AS (
         |  SELECT v.id,
         |    (CASE WHEN sd.id IS NOT NULL THEN 150000000000 // ns.n ELSE 0 END)
         |      + (85 * COALESCE(s.c, 0)) // 100 AS r
         |  FROM v CROSS JOIN ns LEFT JOIN sd ON sd.id = v.id LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(p${i - 1}.r // d.od) AS BIGINT) AS c
         |    FROM p${i - 1} JOIN e ON p${i - 1}.id = e.src JOIN d ON d.src = e.src
         |    GROUP BY e.dst) s ON s.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradePairsSql,
       |e AS (
       |  SELECT c AS src, sp AS dst FROM ol
       |  UNION ALL
       |  SELECT sp AS src, c AS dst FROM ol
       |),
       |v AS (SELECT DISTINCT src AS id FROM (SELECT src FROM e UNION ALL SELECT dst FROM e) u(src)),
       |d AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
       |sd AS (SELECT id FROM v WHERE id < 1000000 AND id % 97 = 1),
       |ns AS (SELECT COUNT(*) AS n FROM sd),
       |p0 AS (
       |  SELECT v.id,
       |    CASE WHEN sd.id IS NOT NULL THEN 1000000000000 // ns.n ELSE 0 END AS r
       |  FROM v CROSS JOIN ns LEFT JOIN sd ON sd.id = v.id),
       |$steps
       |SELECT id, CAST(r AS BIGINT) AS rank_scaled FROM p$iters
       |ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------- q164
  /** BIGRAM conditional surprisal ([[graft.ops.TextStats
    * .bigramSurprisal]]): per-document fluency under the corpus
    * transition counts — `floor(log2(n(w1·) div n(w1,w2)))` per
    * adjacent pair, bit-trick log2, zero floating point. The closest
    * an exact integer pipeline gets to an LM perplexity gate. */
  private def q164(s: SparkSession, dir: String): DataFrame =
    TextStats.bigramSurprisal(Tables.documents(s, dir)).orderBy("doc_id")

  private val q164Sql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |pr AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
      |    i -> struct_pack(w1 := tk[CAST(i AS INT)],
      |                     w2 := tk[CAST(i AS INT) + 1]))) AS p
      |  FROM t WHERE len(tk) >= 2
      |),
      |pd AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2,
      |         CAST(COUNT(*) AS BIGINT) AS m
      |       FROM pr GROUP BY 1, 2, 3),
      |pc AS (SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS np FROM pd GROUP BY 1, 2),
      |lc AS (SELECT w1, CAST(SUM(np) AS BIGINT) AS nl FROM pc GROUP BY 1)
      |SELECT pd.doc_id,
      |  CAST(SUM(m) AS BIGINT) AS n_pairs,
      |  CAST(SUM(m * (length(bin(lc.nl // pc.np)) - 1)) AS BIGINT) AS surprisal_sum,
      |  (CAST(SUM(m * (length(bin(lc.nl // pc.np)) - 1)) AS BIGINT) * 100)
      |    // CAST(SUM(m) AS BIGINT) AS surprisal_per_100
      |FROM pd JOIN pc USING (w1, w2) JOIN lc USING (w1)
      |GROUP BY pd.doc_id
      |ORDER BY pd.doc_id""".stripMargin

  // ---------------------------------------------------------------- q165
  /** k-CORE peeling ([[graft.ops.KCore.kCore]]): the k = 25 core of
    * the trade graph after 4 fixed peel rounds (converged — round 1
    * already stabilizes this graph; the cascade path is spec-covered
    * on hand graphs). Surviving nodes with their in-core degree: the
    * dense trading backbone that survives any single-counterparty
    * removal. */
  private def q165(s: SparkSession, dir: String): DataFrame = {
    val edges = tradePairs(s, dir)
    KCore.kCore(edges, k = 25, rounds = 4, aCol = "c", bCol = "sp")
      .orderBy("node")
  }

  private val q165Sql = {
    val rounds = 4
    val steps = (1 to rounds).map { i =>
      s"""a$i AS (
         |  SELECT n FROM (
         |    SELECT n, COUNT(*) AS dg FROM (
         |      SELECT lo AS n FROM e${i - 1}
         |      UNION ALL SELECT hi AS n FROM e${i - 1}
         |    ) GROUP BY n
         |  ) WHERE dg >= 25),
         |e$i AS (
         |  SELECT lo, hi FROM e${i - 1}
         |  WHERE lo IN (SELECT n FROM a$i) AND hi IN (SELECT n FROM a$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradePairsSql,
       |e0 AS (SELECT least(c, sp) AS lo, greatest(c, sp) AS hi FROM ol),
       |$steps
       |SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
       |  SELECT lo AS node FROM e$rounds
       |  UNION ALL SELECT hi AS node FROM e$rounds
       |)
       |GROUP BY node
       |ORDER BY node""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q163_personalized_pagerank", q163, Some(q163Sql)),
    QueryDef("q164_bigram_surprisal", q164, Some(q164Sql)),
    QueryDef("q165_kcore", q165, Some(q165Sql)))
}
