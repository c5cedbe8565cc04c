package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Packing, SkewJoin}

/** Round-8 battery additions. */
object Round8 {

  // ---------------------------------------------------------------- q81
  /** Salted skew join over a deliberately pathological key: 90% of
    * lineitem rows collapse onto hot key 0 — the shape where a plain
    * hash join sends one key's entire row set to a single task and AQE
    * cannot split it further once it exceeds an executor (the scenario
    * [[graft.ops.SkewJoin]] exists for). The salted join's output is
    * row-identical to the unsalted equi-join by construction, so the
    * plain SQL join IS the oracle; the salt-spread property (max
    * per-sub-key input drops ~numSalts×) is asserted in EngineSpec. */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val skewed = Tables.lineitem(s, dir).select(
      when(col("l_orderkey") % 10 < 9, lit(0L))
        .otherwise(col("l_orderkey") % 50 + 1).as("k"),
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val dim = s.range(0, 51).select(
      col("id").as("dk"), (col("id") * 7 % 13).as("dim_val"))
    SkewJoin.saltedInnerJoin(skewed, dim, "k", "dk",
        numSalts = 8, saltSource = Seq("l_orderkey", "l_linenumber"))
      .select("k", "l_orderkey", "l_linenumber", "l_quantity", "dim_val")
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q81Sql =
    """WITH skewed AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
      |              ELSE l_orderkey % 50 + 1 END AS k,
      |         l_orderkey, l_linenumber, l_quantity
      |  FROM lineitem
      |),
      |dim AS (SELECT range AS dk, (range * 7) % 13 AS dim_val FROM range(0, 51))
      |SELECT k, l_orderkey, l_linenumber, l_quantity, dim_val
      |FROM skewed JOIN dim ON skewed.k = dim.dk
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Sequence packing (concat-and-cut): the corpus token stream in
    * doc-id order, cut every 256 tokens into training sequences; the
    * emitted doc→sequence span map is fully deterministic (a pure
    * function of ids and token counts), so DuckDB replays it exactly
    * with a window cumsum. The Spark side computes the global prefix
    * sum in two distributed phases — see [[graft.ops.Packing]] — so no
    * single-partition window ever sees corpus-sized data. */
  private def q82(s: SparkSession, dir: String): DataFrame =
    Packing.packSequences(Tables.documents(s, dir), budget = 256L)
      .orderBy("seq_id", "doc_id")

  private val q82Sql =
    """WITH counted AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents
      |),
      |placed AS (
      |  -- SUM over BIGINT widens to HUGEINT in DuckDB; cast back so
      |  -- range() accepts it and the output schema stays BIGINT
      |  SELECT doc_id, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM counted
      |)
      |SELECT s.seq_id, doc_id,
      |  GREATEST(start, s.seq_id * 256) - start AS doc_off,
      |  GREATEST(start, s.seq_id * 256) - s.seq_id * 256 AS seq_off,
      |  LEAST(start + n_tok, (s.seq_id + 1) * 256)
      |    - GREATEST(start, s.seq_id * 256) AS len
      |FROM placed, LATERAL (
      |  SELECT unnest(range(start // 256, (start + n_tok - 1) // 256 + 1)) AS seq_id) s
      |WHERE n_tok > 0
      |ORDER BY seq_id, doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q81_salted_skew_join", q81, Some(q81Sql)),
    QueryDef("q82_sequence_packing", q82, Some(q82Sql)))
}
