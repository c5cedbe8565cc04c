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
      |  -- \s+ split, matching TextStats.tokens (split on ANY whitespace
      |  -- run): string_split(text, ' ') would agree on single-spaced
      |  -- testdata but silently diverge on a multi-space/tab document
      |  SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
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

  // ---------------------------------------------------------------- q83
  /** No-split packing by grouped first-fit-decreasing — the
    * fragmentation-minimizing alternative to q82's concat-and-cut
    * (q82 wastes nothing but cuts documents at sequence boundaries;
    * q83 keeps every document whole and pays bounded padding). The
    * assignment is a pure function of the (doc_id, n_tok) set — global
    * (n_tok desc, doc_id) rank, exact FFD within 256-rank slices — so
    * DuckDB replays it exactly with a recursive CTE that advances all
    * slices one placement per step (recursion depth = slice size, not
    * corpus size). groupSize 256 both bounds the oracle's recursion
    * and exercises the multi-slice path on this corpus (500 docs at
    * sf0.01 → 2 slices). */
  private def q83(s: SparkSession, dir: String): DataFrame =
    Packing.packBestFit(Tables.documents(s, dir), budget = 256L, groupSize = 256)
      .orderBy("bin_id", "doc_id")

  private val q83Sql =
    """WITH RECURSIVE counted AS (
      |  SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents
      |),
      |items AS (
      |  SELECT doc_id, n_tok,
      |    row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS r
      |  FROM counted WHERE n_tok > 0 AND n_tok <= 256
      |),
      |grp AS (
      |  SELECT doc_id, n_tok, r // 256 AS g, (r % 256) + 1 AS step FROM items
      |),
      |-- one state row per slice per step: `fills` is the open-bin fill
      |-- list, the placed doc and its 0-based bin index ride along; the
      |-- first-fit position is list_filter(...)[1] (NULL = open new bin)
      |ffd AS (
      |  SELECT g, CAST(0 AS BIGINT) AS step, CAST([] AS BIGINT[]) AS fills,
      |         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_tok,
      |         CAST(NULL AS BIGINT) AS bin
      |  FROM (SELECT DISTINCT g FROM grp)
      |  UNION ALL
      |  SELECT f.g, i.step,
      |    CASE WHEN list_filter(range(1, len(f.fills)+1), j -> f.fills[j] + i.n_tok <= 256)[1] IS NULL
      |         THEN list_append(f.fills, i.n_tok)
      |         ELSE list_transform(range(1, len(f.fills)+1),
      |                j -> CASE WHEN j = list_filter(range(1, len(f.fills)+1),
      |                                  k -> f.fills[k] + i.n_tok <= 256)[1]
      |                          THEN f.fills[j] + i.n_tok ELSE f.fills[j] END)
      |    END,
      |    i.doc_id, i.n_tok,
      |    COALESCE(list_filter(range(1, len(f.fills)+1), j -> f.fills[j] + i.n_tok <= 256)[1],
      |             len(f.fills) + 1) - 1
      |  FROM ffd f JOIN grp i ON i.g = f.g AND i.step = f.step + 1
      |)
      |SELECT g * 256 + bin AS bin_id, doc_id, n_tok
      |FROM ffd WHERE step >= 1
      |ORDER BY bin_id, doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q81_salted_skew_join", q81, Some(q81Sql)),
    QueryDef("q82_sequence_packing", q82, Some(q82Sql)),
    QueryDef("q83_bestfit_packing", q83, Some(q83Sql)))
}
