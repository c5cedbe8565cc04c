package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Dedup

/** Round-11 battery additions. */
object Round11 {

  // ---------------------------------------------------------------- q89
  /** Span-level decontamination ([[graft.ops.Dedup
    * .spanContaminationScores]]): documents with doc_id % 5 = 0 play
    * the benchmark set, the rest the training corpus; for every corpus
    * doc sharing at least one 13-gram with the benchmark, report the
    * contiguous-run structure — n matched grams, n runs, longest run,
    * and the longest leaked span in tokens (run + 12). This is the
    * GPT-3-style contamination rule the document-level q62/q72 can't
    * express: a 50-token verbatim benchmark quote inside an otherwise
    * clean document. Oracle: DuckDB rebuilds positional 13-grams with
    * the established `\s+` tokenization and replays the
    * gaps-and-islands run aggregation exactly. */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val ref = docs.filter(col("doc_id") % 5 === 0)
    Dedup.spanContaminationScores(corpus, ref, shingleSize = 13)
      .orderBy("doc_id")
  }

  private val q89Sql =
    """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
      |ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
      |ct AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM corpus),
      |rt AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM ref),
      |cg AS (
      |  SELECT ct.doc_id, i AS pos, array_to_string(t[i+1:i+13], ' ') AS g
      |  FROM ct, UNNEST(range(greatest(len(t) - 12, 0))) AS u(i)
      |),
      |rg AS (
      |  SELECT DISTINCT array_to_string(t[i+1:i+13], ' ') AS g
      |  FROM rt, UNNEST(range(greatest(len(t) - 12, 0))) AS u(i)
      |),
      |m AS (SELECT DISTINCT cg.doc_id, cg.pos FROM cg JOIN rg USING (g)),
      |r AS (
      |  SELECT doc_id, pos,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM m
      |),
      |runs AS (SELECT doc_id, grp, COUNT(*) AS run_len FROM r GROUP BY doc_id, grp)
      |SELECT doc_id,
      |  CAST(SUM(run_len) AS BIGINT) AS n_matched_grams,
      |  COUNT(*) AS n_runs,
      |  CAST(MAX(run_len) AS BIGINT) AS max_run_grams,
      |  CAST(MAX(run_len) + 12 AS BIGINT) AS max_span_tokens
      |FROM runs GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q90
  /** The incremental dedup funnel against a STORED corpus index
    * ([[graft.ops.Dedup.saveIndex]]/[[graft.ops.Dedup.loadIndex]]):
    * identical admission semantics to q87, but the corpus side is
    * round-tripped through parquet with band rows bucketed by
    * (band, key) — the amortized production path, where an increment
    * READS the index instead of re-hashing the corpus, and the
    * candidate join needs no corpus-side exchange. Oracle: the q87
    * replay (the storage round-trip must be semantically invisible).
    * The save cost paid each run is the demo's, not the operator's —
    * same stance as q75's bucketed-write demonstration. */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q90_index"
    val built = Dedup.indexCorpus(corpus)
    try Dedup.saveIndex(s, built, idxDir, table = "graft_q90_band_rows")
    finally built.unpersistAll()
    val stored = Dedup.loadIndex(s, idxDir, table = "graft_q90_band_rows")
    Dedup.incrementalDeduplicateIndexed(batch, stored, maxJaccardDist = 0.4)
      .select("doc_id", "lang").orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q89_span_decontaminate", q89, Some(q89Sql)),
    QueryDef("q90_stored_index_dedup", q90, Some(Round10.q87SqlForStoredIndex)))
}
