package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Dedup

/** Round-13 battery additions: the chained append-to-index increment
  * loop (q112). All reference-scope-none LLM-pipeline extensions
  * (SURVEY §8).
  */
object Round13 {

  // ---------------------------------------------------------------- q112
  /** Chained incremental dedup via [[graft.ops.Dedup.appendToIndex]]:
    * build the corpus index once, admit batch A against it, APPEND the
    * admitted docs to the index (batch-sized hashing only — the corpus
    * is never re-indexed), then admit batch B against the grown index.
    * This is the daily-increment loop every production corpus runs:
    * per-day cost tracks batch size; the corpus is touched only
    * through the stored/cached index. Previously spec-only (the last
    * dedup component without a battery query — round-12 verdict ask
    * #2); the oracle replays BOTH admission rounds with the q87
    * recursive-CTE funnel, round B against corpus ∪ admitted(A) —
    * exactly the "chained ≡ re-indexed" equivalence the
    * appendToIndex spec asserts, lifted into CORRECTNESS. Same
    * recall-1 banding argument as q31/q84/q87. */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 10 >= 2)
    val batchA = docs.filter(col("doc_id") % 10 === 0)
    val batchB = docs.filter(col("doc_id") % 10 === 1)
    val idx = Dedup.indexCorpus(corpus)
    // materialize admitted(A) before appending — the appendToIndex
    // contract: a lazy admitted frame would re-run its whole funnel on
    // every use of the grown index
    val admittedA = Dedup.incrementalDeduplicateIndexed(
      batchA, idx, maxJaccardDist = 0.4).cache()
    admittedA.count()
    // cache the grown index's union frames, as a production chained
    // loop keeps its working index resident (DocsStream growIndex) —
    // the B funnel consumes each of the three frames from several
    // jobs (layer caches + CC rounds), and an uncached union would
    // re-evaluate its appended branch per job
    val grown0 = Dedup.appendToIndex(idx, admittedA)
    val grown = grown0.copy(
      shingles = grown0.shingles.cache(),
      bandRows = grown0.bandRows.cache(),
      texts = grown0.texts.cache())
    val admittedB = Dedup.incrementalDeduplicateIndexed(
      batchB, grown, maxJaccardDist = 0.4)
    admittedA.select(lit("A").as("batch"), col("doc_id"), col("lang"))
      .unionByName(
        admittedB.select(lit("B").as("batch"), col("doc_id"), col("lang")))
      .orderBy("batch", "doc_id")
  }

  /** One q87-style admission replay (exact layer → cross near-dup
    * layer → within-batch recursive-CTE clustering), CTE names
    * suffixed so two rounds compose in one WITH RECURSIVE. */
  private def admitRound(sfx: String, batch: String, corpus: String): String = {
    val jac = (a: String, b: String) =>
      s"""1.0 - (CAST(len(list_intersect($a.g, $b.g)) AS DOUBLE)
         |      / (CAST(len($a.g) + len($b.g) AS DOUBLE) - CAST(len(list_intersect($a.g, $b.g)) AS DOUBLE)))""".stripMargin
    s"""ex_$sfx AS (
       |  SELECT MIN(doc_id) AS doc_id FROM $batch
       |  WHERE text NOT IN (SELECT text FROM $corpus)
       |  GROUP BY text
       |),
       |kept1_$sfx AS (
       |  SELECT b.doc_id, b.lang, b.text FROM $batch b JOIN ex_$sfx e ON b.doc_id = e.doc_id
       |),
       |bgrams_$sfx AS (
       |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
       |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM kept1_$sfx)
       |  WHERE len(t) >= 3
       |),
       |cgrams_$sfx AS (
       |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
       |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM $corpus)
       |  WHERE len(t) >= 3
       |),
       |crossdrop_$sfx AS (
       |  SELECT DISTINCT a.doc_id
       |  FROM bgrams_$sfx a, cgrams_$sfx b
       |  WHERE ${jac("a", "b")} <= 0.4
       |),
       |kept2_$sfx AS (
       |  SELECT doc_id, lang, text FROM kept1_$sfx
       |  WHERE doc_id NOT IN (SELECT doc_id FROM crossdrop_$sfx)
       |),
       |k2g_$sfx AS (SELECT g.doc_id, g.g FROM bgrams_$sfx g JOIN kept2_$sfx k ON g.doc_id = k.doc_id),
       |pairs_$sfx AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM k2g_$sfx a JOIN k2g_$sfx b ON a.doc_id < b.doc_id
       |  WHERE ${jac("a", "b")} <= 0.4
       |),
       |edges_$sfx AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs_$sfx
       |  UNION ALL SELECT doc_b, doc_a FROM pairs_$sfx
       |),
       |reach_$sfx AS (
       |  SELECT DISTINCT s AS id, s AS lab FROM edges_$sfx
       |  UNION
       |  SELECT e.d AS id, r.lab FROM reach_$sfx r JOIN edges_$sfx e ON e.s = r.id
       |),
       |comp_$sfx AS (SELECT id, MIN(lab) AS cluster FROM reach_$sfx GROUP BY id),
       |adm_$sfx AS (
       |  SELECT doc_id, lang, text FROM kept2_$sfx
       |  WHERE doc_id NOT IN (SELECT id FROM comp_$sfx WHERE cluster < id)
       |)""".stripMargin
  }

  private val q112Sql =
    s"""WITH RECURSIVE
       |corpus0 AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 >= 2),
       |batch_a AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 = 0),
       |batch_b AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 = 1),
       |${admitRound("a", "batch_a", "corpus0")},
       |corpus1 AS (
       |  SELECT doc_id, lang, text FROM corpus0
       |  UNION ALL SELECT doc_id, lang, text FROM adm_a
       |),
       |${admitRound("b", "batch_b", "corpus1")}
       |SELECT 'A' AS batch, doc_id, lang FROM adm_a
       |UNION ALL
       |SELECT 'B' AS batch, doc_id, lang FROM adm_b
       |ORDER BY batch, doc_id""".stripMargin

  // ---------------------------------------------------------------- q113
  /** BPE merge TRAINING + application ([[graft.text.Bpe]]): learn 6
    * pair merges on the corpus (count-weighted, deterministic
    * (count DESC, left, right) tie-break), then re-encode every
    * document and report per-doc word/piece counts — q104 applies a
    * vocabulary; this LEARNS one, the real-tokenizer step. The oracle
    * replays each training round as one generated CTE stage (the q73
    * generated-CTE pattern): pair counts from the vocabulary frame,
    * top-1, then the left-to-right non-overlapping merge as a
    * list_reduce fold over a unit-separator-joined symbol string
    * (DuckDB's fold accumulator must match the element type, so the
    * symbol list is carried as one chr(31)-joined string). Any
    * divergence in any round's chosen pair or merge application
    * changes downstream piece counts, so the per-doc hash pins the
    * whole k-round training trajectory. */
  private def q113(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.bpeStats(Tables.documents(s, dir), k = 6)
      .orderBy("doc_id")

  private val q113Sql = {
    val U = "chr(31)"
    // One training round: pair counts → deterministic top-1 (with a
    // chr(30) sentinel row when no pairs remain, so the cross join
    // never empties — the engine's early-break equivalent: a sentinel
    // pair matches no real symbol and the fold is the identity) →
    // fold-merge into the next vocabulary stage.
    def stage(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""p$i AS (
         |  SELECT sp[i+1] AS l, sp[i+2] AS r, SUM(cnt) AS c
         |  FROM (SELECT cnt, string_split(sym, $U) AS sp FROM $prev), UNNEST(range(len(sp)-1)) AS u(i)
         |  GROUP BY 1, 2
         |),
         |b$i AS (
         |  SELECT l, r FROM p$i ORDER BY c DESC, l, r LIMIT 1
         |),
         |bs$i AS (
         |  SELECT l, r FROM b$i
         |  UNION ALL SELECT chr(30), chr(30) WHERE (SELECT COUNT(*) FROM p$i) = 0
         |),
         |w$i AS (
         |  SELECT tok, cnt,
         |    list_reduce(list_prepend('', string_split(sym, $U)),
         |      (acc, x) -> CASE
         |        WHEN acc = '' THEN x
         |        WHEN list_last(string_split(acc, $U)) = b.l AND x = b.r
         |        THEN CASE WHEN strpos(acc, $U) = 0 THEN b.l || b.r
         |             ELSE array_to_string(list_slice(string_split(acc, $U), 1, len(string_split(acc, $U))-1), $U) || $U || b.l || b.r END
         |        ELSE acc || $U || x END) AS sym
         |  FROM $prev, bs$i b
         |)""".stripMargin
    }
    val k = 6
    s"""WITH
       |w0 AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    array_to_string(list_transform(range(1, length(tok)+1), i -> substr(tok, CAST(i AS INT), 1)), $U) AS sym
       |  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents)
       |  WHERE length(tok) > 0
       |  GROUP BY tok
       |),
       |${(1 to k).map(stage).mkString(",\n")},
       |fin AS (SELECT tok, CAST(len(string_split(sym, $U)) AS BIGINT) AS np FROM w$k),
       |words AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents)
       |SELECT w.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(CASE WHEN length(w.tok) = 0 THEN 0 ELSE f.np END) AS BIGINT) AS n_pieces
       |FROM words w LEFT JOIN fin f ON w.tok = f.tok
       |GROUP BY w.doc_id
       |ORDER BY w.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q114
  /** Semantic decontamination ([[graft.ops.Similarity
    * .benchContamination]]): embeddings with vec_id % 25 = 0 play the
    * benchmark suite, the rest the training corpus; flag every corpus
    * vector whose max cosine against any benchmark vector reaches
    * 0.35 — the paraphrase-leakage net the n-gram decon family
    * (q62/q72/q89/q98) cannot catch. The corpus side round-trips
    * through the STORED IVF layout (q97's partitioned parquet), and
    * only the lists the triangle bound cannot rule out are read —
    * recall 1 by construction, so the exact all-pairs cosine SQL is a
    * true oracle (the q42 stance: the pruning machinery is under
    * test, not a recall gamble). */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val bench = emb.filter(col("vec_id") % 25 === 0)
    val corpus = emb.filter(col("vec_id") % 25 =!= 0)
    graft.ops.Similarity.benchContamination(corpus, bench, minCosine = 0.35,
        storageDir = Some(Round11.freshScratchDirShared("graft_q114_ivf")))
      .orderBy("vec_id")
  }

  private val q114Sql =
    """WITH u AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))),
      |        (acc, e) -> acc + e))) AS unit
      |  FROM embeddings
      |),
      |b AS (SELECT vec_id AS bid, unit FROM u WHERE vec_id % 25 = 0),
      |c AS (SELECT vec_id, unit FROM u WHERE vec_id % 25 <> 0),
      |sc AS (
      |  SELECT c.vec_id, b.bid,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(len(c.unit)), i ->
      |        c.unit[CAST(i+1 AS INTEGER)] * b.unit[CAST(i+1 AS INTEGER)])),
      |      (acc, e) -> acc + e) AS cosine
      |  FROM c, b
      |),
      |m AS (SELECT vec_id, MAX(cosine) AS max_cos FROM sc GROUP BY vec_id)
      |SELECT m.vec_id, MIN(sc.bid) AS bench_id, m.max_cos
      |FROM m JOIN sc ON sc.vec_id = m.vec_id AND sc.cosine = m.max_cos
      |WHERE m.max_cos >= 0.35
      |GROUP BY m.vec_id, m.max_cos
      |ORDER BY m.vec_id""".stripMargin

  // ---------------------------------------------------------------- q115
  /** Deterministic shard manifest ([[graft.ops.Sharding]]): assign
    * every document to a size-targeted shard by cumulative token
    * budget (prefix-sum boundary rule — distributable, unlike greedy
    * next-fit) and roll up the manifest a training job verifies
    * against: per-shard doc count, token sum, order-independent
    * content hash (Σ rolling fingerprints mod p), and id range. The
    * WRITER itself (partitioned parquet + manifest file) runs in
    * TrainDataBench and the spec; the battery query pins the
    * assignment + rollup arithmetic, which is everything the writer
    * computes. Oracle: plain prefix-sum window + the q19 fingerprint
    * replay. */
  private def q115(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sharding.shardManifest(
      graft.ops.Sharding.assignShards(Tables.documents(s, dir), budget = 2000L))
      .orderBy("shard_id")

  private val q115Sql =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok,
      |    CAST(list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(regexp_split_to_array(text, '\s+'),
      |          t -> CAST(ascii(t) AS BIGINT)*131 + CAST(length(t) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS doc_fp
      |  FROM documents
      |),
      |placed AS (
      |  SELECT doc_id, n_tok, doc_fp,
      |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM c
      |)
      |SELECT start // 2000 AS shard_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(doc_fp) % 1000000007 AS BIGINT) AS content_hash,
      |  MIN(doc_id) AS first_doc,
      |  MAX(doc_id) AS last_doc
      |FROM placed
      |WHERE n_tok > 0
      |GROUP BY 1
      |ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- q116
  /** Sequence packing in LEARNED-BPE units: q113's trained tokenizer
    * plugged into q82's packing as `countExpr` — the q107 composition
    * with the vocabulary-applying tokenizer swapped for the
    * merge-LEARNING one, i.e. the exact count a trained-tokenizer
    * loader would pack by. Training cost is vocabulary-sized (q113's
    * shape); the count+pack pipeline stays one codegen'd map pass
    * plus the two-phase prefix sum. Oracle: the q113 six-stage merge
    * replay feeding the q82 LATERAL range cut. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val m = graft.text.Bpe.fit(docs, k = 6)
    val pieces = element_at(graft.text.Bpe.statsCol(col("text"), m), 2)
    graft.ops.Packing.packSequences(docs, budget = 128L,
        countExpr = Some(pieces))
      .orderBy("seq_id", "doc_id")
  }

  private val q116Sql = {
    // q113's training replay (shared stage generator) …
    val trainPrefix = q113Sql.substring(0, q113Sql.indexOf(",\nfin AS"))
    s"""$trainPrefix,
       |fin AS (SELECT tok, CAST(len(string_split(sym, chr(31))) AS BIGINT) AS np FROM w6),
       |words AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents),
       |counted AS (
       |  SELECT w.doc_id,
       |    CAST(SUM(CASE WHEN length(w.tok) = 0 THEN 0 ELSE f.np END) AS BIGINT) AS n_tok
       |  FROM words w LEFT JOIN fin f ON w.tok = f.tok
       |  GROUP BY w.doc_id
       |),
       |placed AS (
       |  SELECT doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
       |  FROM counted
       |)
       |SELECT s.seq_id, doc_id,
       |  GREATEST(start, s.seq_id * 128) - start AS doc_off,
       |  GREATEST(start, s.seq_id * 128) - s.seq_id * 128 AS seq_off,
       |  LEAST(start + n_tok, (s.seq_id + 1) * 128)
       |    - GREATEST(start, s.seq_id * 128) AS len
       |FROM placed, LATERAL (
       |  SELECT unnest(range(start // 128, (start + n_tok - 1) // 128 + 1)) AS seq_id) s
       |WHERE n_tok > 0
       |ORDER BY seq_id, doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q117
  /** STORED tokenizer round trip ([[graft.text.Bpe.saveMerges]] /
    * `loadMerges`): train the q113 merges, persist them as the
    * (merge_idx, left, right) artifact, reload, and apply — the
    * production cadence where the tokenizer is trained once per
    * corpus refresh and every downstream job loads it. Same oracle
    * as q113: the storage hop must be semantically invisible (the
    * q90/q97 stance applied to the tokenizer artifact). */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val trained = graft.text.Bpe.fit(docs, k = 6)
    val mdir = Round11.freshScratchDirShared("graft_q117_bpe")
    graft.text.Bpe.saveMerges(trained, mdir, s)
    val loaded = graft.text.Bpe.loadMerges(s, mdir)
    docs.select(col("doc_id"),
        graft.text.Bpe.statsCol(col("text"), loaded).as("__s"))
      .select(col("doc_id"),
        element_at(col("__s"), 1).as("n_words"),
        element_at(col("__s"), 2).as("n_pieces"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q118
  /** Pseudo-shuffled sequence packing ([[graft.ops.Packing
    * .packShuffled]]): concatenate in (knuth-hash(id), id) order
    * before cutting — training pipelines shuffle before packing so a
    * sequence doesn't hold documents that arrived together, and the
    * Knuth permutation keeps the shuffle a replayable pure function
    * of the id set (no rand() sort). Same two-phase prefix-sum scale
    * shape as q82, just keyed on the hash; the oracle replays the
    * HUGEINT-guarded hash and the window in shuffled order. */
  private def q118(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.packShuffled(Tables.documents(s, dir), budget = 256L)
      .orderBy("seq_id", "doc_id")

  private val q118Sql =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok,
      |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      |         % 4294967296 AS BIGINT) AS hv
      |  FROM documents
      |),
      |placed AS (
      |  SELECT doc_id, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY hv, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM c
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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q112_append_index_dedup", q112, Some(q112Sql)),
    QueryDef("q113_bpe_train", q113, Some(q113Sql)),
    QueryDef("q114_semantic_decon", q114, Some(q114Sql)),
    QueryDef("q115_shard_manifest", q115, Some(q115Sql)),
    QueryDef("q116_bpe_packing", q116, Some(q116Sql)),
    QueryDef("q117_stored_bpe", q117, Some(q113Sql)),
    QueryDef("q118_shuffled_packing", q118, Some(q118Sql)))
}
