package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{CoOccurrence, Dedup, Hll, Ranks, Similarity, SparseSim, Winnowing}
import graft.ops.{Classifier, TextStats}

/** Round-15 battery additions (q166–q181): winnowing fingerprints
  * (MOSS), contrastive hard-negative mining, the materialized bigram
  * LM head, reciprocal-rank-fusion quality ensembling, exact
  * edit-distance near-dup pairs, sparse inverted-index TF-IDF
  * similarity, skip-gram co-occurrence, the replayable HLL and
  * histogram-quantile audits, trigram stupid-backoff surprisal, the
  * packing fill audit, the Gopher repetition gate, the Zipf frequency
  * spectrum, vocab coverage at large sizes, label-propagation
  * communities over the winnow graph, and content-defined chunking.
  * All reference-scope-none LLM-pipeline extensions (SURVEY §8).
  */
object Round15 {

  /** DuckDB twin of [[graft.ops.Classifier.tokenHash]] as a scalar
    * over an identifier `t` bound in scope (shared with Round16's
    * chunk-consuming oracles). */
  private[queries] def tokHashSql(t: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length($t) + 1),
       |        c -> CAST(unicode(substr($t, CAST(c AS INT), 1)) AS BIGINT))),
       |      (acc, ch) -> (acc * 131 + ch) % 1000000007)""".stripMargin

  // ---------------------------------------------------------------- q166
  /** WINNOWING fingerprint overlap ([[graft.ops.Winnowing]]): MOSS
    * k=3-gram hashes, window w=4 rightmost-minimum selection, pairs
    * sharing ≥ 2 selected fingerprints with containment-style ppm vs
    * the smaller sketch. The oracle replays the token-hash fold, the
    * gram combine, the packed-key window minimum, and the df cap
    * bit-for-bit. */
  private def q166(s: SparkSession, dir: String): DataFrame =
    Winnowing.overlapPairs(Tables.documents(s, dir),
      k = 3, w = 4, minShared = 2L, maxDf = 64L)

  /** q166's winnowing pair CTEs (k=3, w=4, minShared=2, maxDf=64),
    * parameterized over the source relation and a CTE-name prefix so
    * q201 can replay the same fingerprint fold over the
    * exact-survivor frame. Ends in `<pre>p(doc_a, doc_b, n_shared)`
    * and `<pre>cnts(doc_id, n_fps)`. */
  private[queries] def winnowPairCtes(src: String, pre: String): String = {
    val gram = // hash of the k=3 gram starting at 0-based pos i
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(0, 3), j ->
         |        ${tokHashSql("tk[CAST(i + j + 1 AS INT)]")})),
         |      (acc, h) -> (acc * 10007 + h) % 1000000007)""".stripMargin
    s"""${pre}t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
       |    x -> length(x) > 0) AS tk
       |  FROM $src
       |),
       |${pre}g AS (
       |  SELECT doc_id, len(tk) - 3 AS maxpos, CAST(i AS BIGINT) AS pos,
       |    $gram AS gh
       |  FROM ${pre}t, UNNEST(range(0, len(tk) - 2)) AS u(i)
       |  WHERE len(tk) >= 3
       |),
       |${pre}sel AS (
       |  SELECT doc_id, pos, maxpos,
       |    MIN(gh * 16777216 + (16777215 - pos)) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS skey
       |  FROM ${pre}g
       |),
       |${pre}fps AS (
       |  SELECT DISTINCT doc_id, skey // 16777216 AS fp
       |  FROM ${pre}sel WHERE pos <= greatest(maxpos - 3, 0)
       |),
       |${pre}cnts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps
       |         FROM ${pre}fps GROUP BY doc_id),
       |${pre}rare AS (SELECT fp FROM ${pre}fps GROUP BY fp HAVING COUNT(*) <= 64),
       |${pre}jf AS (SELECT f.doc_id, f.fp
       |        FROM ${pre}fps f JOIN ${pre}rare r ON f.fp = r.fp),
       |${pre}p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM ${pre}jf a JOIN ${pre}jf b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
       |)""".stripMargin
  }

  private val q166Sql =
    s"""WITH ${winnowPairCtes("documents", "")}
       |SELECT p.doc_a, p.doc_b, p.n_shared,
       |  ca.n_fps AS n_a, cb.n_fps AS n_b,
       |  CAST((p.n_shared * 1000000) // least(ca.n_fps, cb.n_fps) AS BIGINT)
       |    AS overlap_ppm
       |FROM p JOIN cnts ca ON ca.doc_id = p.doc_a
       |       JOIN cnts cb ON cb.doc_id = p.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q167
  /** HARD-NEGATIVE mining ([[graft.ops.Similarity.hardNegatives]]):
    * each vector's 5 nearest different-label neighbors by exact
    * integer quantized distance — the contrastive-training
    * counterpart of q22's same-label nearest neighbor. Heap-ranked
    * (TopKAgg); the oracle is the window spelling over the full
    * cross-label pair set. */
  private def q167(s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables.embeddings(s, dir), k = 5)

  private val q167Sql =
    """WITH q AS (
      |  SELECT vec_id, label, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
      |  FROM embeddings
      |),
      |p AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS cand,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(len(a.qv)), i ->
      |        (a.qv[CAST(i + 1 AS INT)] - b.qv[CAST(i + 1 AS INT)])
      |        * (a.qv[CAST(i + 1 AS INT)] - b.qv[CAST(i + 1 AS INT)]))),
      |      (acc, x) -> acc + x) AS BIGINT) AS d2
      |  FROM q a JOIN q b ON a.label <> b.label
      |),
      |r AS (
      |  SELECT qid, cand, d2,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cand) AS rk
      |  FROM p
      |)
      |SELECT qid AS vec_id, CAST(rk AS BIGINT) AS rank,
      |  cand AS neg_id, d2 AS dist2
      |FROM r WHERE rk <= 5
      |ORDER BY vec_id, rank""".stripMargin

  // ---------------------------------------------------------------- q168
  /** NEXT-TOKEN table ([[graft.ops.CoOccurrence.nextTokenTopK]]): the
    * top-3 successors of every prefix token seen ≥ 20 times, with the
    * exact integer conditional probability in ppm — the materialized
    * bigram LM head that q164's fluency scoring reads implicitly. */
  private def q168(s: SparkSession, dir: String): DataFrame =
    CoOccurrence.nextTokenTopK(Tables.documents(s, dir),
      k = 3, minPrefix = 20L)

  private val q168Sql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |pr AS (
      |  SELECT unnest(list_transform(range(1, len(tk)),
      |    i -> struct_pack(w1 := tk[CAST(i AS INT)],
      |                     w2 := tk[CAST(i AS INT) + 1]))) AS p
      |  FROM t WHERE len(tk) >= 2
      |),
      |pc AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n_pair
      |       FROM pr GROUP BY 1, 2),
      |pref AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_prefix
      |         FROM pc GROUP BY 1 HAVING SUM(n_pair) >= 20),
      |r AS (
      |  SELECT pc.w1, pc.w2, pc.n_pair, pref.n_prefix,
      |    ROW_NUMBER() OVER (PARTITION BY pc.w1
      |      ORDER BY pc.n_pair DESC, pc.w2) AS rk
      |  FROM pc JOIN pref USING (w1)
      |)
      |SELECT w1, CAST(rk AS BIGINT) AS rank, w2, n_pair, n_prefix,
      |  CAST((n_pair * 1000000) // n_prefix AS BIGINT) AS cond_ppm
      |FROM r WHERE rk <= 3
      |ORDER BY w1, rank""".stripMargin

  // ---------------------------------------------------------------- q169
  /** RECIPROCAL-RANK-FUSION quality ensemble ([[graft.ops.Ranks
    * .rrfFusion]]): the q105 classifier score, the q91 corpus
    * familiarity, and the length prior fused by exact integer RRF —
    * rank-space combination of incommensurable signals, each rank an
    * exact radix order statistic. */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val fam = TextStats.unigramFamiliarity(docs)
      .select(col("doc_id"), col("familiarity"))
    val sig = docs.select(col("doc_id"), col("n_chars"),
        Classifier.hashedLinearScore(col("text"), 64L).as("__qs"))
      .join(fam, "doc_id")
    Ranks.rrfFusion(sig, "doc_id", Seq(
      ("quality", col("__qs")),
      ("familiar", col("familiarity")),
      ("length", col("n_chars"))))
  }

  private val q169Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
       |  FROM documents
       |),
       |freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
       |fam AS (
       |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS familiarity
       |  FROM toks JOIN freq USING (tok) GROUP BY doc_id
       |),
       |sig AS (
       |  SELECT d.doc_id, ${Round13.scoreFold} AS sq,
       |    fam.familiarity AS sf, d.n_chars AS sl
       |  FROM documents d JOIN fam ON fam.doc_id = d.doc_id
       |),
       |r AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY sq DESC, doc_id) AS rq,
       |    ROW_NUMBER() OVER (ORDER BY sf DESC, doc_id) AS rf,
       |    ROW_NUMBER() OVER (ORDER BY sl DESC, doc_id) AS rl
       |  FROM sig
       |)
       |SELECT doc_id,
       |  CAST(rq AS BIGINT) AS rank_quality,
       |  CAST(rf AS BIGINT) AS rank_familiar,
       |  CAST(rl AS BIGINT) AS rank_length,
       |  CAST(1000000 // (60 + rq) + 1000000 // (60 + rf)
       |       + 1000000 // (60 + rl) AS BIGINT) AS rrf_score
       |FROM r
       |ORDER BY rrf_score DESC, doc_id""".stripMargin

  // ---------------------------------------------------------------- q170
  /** EDIT-DISTANCE near-dup pairs ([[graft.ops.Dedup
    * .editDistancePairs]]): all pairs within Levenshtein 10 —
    * length-bucket-blocked and counting-filtered (both recall 1 by
    * the |Δlen| and ⌈L1/2⌉ lower bounds), banded-DP verified. The
    * oracle is the unblocked all-pairs spelling — blocking and filter
    * must be invisible. τ=10 on 44-577-char docs is a genuine
    * near-dup tolerance; the round-15 original ran τ=40, which on a
    * 48-char doc admits an 80% rewrite — semantically wrong and
    * quadratically dense (196 s: every same-band pair survived every
    * cheap bound and paid the DP). Since round 16 the battery runs
    * the COMPOSED second blocking key (vowel-count buckets — the
    * edit-Lipschitz-1 class count, recall 1 by the same |Δ| bound):
    * oracle-identical output, measured 12.57 → 11.65 s at sf0.1
    * (the extra key subdivides dense same-length bands faster than
    * its 3×3 neighbor expansion costs). */
  private def q170(s: SparkSession, dir: String): DataFrame =
    Dedup.editDistancePairs(Tables.documents(s, dir), maxDist = 10, classKey = Some("aeiou"))

  private val q170Sql =
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(length(a.text) AS BIGINT) AS len_a,
      |  CAST(length(b.text) AS BIGINT) AS len_b,
      |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
      |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.text, b.text) <= 10
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q171
  /** SPARSE TF-IDF top-k similarity ([[graft.ops.SparseSim
    * .tfidfTopK]]): inverted-index join, integer `tf·⌊log2(N/df)⌋`
    * weights, 1e12-scaled exact squared-cosine ranking — the lexical
    * similarity path that needs no embeddings. The oracle replays
    * weights, norms, dots and the HUGEINT cross-multiplied score. */
  private def q171(s: SparkSession, dir: String): DataFrame =
    SparseSim.tfidfTopK(Tables.documents(s, dir), k = 5)

  private val q171Sql =
    """WITH tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(list_filter(
      |          regexp_split_to_array(text, '\s+'), x -> length(x) > 0)) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2
      |),
      |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
      |post AS (
      |  SELECT tf.doc_id, tf.tok,
      |    tf.tf * (length(bin(nn.n // df.df)) - 1) AS w
      |  FROM tf JOIN df USING (tok) CROSS JOIN nn
      |  WHERE df.df <= 1000000
      |    AND tf.tf * (length(bin(nn.n // df.df)) - 1) > 0
      |),
      |norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
      |          FROM post GROUP BY 1),
      |dots AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    CAST(SUM(a.w * b.w) AS BIGINT) AS dot
      |  FROM post a JOIN post b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |),
      |m AS (SELECT da, db, dot FROM dots
      |      UNION ALL SELECT db, da, dot FROM dots),
      |sc AS (
      |  SELECT m.da, m.db,
      |    CAST((CAST(m.dot AS HUGEINT) * m.dot * 1000000000000)
      |         // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT) AS score
      |  FROM m JOIN norms na ON na.doc_id = m.da
      |         JOIN norms nb ON nb.doc_id = m.db
      |),
      |r AS (
      |  SELECT da, db, score,
      |    ROW_NUMBER() OVER (PARTITION BY da ORDER BY score DESC, db) AS rk
      |  FROM sc
      |)
      |SELECT da AS doc_id, CAST(rk AS BIGINT) AS rank, db AS sim_id,
      |  score AS score_e12
      |FROM r WHERE rk <= 5
      |ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- q172
  /** SKIP-GRAM co-occurrence ([[graft.ops.CoOccurrence
    * .skipgramCounts]]): unordered token pairs within 3 positions,
    * the word2vec/GloVe context substrate — top-30 by count under a
    * total order. */
  private def q172(s: SparkSession, dir: String): DataFrame =
    CoOccurrence.skipgramCounts(Tables.documents(s, dir),
      window = 3, minCount = 2L, k = 30)

  private val q172Sql =
    """WITH t AS (
      |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |p AS (
      |  SELECT unnest(flatten(list_transform(range(0, len(tk) - 1), i ->
      |    list_transform(range(1, least(3, len(tk) - 1 - i) + 1), j ->
      |      struct_pack(
      |        wa := least(tk[CAST(i + 1 AS INT)], tk[CAST(i + j + 1 AS INT)]),
      |        wb := greatest(tk[CAST(i + 1 AS INT)], tk[CAST(i + j + 1 AS INT)])
      |      ))))) AS p
      |  FROM t WHERE len(tk) >= 2
      |)
      |SELECT p.wa AS w_a, p.wb AS w_b, CAST(COUNT(*) AS BIGINT) AS n_cooc
      |FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |ORDER BY n_cooc DESC, w_a, w_b
      |LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- q173
  /** Replayable HLL cardinality audit ([[graft.ops.Hll
    * .bigramCardinalityAudit]]): per-source distinct-BIGRAM estimate
    * (the q164/q168 transition-table sizing read) from a 256-register
    * sketch with a DOCUMENTED hash, next to the exact count and the
    * err_ppm that grades it — the mergeable distinct-count sibling of
    * q155's CMS audit, with the whole register table and harmonic sum
    * replayed bit-for-bit. */
  private def q173(s: SparkSession, dir: String): DataFrame =
    Hll.bigramCardinalityAudit(Tables.documents(s, dir))

  private val q173Sql = {
    val th = tokHashSql("tok")
    s"""WITH t AS (
       |  SELECT source, list_filter(regexp_split_to_array(text, '\\s+'),
       |    x -> length(x) > 0) AS tk
       |  FROM documents
       |),
       |col AS (
       |  SELECT DISTINCT source,
       |    tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS tok
       |  FROM t, UNNEST(range(1, len(tk))) AS u(i)
       |  WHERE len(tk) >= 2
       |),
       |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
       |       FROM col GROUP BY 1),
       |h AS (
       |  SELECT source,
       |    CAST((CAST($th AS HUGEINT) * 777767777767)
       |         % 1099511627776 AS BIGINT) AS h40
       |  FROM col
       |),
       |b AS (SELECT source, h40 // 4294967296 AS b,
       |        h40 % 4294967296 AS low FROM h),
       |r AS (SELECT source, b,
       |        MAX(CASE WHEN low = 0 THEN 33
       |            ELSE 33 - length(bin(low)) END) AS r
       |      FROM b GROUP BY 1, 2),
       |s AS (
       |  SELECT source,
       |    CAST(SUM(1::BIGINT << CAST(33 - r AS INT)) AS BIGINT) AS wsum,
       |    CAST(COUNT(*) AS BIGINT) AS n_buckets_hit
       |  FROM r GROUP BY 1
       |),
       |est AS (
       |  SELECT source, n_buckets_hit,
       |    CAST((CAST(718272 AS HUGEINT) * 65536 * 8589934592)
       |         // (CAST(1000000 AS HUGEINT)
       |             * (wsum + (256 - n_buckets_hit) * (1::BIGINT << 33)))
       |      AS BIGINT) AS n_est
       |  FROM s
       |)
       |SELECT est.source, ex.n_exact, est.n_est,
       |  CAST((abs(est.n_est - ex.n_exact) * 1000000) // ex.n_exact
       |    AS BIGINT) AS err_ppm,
       |  est.n_buckets_hit
       |FROM est JOIN ex USING (source)
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q174
  /** Mergeable-histogram QUANTILE audit ([[graft.ops.Ranks
    * .histogramQuantileAudit]]): p25/p50/p75/p95 of document length
    * per language — the q162 median audit generalized to the full
    * capacity-plan read, exact order statistics beside the log2-bucket
    * sketch estimates. */
  private def q174(s: SparkSession, dir: String): DataFrame =
    Ranks.histogramQuantileAudit(Tables.documents(s, dir),
      "lang", "n_chars", Seq(25, 50, 75, 95))

  private val q174Sql =
    """WITH pcts(pct) AS (VALUES (25), (50), (75), (95)),
      |vc AS (
      |  SELECT lang, CAST(n_chars AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1, 2
      |),
      |sizes AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM vc GROUP BY 1),
      |cum AS (
      |  SELECT lang, v, SUM(cnt) OVER (PARTITION BY lang ORDER BY v) AS c
      |  FROM vc
      |),
      |ex AS (
      |  SELECT cum.lang, pcts.pct, MIN(v) AS exact_v
      |  FROM cum JOIN sizes USING (lang) CROSS JOIN pcts
      |  WHERE c >= ((n - 1) * pct) // 100 + 1
      |  GROUP BY 1, 2
      |),
      |bc AS (
      |  SELECT lang, length(bin(v)) - 1 AS b, SUM(cnt) AS cnt
      |  FROM vc GROUP BY 1, 2
      |),
      |bcum AS (
      |  SELECT lang, b, SUM(cnt) OVER (PARTITION BY lang ORDER BY b) AS c
      |  FROM bc
      |),
      |es AS (
      |  SELECT bcum.lang, pcts.pct, MIN(b) AS mb
      |  FROM bcum JOIN sizes USING (lang) CROSS JOIN pcts
      |  WHERE c >= ((n - 1) * pct) // 100 + 1
      |  GROUP BY 1, 2
      |),
      |ev AS (
      |  SELECT lang, pct,
      |    ((1::BIGINT << CAST(mb AS INT))
      |     + (1::BIGINT << (CAST(mb AS INT) + 1)) - 1) // 2 AS est_v
      |  FROM es
      |)
      |SELECT ex.lang, CAST(ex.pct AS BIGINT) AS pct, sizes.n,
      |  ex.exact_v, ev.est_v,
      |  CAST((abs(ev.est_v - ex.exact_v) * 1000000) // ex.exact_v
      |    AS BIGINT) AS err_ppm
      |FROM ex JOIN ev USING (lang, pct) JOIN sizes USING (lang)
      |ORDER BY lang, pct""".stripMargin

  // ---------------------------------------------------------------- q175
  /** TRIGRAM STUPID-BACKOFF surprisal ([[graft.ops.TextStats
    * .backoffSurprisal]]): the order-3 fluency gate the round-14
    * verdict asked for — transition tables fit on the even-id half of
    * the corpus, the odd-id half scored with trigram→bigram→unigram→
    * OOV fallback at an integer 2-bit penalty per backoff level
    * (−log2 0.4 ≈ 1.32 rounded up). Every level is the exact
    * `length(bin(count div count))−1` bit cost, so the oracle replays
    * the whole ladder as LEFT JOINs + one CASE with zero floating
    * point. Held-out split means backoff genuinely fires (a corpus
    * scored on its own table never backs off). */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextStats.backoffSurprisal(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
      .orderBy("doc_id")
  }

  private val q175Sql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |rtri AS (
      |  SELECT tk[CAST(i + 1 AS INT)] AS w1, tk[CAST(i + 2 AS INT)] AS w2,
      |         tk[CAST(i + 3 AS INT)] AS w3
      |  FROM t, UNNEST(range(0, len(tk) - 2)) AS u(i)
      |  WHERE doc_id % 2 = 0 AND len(tk) >= 3),
      |n3t AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n3
      |        FROM rtri GROUP BY 1, 2, 3),
      |c2t AS (SELECT w1, w2, CAST(SUM(n3) AS BIGINT) AS c2 FROM n3t GROUP BY 1, 2),
      |rbi AS (
      |  SELECT tk[CAST(i + 1 AS INT)] AS a, tk[CAST(i + 2 AS INT)] AS b
      |  FROM t, UNNEST(range(0, len(tk) - 1)) AS u(i)
      |  WHERE doc_id % 2 = 0 AND len(tk) >= 2),
      |n2t AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n2 FROM rbi GROUP BY 1, 2),
      |c1t AS (SELECT a, CAST(SUM(n2) AS BIGINT) AS c1 FROM n2t GROUP BY 1),
      |runi AS (SELECT unnest(tk) AS w FROM t WHERE doc_id % 2 = 0),
      |n1t AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1 FROM runi GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM runi),
      |sd AS (
      |  SELECT doc_id, w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS m FROM (
      |    SELECT doc_id, tk[CAST(i + 1 AS INT)] AS w1,
      |           tk[CAST(i + 2 AS INT)] AS w2, tk[CAST(i + 3 AS INT)] AS w3
      |    FROM t, UNNEST(range(0, len(tk) - 2)) AS u(i)
      |    WHERE doc_id % 2 = 1 AND len(tk) >= 3)
      |  GROUP BY 1, 2, 3, 4),
      |j AS (
      |  SELECT sd.doc_id, sd.m, n3, n2, n1,
      |    CASE WHEN n3 IS NOT NULL THEN length(bin(c2 // n3)) - 1
      |         WHEN n2 IS NOT NULL THEN 2 + length(bin(c1 // n2)) - 1
      |         WHEN n1 IS NOT NULL THEN 4 + length(bin(nn // n1)) - 1
      |         ELSE 6 + length(bin(nn)) - 1 END AS s
      |  FROM sd
      |  LEFT JOIN n3t USING (w1, w2, w3)
      |  LEFT JOIN c2t USING (w1, w2)
      |  LEFT JOIN n2t ON n2t.a = sd.w2 AND n2t.b = sd.w3
      |  LEFT JOIN c1t ON c1t.a = sd.w2
      |  LEFT JOIN n1t ON n1t.w = sd.w3
      |  CROSS JOIN tot)
      |SELECT doc_id,
      |  CAST(SUM(m) AS BIGINT) AS n_scored,
      |  CAST(SUM(CASE WHEN n3 IS NOT NULL THEN m ELSE 0 END) AS BIGINT) AS n_tri,
      |  CAST(SUM(CASE WHEN n3 IS NULL AND n2 IS NOT NULL THEN m ELSE 0 END)
      |    AS BIGINT) AS n_bi,
      |  CAST(SUM(CASE WHEN n3 IS NULL AND n2 IS NULL AND n1 IS NOT NULL
      |    THEN m ELSE 0 END) AS BIGINT) AS n_uni,
      |  CAST(SUM(CASE WHEN n3 IS NULL AND n2 IS NULL AND n1 IS NULL
      |    THEN m ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(SUM(m * s) AS BIGINT) AS surprisal_sum,
      |  (CAST(SUM(m * s) AS BIGINT) * 100) // CAST(SUM(m) AS BIGINT)
      |    AS surprisal_per_100
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q176
  /** PACKING FILL AUDIT: the efficiency rollup of q145's curriculum
    * span map — per phase, sequences/docs/spans, token fill vs
    * capacity in exact ppm, boundary-cut counts (every continuation
    * span has doc_off > 0, so cuts need no per-doc regroup), and the
    * tail waste (prefix-sum packing fills every sequence but the
    * phase's last, so waste == final-sequence slack; the audit proves
    * it). The read a training-data job checks before burning compute:
    * how full are the sequences, and how many documents got cut. One
    * aggregation pass over the span map — the packing itself is the
    * cost, the audit is free. */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val budget = 256L
    Round14.curriculumSpans(s, dir)
      .groupBy("phase")
      .agg(countDistinct(col("seq_id")).as("n_seqs"),
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_spans"),
        sum(col("len")).as("tok_total"),
        sum(when(col("doc_off") > 0, 1L).otherwise(0L)).as("n_cuts"),
        countDistinct(when(col("doc_off") > 0, col("doc_id"))).as("n_cut_docs"))
      .withColumn("capacity", col("n_seqs") * budget)
      .withColumn("fill_ppm", expr("(tok_total * 1000000L) div capacity"))
      .withColumn("tail_waste", col("capacity") - col("tok_total"))
      .orderBy("phase")
  }

  private val q176Sql =
    s"""WITH spans AS (
       |${Round14.curriculumSpansSql}
       |)
       |SELECT phase,
       |  CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_seqs,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_spans,
       |  CAST(SUM(len) AS BIGINT) AS tok_total,
       |  CAST(SUM(CASE WHEN doc_off > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       |  CAST(COUNT(DISTINCT CASE WHEN doc_off > 0 THEN doc_id END) AS BIGINT)
       |    AS n_cut_docs,
       |  CAST(COUNT(DISTINCT seq_id) AS BIGINT) * 256 AS capacity,
       |  (CAST(SUM(len) AS BIGINT) * 1000000)
       |    // (CAST(COUNT(DISTINCT seq_id) AS BIGINT) * 256) AS fill_ppm,
       |  CAST(COUNT(DISTINCT seq_id) AS BIGINT) * 256 - CAST(SUM(len) AS BIGINT)
       |    AS tail_waste
       |FROM spans GROUP BY phase ORDER BY phase""".stripMargin

  // ---------------------------------------------------------------- q177
  /** Intra-doc REPETITION gate ([[graft.ops.TextStats
    * .repetitionScore]]): the per-gram-count half of the Gopher
    * repetition battery — all-occurrence duplicated-3-gram mass and
    * top-gram concentration in exact ppm (q110's map-only profile
    * gives the float excess fractions; these two cuts need per-gram
    * counts, i.e. one shuffle). */
  private def q177(s: SparkSession, dir: String): DataFrame =
    TextStats.repetitionScore(Tables.documents(s, dir), n = 3)
      .orderBy("doc_id")

  private val q177Sql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |g AS (
      |  SELECT doc_id, tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)]
      |    || ' ' || tk[CAST(i + 3 AS INT)] AS g
      |  FROM t, UNNEST(range(0, len(tk) - 2)) AS u(i)
      |  WHERE len(tk) >= 3),
      |c AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM g GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_grams,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_rep,
      |  CAST(MAX(c) AS BIGINT) AS max_repeat,
      |  (CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) * 1000000)
      |    // CAST(SUM(c) AS BIGINT) AS rep_ppm,
      |  (CAST(MAX(c) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT)
      |    AS top_gram_ppm
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q178
  /** FREQUENCY SPECTRUM ([[graft.ops.TextStats.freqSpectrum]]): the
    * Zipf doubling histogram — types and token mass per
    * floor(log2(count)) bucket with exact ppm shares. Template spam
    * and OCR noise each deform a distinct end of this curve. */
  private def q178(s: SparkSession, dir: String): DataFrame =
    TextStats.freqSpectrum(Tables.documents(s, dir)).orderBy("bucket")

  private val q178Sql =
    """WITH t AS (
      |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
      |b AS (SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bucket,
      |        CAST(COUNT(*) AS BIGINT) AS n_types,
      |        CAST(SUM(c) AS BIGINT) AS n_tokens
      |      FROM c GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_types) AS BIGINT) AS tt,
      |          CAST(SUM(n_tokens) AS BIGINT) AS nn FROM b)
      |SELECT bucket, n_types, n_tokens,
      |  (n_types * 1000000) // tt AS type_ppm,
      |  (n_tokens * 1000000) // nn AS token_ppm
      |FROM b CROSS JOIN tot ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q179
  /** VOCAB COVERAGE curve ([[graft.ops.TextStats.vocabCoverageAt]]):
    * exact token mass covered by the s most frequent types at five
    * power-of-two vocab sizes — computed over distinct-COUNT levels
    * (no per-type rank: types sharing a count contribute equally), so
    * the only window is value-domain-sized. */
  private def q179(s: SparkSession, dir: String): DataFrame =
    TextStats.vocabCoverageAt(Tables.documents(s, dir)).orderBy("vocab_size")

  private val q179Sql =
    """WITH t AS (
      |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
      |lv AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS nt FROM c GROUP BY 1),
      |cum AS (SELECT c, nt,
      |          CAST(COALESCE(SUM(nt) OVER (ORDER BY c DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |            AS BIGINT) AS ct
      |        FROM lv),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM c),
      |probes AS (SELECT CAST(unnest([256, 1024, 4096, 16384, 65536])
      |             AS BIGINT) AS vocab_size)
      |SELECT vocab_size,
      |  CAST(SUM(GREATEST(LEAST(vocab_size - ct, nt), 0) * c) AS BIGINT)
      |    AS covered_tokens,
      |  (CAST(SUM(GREATEST(LEAST(vocab_size - ct, nt), 0) * c) AS BIGINT)
      |    * 1000000) // nn AS coverage_ppm
      |FROM cum CROSS JOIN probes CROSS JOIN tot
      |GROUP BY vocab_size, nn ORDER BY vocab_size""".stripMargin

  // ---------------------------------------------------------------- q180
  /** LABEL-PROPAGATION communities ([[graft.ops.LabelProp]]) over the
    * q166 winnowing-overlap graph: 4 synchronous rounds with the
    * pinned (count desc, label asc) argmax name the template FAMILIES
    * the pairwise fingerprint edges only imply — the rollup a
    * curation dashboard groups near-dups by. Oracle: the full q166
    * funnel as a CTE, then each round replayed as a generated CTE
    * (the q163/q165 pattern). */
  private def q180(s: SparkSession, dir: String): DataFrame = {
    val pairs = Winnowing.overlapPairs(Tables.documents(s, dir),
      k = 3, w = 4, minShared = 2L, maxDf = 64L)
    graft.ops.LabelProp.propagate(
        pairs.select(col("doc_a"), col("doc_b")), rounds = 4,
        aCol = "doc_a", bCol = "doc_b")
      .orderBy("node")
  }

  private val q180Sql = {
    val rounds = 4
    val steps = (1 to rounds).map { r =>
      s"""s$r AS (
         |  SELECT e.src, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM dir e JOIN l${r - 1} l ON l.n = e.dst
         |  GROUP BY 1, 2),
         |l$r AS (
         |  SELECT src AS n, MIN(lbl) AS lbl FROM (
         |    SELECT src, lbl, c, MAX(c) OVER (PARTITION BY src) AS mc
         |    FROM s$r)
         |  WHERE c = mc GROUP BY src)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |$q166Sql
       |),
       |e AS (SELECT doc_a AS lo, doc_b AS hi FROM pairs),
       |dir AS (SELECT lo AS src, hi AS dst FROM e
       |        UNION ALL SELECT hi AS src, lo AS dst FROM e),
       |l0 AS (SELECT DISTINCT src AS n, src AS lbl FROM dir),
       |$steps
       |SELECT n AS node, lbl AS community FROM l$rounds ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q181
  /** CONTENT-DEFINED CHUNKING ([[graft.ops.Chunking
    * .contentDefinedChunks]]): Rabin/FastCDC-family cuts after every
    * token whose replayable codepoint hash is ≡ 0 mod 32 — the
    * shift-robust chunk substrate (one edit re-cuts one chunk; the
    * metamorphic spec pins it) with per-chunk multiset fingerprints
    * as the dedup join key. Oracle replays the token-hash fold, the
    * boundary predicate and the per-doc prefix count. */
  private def q181(s: SparkSession, dir: String): DataFrame =
    graft.ops.Chunking.contentDefinedChunks(Tables.documents(s, dir),
      maskBits = 5).orderBy("doc_id", "chunk_idx")

  private val q181Sql =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
       |    x -> length(x) > 0) AS tk
       |  FROM documents
       |),
       |p AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i + 1 AS INT)] AS tok
       |  FROM t, UNNEST(range(0, len(tk))) AS u(i)
       |  WHERE len(tk) >= 1),
       |h AS (
       |  SELECT doc_id, pos,
       |    ${tokHashSql("tok")} AS hv
       |  FROM p),
       |c AS (
       |  SELECT doc_id, pos, hv,
       |    COALESCE(SUM(CASE WHEN hv % 32 = 0 THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
       |  FROM h)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(MIN(pos) AS BIGINT) AS start_pos,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(hv) AS BIGINT) AS hash_sum
       |FROM c GROUP BY doc_id, chunk_idx
       |ORDER BY doc_id, chunk_idx""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q166_winnow_overlap", q166, Some(q166Sql)),
    QueryDef("q167_hard_negatives", q167, Some(q167Sql)),
    QueryDef("q168_next_token", q168, Some(q168Sql)),
    QueryDef("q169_rrf_quality", q169, Some(q169Sql)),
    QueryDef("q170_edit_distance_pairs", q170, Some(q170Sql)),
    QueryDef("q171_sparse_tfidf_topk", q171, Some(q171Sql)),
    QueryDef("q172_skipgram_cooc", q172, Some(q172Sql)),
    QueryDef("q173_hll_audit", q173, Some(q173Sql)),
    QueryDef("q174_quantile_audit", q174, Some(q174Sql)),
    QueryDef("q175_backoff_surprisal", q175, Some(q175Sql)),
    QueryDef("q176_packing_audit", q176, Some(q176Sql)),
    QueryDef("q177_repetition", q177, Some(q177Sql)),
    QueryDef("q178_freq_spectrum", q178, Some(q178Sql)),
    QueryDef("q179_vocab_coverage", q179, Some(q179Sql)),
    QueryDef("q180_winnow_communities", q180, Some(q180Sql)),
    QueryDef("q181_cdc_chunks", q181, Some(q181Sql)))
}
