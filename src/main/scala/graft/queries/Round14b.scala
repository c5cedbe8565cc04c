package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Clustering, Dedup, Drift, Ranks, TextStats, TimeSeries}

/** Round-14 battery additions, part 2: fixed-point k-means (the op
  * that TRAINS similarity cells instead of inheriting labels),
  * asymmetric containment dedup, n-gram novelty scoring, touch
  * attribution, and the snapshot mixture-drift audit. All
  * reference-scope-none LLM-pipeline extensions (SURVEY §8).
  */
object Round14b {

  // ---------------------------------------------------------------- q148
  /** Bounded-round Lloyd k-means ([[graft.ops.Clustering.kmeans]]):
    * k = 8 centroids, 3 rounds, EXACT fixed-point arithmetic end to
    * end — quantized components, integer squared distances,
    * DECIMAL-summed floor-divided centroid means, lowest-cid ties —
    * so the oracle replays every round as generated CTEs (the q73
    * pagerank pattern) and hash-checks the final assignment
    * bit-for-bit: the clustering that trains IVF coarse quantizers
    * and SemDeDup cells rather than assuming labels exist. */
  private def q148(s: SparkSession, dir: String): DataFrame =
    Clustering.kmeans(Tables.embeddings(s, dir), k = 8, iterations = 3)
      .orderBy("vec_id")

  /** One assignment + one update CTE pair per round — generated, so
    * the oracle's round count can never drift from the query's. */
  private val q148Sql = {
    val iters = 3
    val k = 8
    def assign(i: Int, prev: String) =
      s"""d$i AS (
         |  SELECT v.vec_id, v.q, c.cid,
         |    CAST(list_sum(list_transform(range(1, len(v.q) + 1),
         |      j -> (v.q[j] - c.c[j]) * (v.q[j] - c.c[j]))) AS BIGINT) AS d2
         |  FROM q v CROSS JOIN $prev c
         |),
         |a$i AS (
         |  SELECT vec_id, q, cid, d2 FROM (
         |    SELECT vec_id, q, cid, d2,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
         |    FROM d$i) WHERE rk = 1
         |)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""${assign(i, s"c${i - 1}")},
         |u$i AS (
         |  SELECT cid, list(m ORDER BY pos) AS c FROM (
         |    SELECT cid, pos, CAST((s - ((s % n) + n) % n) // n AS BIGINT) AS m
         |    FROM (
         |      SELECT cid, r.pos AS pos, CAST(SUM(a.q[r.pos]) AS HUGEINT) AS s,
         |        CAST(COUNT(*) AS HUGEINT) AS n
         |      FROM a$i a, LATERAL (SELECT unnest(range(1, len(a.q) + 1)) AS pos) r
         |      GROUP BY cid, r.pos))
         |  GROUP BY cid
         |),
         |c$i AS (
         |  SELECT p.cid, COALESCE(u.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN u$i u ON u.cid = p.cid
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
       |  FROM embeddings
       |),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, q AS c
       |  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT $k)
       |),
       |$steps,
       |${assign(iters + 1, s"c$iters")}
       |SELECT vec_id, cid AS cluster, d2 AS dist2 FROM a${iters + 1}
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q149
  /** Asymmetric CONTAINMENT pairs ([[graft.ops.Dedup
    * .containmentPairs]]): 3-gram containment of the smaller distinct
    * set ≥ 60% — the excerpt/quote detector symmetric Jaccard
    * misses (a short doc fully inside a long one has Jaccard ≈ 0 but
    * containment 1). Verdict and score are integer cross-multiply /
    * floor-division, so the oracle (exact all-pairs containment,
    * feasible at verify scale) hash-matches bit-for-bit; the engine's
    * shared-gram candidate join is recall-1 for any τ > 0. */
  private def q149(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, dir), n = 3, tauPct = 60)
      .orderBy("doc_small", "doc_big")

  private val q149Sql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
      |),
      |grams AS (
      |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM toks WHERE len(t) >= 3
      |),
      |pairs AS (
      |  SELECT a.doc_id AS ia, b.doc_id AS ib,
      |    CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS inter,
      |    CAST(len(a.g) AS BIGINT) AS na, CAST(len(b.g) AS BIGINT) AS nb
      |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
      |),
      |o AS (
      |  SELECT
      |    CASE WHEN na < nb OR (na = nb AND ia < ib) THEN ia ELSE ib END AS doc_small,
      |    CASE WHEN na < nb OR (na = nb AND ia < ib) THEN ib ELSE ia END AS doc_big,
      |    CASE WHEN na < nb OR (na = nb AND ia < ib) THEN na ELSE nb END AS n_small,
      |    CASE WHEN na < nb OR (na = nb AND ia < ib) THEN nb ELSE na END AS n_big,
      |    inter
      |  FROM pairs
      |)
      |SELECT doc_small, doc_big, n_small, n_big, inter,
      |  (inter * 1000000) // n_small AS containment_ppm
      |FROM o WHERE inter * 100 >= 60 * n_small
      |ORDER BY doc_small, doc_big""".stripMargin

  // ---------------------------------------------------------------- q150
  /** N-gram NOVELTY scoring ([[graft.ops.TextStats.ngramNovelty]]):
    * each doc outside the reference sources scored by the exact ppm
    * of its distinct bigrams absent from the src0–src3 reference
    * corpus — the "fresh text vs remix of what we already have"
    * mixture signal; order-sensitive where unigram familiarity is
    * not. Counts and the floor-divided ppm are pure integers. */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val refSrc = Seq("src0", "src1", "src2", "src3")
    TextStats.ngramNovelty(
        d.filter(!col("source").isin(refSrc: _*)),
        d.filter(col("source").isin(refSrc: _*)), n = 2)
      .orderBy("doc_id")
  }

  private val q150Sql =
    """WITH toks AS (
      |  SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS t FROM documents
      |),
      |grams AS (
      |  SELECT doc_id, source, list_distinct(list_transform(range(len(t) - 1),
      |    i -> t[i+1] || ' ' || t[i+2])) AS g
      |  FROM toks WHERE len(t) >= 2
      |),
      |refg AS (
      |  SELECT DISTINCT unnest(g) AS gram FROM grams
      |  WHERE source IN ('src0', 'src1', 'src2', 'src3')
      |),
      |doc AS (
      |  SELECT doc_id, unnest(g) AS gram FROM grams
      |  WHERE source NOT IN ('src0', 'src1', 'src2', 'src3')
      |)
      |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  (CAST(SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // CAST(COUNT(*) AS BIGINT) AS novelty_ppm
      |FROM doc d LEFT JOIN refg r ON d.gram = r.gram
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q151
  /** FIRST/LAST-touch attribution ([[graft.ops.TimeSeries
    * .touchAttribution]]): every purchase attributed to the earliest
    * and latest click by the same user within the preceding 30
    * minutes, same-timestamp ties broken on event id via struct
    * min/max — both canonical single-touch models side by side, plus
    * the un-attributable share (n_touches = 0 rows kept). */
  private def q151(s: SparkSession, dir: String): DataFrame =
    TimeSeries.touchAttribution(Tables.events(s, dir)).orderBy("event_id")

  private val q151Sql =
    """WITH conv AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |),
      |touch AS (
      |  SELECT user_id, event_id AS tid, ts AS tts FROM events
      |  WHERE event_type = 'click'
      |),
      |j AS (
      |  SELECT c.event_id, c.user_id, c.ts, t.tid, t.tts
      |  FROM conv c LEFT JOIN touch t ON t.user_id = c.user_id
      |    AND t.tts <= c.ts AND t.tts >= c.ts - INTERVAL 30 MINUTE
      |)
      |SELECT event_id, user_id, ts,
      |  CAST(COUNT(tid) AS BIGINT) AS n_touches,
      |  (min(CASE WHEN tid IS NOT NULL THEN {'ts': tts, 'id': tid} END)).id
      |    AS first_touch_id,
      |  (max(CASE WHEN tid IS NOT NULL THEN {'ts': tts, 'id': tid} END)).id
      |    AS last_touch_id
      |FROM j GROUP BY event_id, user_id, ts
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q152
  /** Snapshot MIXTURE-DRIFT audit ([[graft.ops.Drift.mixtureDrift]]):
    * token-weighted source shares of two corpus halves (even vs odd
    * doc ids standing in for yesterday/today) in exact integer ppm,
    * with per-source absolute drift — the pre-retrain composition
    * check; half the drift column's sum is the exact total-variation
    * distance between the mixtures. */
  private def q152(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    Drift.mixtureDrift(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        "source", TextStats.tokenCount(col("text")))
      .orderBy("source")
  }

  private val q152Sql =
    """WITH w AS (
      |  SELECT source, doc_id % 2 AS half,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS HUGEINT) AS w
      |  FROM documents
      |),
      |k AS (
      |  SELECT source,
      |    SUM(CASE WHEN half = 0 THEN w ELSE 0 END) AS wa,
      |    SUM(CASE WHEN half = 1 THEN w ELSE 0 END) AS wb
      |  FROM w GROUP BY source
      |),
      |t AS (SELECT SUM(wa) AS ta, SUM(wb) AS tb FROM k)
      |SELECT source,
      |  CAST(wa AS BIGINT) AS w_a, CAST(wb AS BIGINT) AS w_b,
      |  CAST((wa * 1000000) // ta AS BIGINT) AS ppm_a,
      |  CAST((wb * 1000000) // tb AS BIGINT) AS ppm_b,
      |  CAST(abs((wa * 1000000) // ta - (wb * 1000000) // tb) AS BIGINT) AS drift_ppm
      |FROM k, t ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q153
  /** CO-VISITATION mining ([[graft.ops.CoOccurrence.coVisitation]]):
    * the 15 item pairs viewed by the most distinct users (items from
    * the event props JSON) — the "users who viewed X also viewed Y"
    * matrix and the edge list an item graph (q73 PageRank) is built
    * from. Exact counts, total-order ranking. */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val views = Tables.events(s, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
    graft.ops.CoOccurrence.coVisitation(views, k = 15)
  }

  private val q153Sql =
    """WITH it AS (
      |  SELECT DISTINCT user_id,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      |  FROM events WHERE event_type = 'view'
      |)
      |SELECT a.item AS item_a, b.item AS item_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
      |GROUP BY a.item, b.item
      |ORDER BY n_users DESC, item_a, item_b
      |LIMIT 15""".stripMargin

  // ---------------------------------------------------------------- q154
  /** COLLOCATION mining ([[graft.ops.CoOccurrence.collocations]]):
    * the 20 most frequent adjacent token pairs (≥ 5 occurrences) with
    * exact integer lift in ppm — observed pair rate over the
    * independence expectation, the corpus-statistics preview of what
    * a BPE trainer merges. All counts over the raw token stream;
    * products in DECIMAL(38,0)/HUGEINT so both engines divide the
    * same exact integers. */
  private def q154(s: SparkSession, dir: String): DataFrame =
    graft.ops.CoOccurrence.collocations(Tables.documents(s, dir),
      k = 20, minCount = 5L)

  private val q154Sql =
    """WITH toks AS (
      |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents
      |),
      |uni AS (SELECT unnest(t) AS w FROM toks),
      |un AS (SELECT w, CAST(COUNT(*) AS HUGEINT) AS n FROM uni GROUP BY w),
      |nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_total FROM uni),
      |pr AS (
      |  SELECT t[i+1] AS w1, t[i+2] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) r
      |  WHERE len(t) >= 2
      |),
      |pc AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS HUGEINT) AS np
      |  FROM pr GROUP BY w1, w2 HAVING COUNT(*) >= 5
      |)
      |SELECT w1, w2, CAST(np AS BIGINT) AS n_pair,
      |  CAST(a.n AS BIGINT) AS n_w1, CAST(b.n AS BIGINT) AS n_w2,
      |  CAST((np * n_total * 1000000) // (a.n * b.n) AS BIGINT) AS lift_ppm
      |FROM pc JOIN un a ON pc.w1 = a.w JOIN un b ON pc.w2 = b.w CROSS JOIN nn
      |ORDER BY n_pair DESC, w1, w2
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q155
  /** Count-Min sketch AUDIT ([[graft.ops.CountMinSketch
    * .cmsTopVocabAudit]]): a 4×16 counter table over the token
    * stream, probed with the exact top-20 vocabulary — exact count,
    * CMS estimate and the overcount side by side. Row hashes are
    * affine maps of the replayable codepoint fold, so the oracle
    * rebuilds the counter table cell-for-cell and every estimate
    * (including collision overcounts) hash-matches. w=16 is sized
    * BELOW the corpus vocabulary so the audit exercises real
    * collisions, not an empty sketch. */
  private def q155(s: SparkSession, dir: String): DataFrame =
    graft.ops.CountMinSketch.cmsTopVocabAudit(Tables.documents(s, dir),
      topN = 20, d = 4, w = 16)

  private val q155Sql =
    """WITH uni AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0)) AS tok
      |  FROM documents
      |),
      |toks AS (SELECT DISTINCT tok FROM uni),
      |h AS (
      |  SELECT tok, list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(tok)+1),
      |        i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))),
      |    (acc, c) -> (acc * 131 + c) % 1000000007) AS hv
      |  FROM toks
      |),
      |co (i, a, b) AS (VALUES (0, 3, 7), (1, 5, 11), (2, 13, 17), (3, 31, 19)),
      |ex AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM uni GROUP BY tok),
      |cells AS (
      |  SELECT c.i, ((h.hv * c.a + c.b) % 1000000007) % 16 AS b,
      |    CAST(SUM(e.n_exact) AS BIGINT) AS cnt
      |  FROM h JOIN ex e USING (tok) CROSS JOIN co c
      |  GROUP BY 1, 2
      |),
      |top AS (SELECT tok, n_exact FROM ex ORDER BY n_exact DESC, tok LIMIT 20),
      |probe AS (
      |  SELECT t.tok, t.n_exact, MIN(cells.cnt) AS n_cms
      |  FROM top t JOIN h USING (tok) CROSS JOIN co c
      |  JOIN cells ON cells.i = c.i
      |    AND cells.b = ((h.hv * c.a + c.b) % 1000000007) % 16
      |  GROUP BY t.tok, t.n_exact
      |)
      |SELECT tok AS token, n_exact, n_cms, n_cms - n_exact AS overcount
      |FROM probe ORDER BY n_exact DESC, token""".stripMargin

  // ---------------------------------------------------------------- q156
  /** BURST detection ([[graft.ops.TimeSeries.burstHours]]): hours
    * where an event type runs ≥ 150% of its own trailing-24-observed-
    * hours mean — the ingest volume-anomaly alarm. Integer
    * cross-multiplied verdict, rows-frame baseline (gaps are not
    * observations), first hours cannot flag (NULL baseline in both
    * engines). */
  private def q156(s: SparkSession, dir: String): DataFrame =
    TimeSeries.burstHours(Tables.events(s, dir), factorPct = 150)
      .orderBy("event_type", "hour")

  private val q156Sql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2
      |),
      |win AS (
      |  SELECT event_type, hour, n_events,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS w_n,
      |    CAST(SUM(n_events) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS w_sum
      |  FROM hourly
      |)
      |SELECT event_type, hour, n_events, w_n, w_sum
      |FROM win WHERE n_events * w_n * 100 > 150 * w_sum
      |ORDER BY event_type, hour""".stripMargin

  // ---------------------------------------------------------------- q157
  /** Unigram SURPRISAL quality score ([[graft.ops.TextStats
    * .surprisalScore]]): per-token `floor(log2(N div n_tok))` summed
    * per document — the integer-exact proxy for the LM-perplexity
    * filters of the CCNet/Gopher pipelines. The log2 is the
    * `length(bin(x)) − 1` bit trick, so there is no floating point
    * anywhere and both engines agree at exact powers of two. */
  private def q157(s: SparkSession, dir: String): DataFrame =
    TextStats.surprisalScore(Tables.documents(s, dir)).orderBy("doc_id")

  private val q157Sql =
    """WITH uni AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0)) AS tok
      |  FROM documents
      |),
      |per_doc AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM uni GROUP BY 1, 2
      |),
      |vocab AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS nt FROM per_doc GROUP BY 1),
      |tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS nn FROM vocab)
      |SELECT p.doc_id,
      |  CAST(SUM(p.n) AS BIGINT) AS n_toks,
      |  CAST(SUM(p.n * (length(bin(t.nn // v.nt)) - 1)) AS BIGINT) AS surprisal_sum,
      |  (CAST(SUM(p.n * (length(bin(t.nn // v.nt)) - 1)) AS BIGINT) * 100)
      |    // CAST(SUM(p.n) AS BIGINT) AS surprisal_per_100
      |FROM per_doc p JOIN vocab v USING (tok) CROSS JOIN tot t
      |GROUP BY p.doc_id
      |ORDER BY p.doc_id""".stripMargin

  // ---------------------------------------------------------------- q158
  /** Inter-event GAP histogram ([[graft.ops.TimeSeries
    * .gapHistogram]]): per-user consecutive-event gaps bucketed by
    * `floor(log2(gap_s))` (same-second gaps in bucket −1) — the
    * calibration read behind the q12/q59 sessionization timeout.
    * Spark's timestamp→long floor and DuckDB's
    * `date_diff('second', …)` boundary count are the same integer. */
  private def q158(s: SparkSession, dir: String): DataFrame =
    TimeSeries.gapHistogram(Tables.events(s, dir)).orderBy("gap_bucket")

  private val q158Sql =
    """WITH g AS (
      |  SELECT date_diff('second',
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |    ts) AS gap
      |  FROM events
      |)
      |SELECT CASE WHEN gap = 0 THEN CAST(-1 AS BIGINT)
      |    ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END AS gap_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(MIN(gap) AS BIGINT) AS min_gap_s,
      |  CAST(MAX(gap) AS BIGINT) AS max_gap_s
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY 1 ORDER BY gap_bucket""".stripMargin

  // ---------------------------------------------------------------- q159
  /** Exponentially-DECAYED popularity ([[graft.ops.TimeSeries
    * .decayedPopularity]]): per event type, `Σ n_h · 2^(depth −
    * rank_h)` over the 16 most recent observed hours — the "trending
    * now" ranker beside q156's alarm. Power-of-two weights via
    * shiftleft, so the score is an exact BIGINT in both engines. */
  private def q159(s: SparkSession, dir: String): DataFrame =
    TimeSeries.decayedPopularity(Tables.events(s, dir), depth = 16)
      .orderBy("event_type")

  private val q159Sql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |r AS (
      |  SELECT event_type, h, n,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h DESC) AS rk
      |  FROM hourly
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
      |  MAX(h) AS latest_hour,
      |  CAST(SUM(n * (CAST(1 AS BIGINT) << (16 - rk))) AS BIGINT) AS decay_score
      |FROM r WHERE rk <= 16
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q160
  /** TRIANGLE counting ([[graft.ops.Triangles.triangleCounts]]) over
    * the undirected co-occurrence graph (adjacent-pair counts ≥ 60,
    * both directions summed): per-node closure participation via the
    * degree-ordered wedge join — each triangle found exactly once,
    * hub fan-out bounded by orientation, never by degree. The oracle
    * enumerates the same triangle SET with the naive a<b<c triple
    * join (orientation-independent), proving the oriented plan loses
    * and invents nothing. */
  private def q160(s: SparkSession, dir: String): DataFrame = {
    val edges = graft.ops.CoOccurrence
      .adjacentPairCounts(Tables.documents(s, dir))
      .groupBy(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .agg(sum(col("n_pair")).as("n"))
      .filter(col("n") >= 60)
    graft.ops.Triangles.triangleCounts(edges, "a", "b")
      .orderBy(col("n_triangles").desc, col("node"))
  }

  private val q160Sql =
    """WITH t AS (
      |  SELECT list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |),
      |pr AS (
      |  SELECT unnest(list_transform(range(1, len(tk)),
      |    i -> struct_pack(w1 := tk[CAST(i AS INT)],
      |                     w2 := tk[CAST(i AS INT) + 1]))) AS p
      |  FROM t WHERE len(tk) >= 2
      |),
      |o AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM pr GROUP BY 1, 2),
      |e AS (
      |  SELECT a, b FROM (
      |    SELECT least(w1, w2) AS a, greatest(w1, w2) AS b,
      |      CAST(SUM(n) AS BIGINT) AS n
      |    FROM o GROUP BY 1, 2
      |  ) WHERE a < b AND n >= 60
      |),
      |tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e e1
      |  JOIN e e2 ON e2.a = e1.b
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
      |)
      |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      |  SELECT x AS node FROM tri
      |  UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri
      |)
      |GROUP BY node
      |ORDER BY n_triangles DESC, node""".stripMargin

  // ---------------------------------------------------------------- q161
  /** Per-source LEXICAL HEALTH ([[graft.ops.TextStats
    * .lexicalHealth]]): type-token ratio and hapax share in exact
    * ppm — the degenerate-feed tripwire (TTR collapse = template
    * spam; hapax explosion = OCR noise). */
  private def q161(s: SparkSession, dir: String): DataFrame =
    TextStats.lexicalHealth(Tables.documents(s, dir)).orderBy("source")

  private val q161Sql =
    """WITH uni AS (
      |  SELECT source, unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |    x -> length(x) > 0)) AS tok
      |  FROM documents
      |),
      |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      |       FROM uni GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  (CAST(COUNT(*) AS BIGINT) * 1000000) // CAST(SUM(n) AS BIGINT) AS ttr_ppm,
      |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  (CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // CAST(COUNT(*) AS BIGINT) AS hapax_ppm
      |FROM st GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q162
  /** Mergeable-histogram MEDIAN audit ([[graft.ops.Ranks
    * .histogramMedianAudit]]): per-source document-length median the
    * sketch way (log2-bucket walk, integer-midpoint estimate) graded
    * against the exact lower median from a value-domain-bounded
    * cumulative walk — the order statistic a sharded ingest merges
    * cell-wise instead of sorting 100 TB. */
  private def q162(s: SparkSession, dir: String): DataFrame =
    Ranks.histogramMedianAudit(Tables.documents(s, dir), "source", "n_chars")
      .orderBy("source")

  private val q162Sql =
    """WITH vc AS (
      |  SELECT source, CAST(n_chars AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2
      |),
      |sz AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ng FROM vc GROUP BY 1),
      |cum AS (
      |  SELECT source, v, SUM(n) OVER (PARTITION BY source ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM vc
      |),
      |ex AS (SELECT cum.source, MIN(v) AS exact_p50
      |       FROM cum JOIN sz USING (source)
      |       WHERE c >= (ng + 1) // 2 GROUP BY 1),
      |hb AS (SELECT source, CAST(length(bin(v)) - 1 AS BIGINT) AS b,
      |         SUM(n) AS nb
      |       FROM vc GROUP BY 1, 2),
      |cb AS (
      |  SELECT source, b, SUM(nb) OVER (PARTITION BY source ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM hb
      |),
      |eb AS (SELECT cb.source, MIN(b) AS mb
      |       FROM cb JOIN sz USING (source)
      |       WHERE c >= (ng + 1) // 2 GROUP BY 1),
      |es AS (SELECT source,
      |         ((CAST(1 AS BIGINT) << CAST(mb AS INT))
      |          + (CAST(1 AS BIGINT) << (CAST(mb AS INT) + 1)) - 1) // 2 AS est_p50
      |       FROM eb)
      |SELECT sz.source, ng AS n, exact_p50, est_p50,
      |  (abs(est_p50 - exact_p50) * 1000000) // exact_p50 AS err_ppm
      |FROM sz JOIN ex USING (source) JOIN es USING (source)
      |ORDER BY sz.source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q148_kmeans", q148, Some(q148Sql)),
    QueryDef("q149_containment", q149, Some(q149Sql)),
    QueryDef("q150_ngram_novelty", q150, Some(q150Sql)),
    QueryDef("q151_touch_attribution", q151, Some(q151Sql)),
    QueryDef("q152_mixture_drift", q152, Some(q152Sql)),
    QueryDef("q153_covisitation", q153, Some(q153Sql)),
    QueryDef("q154_collocations", q154, Some(q154Sql)),
    QueryDef("q155_cms_audit", q155, Some(q155Sql)),
    QueryDef("q156_burst_hours", q156, Some(q156Sql)),
    QueryDef("q157_surprisal", q157, Some(q157Sql)),
    QueryDef("q158_gap_histogram", q158, Some(q158Sql)),
    QueryDef("q159_decayed_popularity", q159, Some(q159Sql)),
    QueryDef("q160_triangles", q160, Some(q160Sql)),
    QueryDef("q161_lexical_health", q161, Some(q161Sql)),
    QueryDef("q162_length_median", q162, Some(q162Sql)))
}
