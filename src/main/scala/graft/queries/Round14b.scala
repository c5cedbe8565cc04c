package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Clustering, Dedup, Drift, TextStats, TimeSeries}

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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q148_kmeans", q148, Some(q148Sql)),
    QueryDef("q149_containment", q149, Some(q149Sql)),
    QueryDef("q150_ngram_novelty", q150, Some(q150Sql)),
    QueryDef("q151_touch_attribution", q151, Some(q151Sql)),
    QueryDef("q152_mixture_drift", q152, Some(q152Sql)),
    QueryDef("q153_covisitation", q153, Some(q153Sql)),
    QueryDef("q154_collocations", q154, Some(q154Sql)),
    QueryDef("q155_cms_audit", q155, Some(q155Sql)),
    QueryDef("q156_burst_hours", q156, Some(q156Sql)))
}
