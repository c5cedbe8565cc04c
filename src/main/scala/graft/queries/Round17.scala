package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Round-17 battery additions: the unigram-LM Viterbi tokenizer
  * completing the WordPiece/BPE family (q200), the three-detector
  * cross-signal dedup (q201), the stored-PQ-codebook increment path
  * (q202), the dataset-card release diff (q203), and the
  * three-tokenizer fertility comparison (q204). All
  * reference-scope-none LLM-pipeline extensions (SURVEY §8).
  */
object Round17 {

  // ---------------------------------------------------------------- q200
  /** Unigram-LM VITERBI segmentation ([[graft.text.UnigramLm]]):
    * minimum-cost subword segmentation under integer surprisal piece
    * costs (the q157 `length(bin(x))` bit-trick family), packed
    * lexicographic (cost, pieces) DP so ties are deterministic —
    * the SentencePiece inference step, third tokenizer family beside
    * greedy WordPiece (q104) and trained BPE (q113). The oracle
    * replays the FULL pipeline: vocab + char-fallback inventory,
    * char-stream counts off the distinct-token frame, the surprisal
    * table, and the per-word DP as a level-per-position recursive CTE
    * carrying the best[] vector (MIN over predecessors via a
    * correlated aggregate over the non-recursive span-match table —
    * the q184 fold stance, never `list_reduce`). */
  private def q200(s: SparkSession, dir: String): DataFrame =
    graft.text.UnigramLm.unigramStats(Tables.documents(s, dir), vocabN = 10)
      .orderBy("doc_id")

  /** Shared CTE block (q200/q204): piece inventory + surprisal costs
    * + per-word Viterbi replay ending in `uperword(tok, packed)`
    * (packed = cost·2²⁰ + pieces; NULL = UNK) plus the
    * `uwords(doc_id, tok)` stream. */
  /** The shared unigram-LM corpus frames (word counts, char total,
    * word stream, distinct tokens) — emitted ONCE per query,
    * referenced by any number of [[unigramVocabCtes]] size blocks. */
  private[queries] val unigramSharedCtes =
    """ucounts AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents)
      |  WHERE length(tok) > 0 GROUP BY tok
      |),
      |utot AS (SELECT CAST(SUM(cnt * length(tok)) AS BIGINT) AS n FROM ucounts),
      |uwords AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
      |  FROM documents
      |),
      |udwords AS (SELECT DISTINCT tok FROM uwords)""".stripMargin

  /** One unigram-LM inventory size as oracle CTEs, size-dependent
    * names suffixed `$p` (q221 sweeps four sizes): top-`n` pieces +
    * char fallbacks → integer surprisal costs → piece matrix →
    * Viterbi DP walk → `uperword$p(tok, packed)`. */
  private[queries] def unigramVocabCtes(p: String, n: Int): String =
    s"""uvocab$p AS (
       |  SELECT tok AS piece, cnt FROM ucounts ORDER BY cnt DESC, tok LIMIT $n
       |),
       |uchars$p AS (
       |  SELECT DISTINCT unnest(list_transform(range(length(piece)),
       |    i -> substr(piece, CAST(i AS INT) + 1, 1))) AS piece FROM uvocab$p
       |),
       |uccnt$p AS (
       |  SELECT c.ch AS piece, CAST(SUM(c.cnt) AS BIGINT) AS cnt FROM (
       |    SELECT substr(t.tok, CAST(u.i AS INT) + 1, 1) AS ch, t.cnt
       |    FROM ucounts t, UNNEST(range(length(t.tok))) AS u(i)) c
       |  JOIN uchars$p v ON v.piece = c.ch
       |  GROUP BY c.ch
       |),
       |upieces$p AS (
       |  SELECT piece, MAX(cnt) AS cnt FROM (
       |    SELECT piece, cnt FROM uvocab$p UNION ALL SELECT piece, cnt FROM uccnt$p)
       |  GROUP BY piece
       |),
       |ucost$p AS (
       |  SELECT p.piece, CAST(length(bin(t.n // p.cnt)) AS BIGINT) AS surp
       |  FROM upieces$p p CROSS JOIN utot t
       |),
       |upm$p AS (
       |  SELECT d.tok, CAST(u.j AS BIGINT) AS jpos,
       |    CAST(u.j AS BIGINT) + length(p.piece) AS ipos,
       |    p.surp * 1048576 + 1 AS addp
       |  FROM udwords d, UNNEST(range(length(d.tok))) AS u(j), ucost$p p
       |  WHERE length(p.piece) <= length(d.tok) - CAST(u.j AS BIGINT)
       |    AND substr(d.tok, CAST(u.j AS INT) + 1, length(p.piece)) = p.piece
       |),
       |uwalk$p AS (
       |  SELECT tok, CAST(0 AS BIGINT) AS i, [CAST(0 AS BIGINT)] AS best
       |  FROM udwords
       |  UNION ALL
       |  SELECT w.tok, w.i + 1,
       |    list_append(w.best,
       |      (SELECT MIN(w.best[CAST(p.jpos AS INT) + 1] + p.addp)
       |       FROM upm$p p WHERE p.tok = w.tok AND p.ipos = w.i + 1))
       |  FROM uwalk$p w WHERE w.i < length(w.tok)
       |),
       |uperword$p AS (
       |  SELECT tok, best[CAST(length(tok) AS INT) + 1] AS packed
       |  FROM uwalk$p WHERE i = length(tok)
       |)""".stripMargin

  private[queries] val unigramPerwordCtes =
    s"$unigramSharedCtes,\n${unigramVocabCtes("", 10)}"

  private val q200Sql =
    s"""WITH RECURSIVE
       |$unigramPerwordCtes
       |SELECT w.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 1
       |                ELSE p.packed % 1048576 END) AS BIGINT) AS n_pieces,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unk_words,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 0
       |                ELSE p.packed // 1048576 END) AS BIGINT) AS cost_bits
       |FROM uwords w JOIN uperword p USING (tok)
       |GROUP BY w.doc_id
       |ORDER BY w.doc_id""".stripMargin

  // ---------------------------------------------------------------- q201
  /** THREE-detector cross-signal dedup ([[graft.ops.Multimodal
    * .deduplicateCrossSignal]]): q146's MinHash-text ∪ phash-imagery
    * edges plus the q166 WINNOWING overlap edges (the
    * exact-guarantee detector that catches partial containment both
    * others dilute away), ONE connected-components pass — the
    * OR-composition the q195 agreement audit licenses. Oracle: the
    * q146 recursive component search with the q166 fingerprint CTEs
    * replayed over the exact-survivor frame unioned in as a third
    * edge set. */
  private def q201(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.deduplicateCrossSignal(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  private val q201Sql =
    s"""WITH RECURSIVE
       |exact0 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
       |kept_exact AS (
       |  SELECT d.doc_id, d.lang, d.text FROM documents d JOIN exact0 e USING (doc_id)
       |),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM kept_exact
       |),
       |grams AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(len(t) - 2),
       |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
       |  FROM toks WHERE len(t) >= 3
       |),
       |tpairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
       |  WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |      / (CAST(len(a.g) + len(b.g) AS DOUBLE)
       |         - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
       |),
       |${Round13.phashPairCtes("kept_exact")},
       |${Round15.winnowPairCtes("kept_exact", "wn")},
       |allp AS (
       |  SELECT doc_a, doc_b FROM tpairs
       |  UNION
       |  SELECT asset_a, asset_b FROM hp WHERE hamming <= 1
       |  UNION
       |  SELECT doc_a, doc_b FROM wnp
       |),
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM allp
       |  UNION ALL SELECT doc_b, doc_a FROM allp
       |),
       |reach AS (
       |  SELECT DISTINCT s AS id, s AS lab FROM edges
       |  UNION
       |  SELECT e.d AS id, r.lab FROM reach r JOIN edges e ON e.s = r.id
       |),
       |comp AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id),
       |losers AS (SELECT id FROM comp WHERE id <> cluster)
       |SELECT doc_id, lang FROM kept_exact
       |WHERE doc_id NOT IN (SELECT id FROM losers)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q202
  /** STORED PQ codebook round-trip ([[graft.ops.Similarity.savePq]] /
    * [[graft.ops.Similarity.loadPq]] / [[graft.ops.Similarity
    * .encodePq]]): fit codebooks on the base corpus (vec_id % 5 ≠ 0),
    * freeze them to parquet, reload, and encode the INCREMENT
    * (vec_id % 5 = 0) against the frozen frame — the compression
    * rung's q194 maintenance stance (q185 fits inline every run;
    * production encodes daily batches against a stored codebook, or
    * every previously-written code silently changes meaning). The
    * oracle replays the seeded-medoid pick over the BASE subset and
    * the increment's integer assignment — any drift in the stored
    * frame (or a refit sneaking in) changes codes and fails the
    * hash. */
  private def q202(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val inc = emb.filter(col("vec_id") % 5 === 0)
    val books = graft.ops.Similarity.fitPqBooks(base, m = 8, nCodes = 16)
    val pqDir = Round11.freshScratchDirShared("graft_q202_pq")
    graft.ops.Similarity.savePq(books, pqDir)
    val stored = graft.ops.Similarity.loadPq(s, pqDir)
    graft.ops.Similarity.encodePq(inc, stored)
  }

  private val q202Sql = {
    val slice8 = (v: String) =>
      s"$v[CAST(ss.s * 8 + 1 AS INT):CAST(ss.s * 8 + 8 AS INT)]"
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |base AS (SELECT * FROM q WHERE vec_id % 5 <> 0),
       |inc AS (SELECT * FROM q WHERE vec_id % 5 = 0),
       |ss AS (SELECT CAST(u.s AS BIGINT) AS s FROM UNNEST(range(0, 8)) AS u(s)),
       |med AS (
       |  SELECT qv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM base
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |books AS (
       |  SELECT ss.s, m.code, ${slice8("m.qv")} AS cv FROM med m, ss),
       |sub AS (
       |  SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv FROM inc a, ss)
       |SELECT vec_id, s AS subspace, code FROM (
       |  SELECT sub.vec_id, sub.s, b.code,
       |    ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |      ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |  FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |ORDER BY vec_id, subspace""".stripMargin
  }

  // ---------------------------------------------------------------- q203
  /** DATASET-CARD DIFF ([[graft.ops.DatasetCard.cardDiff]]): the
    * q197 datasheet computed per snapshot half (even vs odd doc ids
    * standing in for last-week/this-week, the q152 convention),
    * full-outer joined with per-stat integer deltas — the
    * release-over-release drift gate a weekly refresh reviews.
    * Oracle: the parameterized q197 card SQL replayed over both
    * halves plus the COALESCE-to-0 delta arithmetic. */
  private def q203(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    graft.ops.DatasetCard.cardDiff(
      d.filter(col("doc_id") % 2 === 0),
      d.filter(col("doc_id") % 2 === 1))
  }

  private val q203Sql =
    s"""WITH olddocs AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
       |newdocs AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
       |ca AS (${Round16.cardSql("olddocs")}),
       |cb AS (${Round16.cardSql("newdocs")})
       |SELECT COALESCE(ca.stat, cb.stat) AS stat,
       |  CAST(COALESCE(ca.value, 0) AS BIGINT) AS value_old,
       |  CAST(COALESCE(cb.value, 0) AS BIGINT) AS value_new,
       |  CAST(COALESCE(cb.value, 0) - COALESCE(ca.value, 0) AS BIGINT)
       |    AS delta
       |FROM ca FULL OUTER JOIN cb ON ca.stat = cb.stat
       |ORDER BY stat""".stripMargin

  // ---------------------------------------------------------------- q204
  /** THREE-tokenizer FERTILITY table: WordPiece (q104), trained BPE
    * (q113) and unigram-LM Viterbi (q200) pieces-per-word by
    * language, side by side — the q134 per-language fertility read
    * extended into the family-selection table ("which tokenizer pays
    * the fewest pieces per word on each language slice?"). One
    * map-only pass per tokenizer over the same word stream, joined
    * per doc, one lang rollup. The oracle replays ALL THREE piece
    * machines — greedy longest-match walk, 6-round merge training,
    * and the Viterbi DP — in a single WITH RECURSIVE. */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val wp = graft.text.Subword.subwordStats(docs, vocabN = 10)
      .select(col("doc_id"), col("n_pieces").as("__wp"))
    val bpe = graft.text.Bpe.bpeStats(docs, k = 6)
      .select(col("doc_id"), col("n_words").as("__nw"),
        col("n_pieces").as("__bp"))
    val uni = graft.text.UnigramLm.unigramStats(docs, vocabN = 10)
      .select(col("doc_id"), col("n_pieces").as("__up"))
    wp.join(bpe, "doc_id").join(uni, "doc_id")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum("__nw").as("n_words"), sum("__wp").as("wp_pieces"),
        sum("__bp").as("bpe_pieces"), sum("__up").as("uni_pieces"))
      .withColumn("wp_fertility_ppm",
        expr("(CAST(wp_pieces AS decimal(38,0)) * 1000000) div n_words"))
      .withColumn("bpe_fertility_ppm",
        expr("(CAST(bpe_pieces AS decimal(38,0)) * 1000000) div n_words"))
      .withColumn("uni_fertility_ppm",
        expr("(CAST(uni_pieces AS decimal(38,0)) * 1000000) div n_words"))
      .orderBy("lang")
  }

  private val q204Sql =
    s"""WITH RECURSIVE
       |${Round12.subwordPerwordCtes},
       |${Round13.bpePerwordCtes},
       |$unigramPerwordCtes,
       |perdoc AS (
       |  SELECT w.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS nw,
       |    CAST(SUM(p.np) AS BIGINT) AS wp,
       |    CAST(SUM(CASE WHEN length(w.tok) = 0 THEN 0 ELSE f.np END)
       |      AS BIGINT) AS bp,
       |    CAST(SUM(CASE WHEN u.packed IS NULL THEN 1
       |                  ELSE u.packed % 1048576 END) AS BIGINT) AS up
       |  FROM words w
       |    JOIN perword p USING (tok)
       |    LEFT JOIN fin f ON w.tok = f.tok
       |    JOIN uperword u ON u.tok = w.tok
       |  GROUP BY w.doc_id
       |)
       |SELECT d.lang,
       |  CAST(SUM(nw) AS BIGINT) AS n_words,
       |  CAST(SUM(wp) AS BIGINT) AS wp_pieces,
       |  CAST(SUM(bp) AS BIGINT) AS bpe_pieces,
       |  CAST(SUM(up) AS BIGINT) AS uni_pieces,
       |  CAST(CAST(SUM(wp) AS HUGEINT) * 1000000
       |       // CAST(SUM(nw) AS HUGEINT) AS BIGINT) AS wp_fertility_ppm,
       |  CAST(CAST(SUM(bp) AS HUGEINT) * 1000000
       |       // CAST(SUM(nw) AS HUGEINT) AS BIGINT) AS bpe_fertility_ppm,
       |  CAST(CAST(SUM(up) AS HUGEINT) * 1000000
       |       // CAST(SUM(nw) AS HUGEINT) AS BIGINT) AS uni_fertility_ppm
       |FROM perdoc p JOIN documents d USING (doc_id)
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  // ---------------------------------------------------------------- q205
  /** ADC top-k RETRIEVAL over stored PQ codes ([[graft.ops.Similarity
    * .adcTopK]]): the compression rung's QUERY path — q185 audits the
    * recall cost, q202 freezes and encodes, this retrieves: one
    * m×nCodes LUT against the stored codebook, m lookups per
    * candidate, top-10 by exact integer asymmetric distance. The
    * oracle replays codebook, assignment, LUT and the ranked sum. */
  private def q205(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val books = graft.ops.Similarity.fitPqBooks(emb, m = 8, nCodes = 16)
    val pqDir = Round11.freshScratchDirShared("graft_q205_pq")
    graft.ops.Similarity.savePq(books, pqDir)
    val stored = graft.ops.Similarity.loadPq(s, pqDir)
    val codes = graft.ops.Similarity.encodePq(emb, stored)
    val qv = graft.ops.Similarity.probeVector(emb, 0L)
    graft.ops.Similarity.adcTopK(codes, stored, qv, k = 10)
  }

  private val q205Sql = {
    val slice8 = (v: String) =>
      s"$v[CAST(ss.s * 8 + 1 AS INT):CAST(ss.s * 8 + 8 AS INT)]"
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |ss AS (SELECT CAST(u.s AS BIGINT) AS s FROM UNNEST(range(0, 8)) AS u(s)),
       |med AS (
       |  SELECT qv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |books AS (
       |  SELECT ss.s, m.code, ${slice8("m.qv")} AS cv FROM med m, ss),
       |sub AS (
       |  SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv FROM q a, ss),
       |asgn AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |),
       |pq AS (SELECT qv AS pqv FROM q WHERE vec_id = 0),
       |lut AS (
       |  SELECT b.s AS s, b.code,
       |    ${Round16.d2Sql("pq.pqv[CAST(b.s * 8 + 1 AS INT):CAST(b.s * 8 + 8 AS INT)]", "b.cv")} AS qd2
       |  FROM books b, pq
       |),
       |adc AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM asgn a JOIN lut l ON l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id
       |)
       |SELECT rank, vec_id, adc_d2 FROM (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc_d2, vec_id) AS BIGINT)
       |    AS rank, vec_id, adc_d2
       |  FROM adc) WHERE rank <= 10
       |ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------- q206
  /** IVF+ADC retrieval ([[graft.ops.Similarity.ivfAssign]] ∘
    * [[graft.ops.Similarity.encodePq]] ∘ [[graft.ops.Similarity
    * .adcTopK]]) — the Jégou'11 IVFADC production index assembled
    * from this engine's own rungs: route the query to its nProbe=4
    * nearest of 16 seeded-medoid cells, PQ-encode ONLY the probed
    * cells' members, rank them by the m-lookup asymmetric distance.
    * The scan touches nProbe/nCents of the corpus as m-byte codes —
    * neither the full corpus nor any raw vector. Every stage is
    * integer and the oracle replays all of them end to end. */
  private def q206(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Similarity
    val emb = Tables.embeddings(s, dir)
    val asg = Similarity.ivfAssign(emb, nCents = 16, nProbe = 4)
    val probeCells = asg.filter(col("vec_id") === 0)
      .select(explode(col("probes")).as("cell"))
    val candIds = asg.join(broadcast(probeCells), Seq("cell"), "left_semi")
      .select("vec_id")
    val candEmb = emb.join(candIds, Seq("vec_id"), "left_semi")
    val books = Similarity.fitPqBooks(emb, m = 8, nCodes = 16)
    val codes = Similarity.encodePq(candEmb, books)
    val qv = Similarity.probeVector(emb, 0L)
    Similarity.adcTopK(codes, books, qv, k = 10)
  }

  private val q206Sql = {
    val slice8 = (v: String) =>
      s"$v[CAST(ss.s * 8 + 1 AS INT):CAST(ss.s * 8 + 8 AS INT)]"
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |cent AS (
       |  SELECT qv AS cqv,
       |    ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |      AS cent_id
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |rk_ad AS (
       |  SELECT a.vec_id AS vid, a.qv, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${Round16.d2Sql("a.qv", "c.cqv")}, c.cent_id) AS rk
       |  FROM q a CROSS JOIN cent c
       |),
       |cells AS (SELECT vid, cent_id FROM rk_ad WHERE rk = 1),
       |pcells AS (SELECT cent_id FROM rk_ad WHERE vid = 0 AND rk <= 4),
       |cand AS (
       |  SELECT c.vid FROM cells c JOIN pcells p ON c.cent_id = p.cent_id),
       |ss AS (SELECT CAST(u.s AS BIGINT) AS s FROM UNNEST(range(0, 8)) AS u(s)),
       |med AS (
       |  SELECT qv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |books AS (
       |  SELECT ss.s, m.code, ${slice8("m.qv")} AS cv FROM med m, ss),
       |sub AS (
       |  SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv
       |  FROM q a JOIN cand ON cand.vid = a.vec_id, ss),
       |asgn AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |),
       |pq AS (SELECT qv AS pqv FROM q WHERE vec_id = 0),
       |lut AS (
       |  SELECT b.s AS s, b.code,
       |    ${Round16.d2Sql("pq.pqv[CAST(b.s * 8 + 1 AS INT):CAST(b.s * 8 + 8 AS INT)]", "b.cv")} AS qd2
       |  FROM books b, pq
       |),
       |adc AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM asgn a JOIN lut l ON l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id
       |)
       |SELECT rank, vec_id, adc_d2 FROM (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc_d2, vec_id) AS BIGINT)
       |    AS rank, vec_id, adc_d2
       |  FROM adc) WHERE rank <= 10
       |ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------- q207
  /** STORED unigram vocab round trip ([[graft.text.UnigramLm
    * .saveVocab]] / `loadVocab`): fit the q200 inventory, persist it
    * as the (piece, surprisal) artifact, reload, and segment — the
    * q117 stored-tokenizer stance for the unigram family. Same
    * oracle as q200: the storage hop must be semantically
    * invisible. */
  private def q207(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val fitted = graft.text.UnigramLm.fit(docs, vocabN = 10)
    val vDir = Round11.freshScratchDirShared("graft_q207_unigram")
    graft.text.UnigramLm.saveVocab(fitted, vDir, s)
    val loaded = graft.text.UnigramLm.loadVocab(s, vDir)
    graft.text.UnigramLm.unigramStatsWith(docs, loaded).orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q208
  /** L-DIVERSITY audit ([[graft.ops.Privacy.lDiversity]]): per
    * (source, len-bucket) cohort, distinct sensitive-value count,
    * determinized dominant value + exact ppm share, 0/1 `≥ l`
    * verdict — the homogeneity-attack check q187's k-anonymity
    * ladder cannot express (k identical rows still leak a shared
    * sensitive value). Oracle: two grouped rollups + the
    * max→filter→min argmax replay. */
  private def q208(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.lDiversity(Tables.documents(s, dir), l = 2L)

  private val q208Sql =
    """WITH b AS (
      |  SELECT source, n_chars // 100 AS len_bucket, lang AS sv
      |  FROM documents
      |),
      |bysv AS (
      |  SELECT source, len_bucket, sv, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM b GROUP BY 1, 2, 3
      |),
      |coh AS (
      |  SELECT source, len_bucket,
      |    CAST(SUM(c) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) AS BIGINT) AS n_sensitive,
      |    CAST(MAX(c) AS BIGINT) AS mc
      |  FROM bysv GROUP BY 1, 2
      |)
      |SELECT k.source, k.len_bucket, k.n_docs, k.n_sensitive,
      |  MIN(s.sv) AS top_value,
      |  (k.mc * 1000000) // k.n_docs AS top_share_ppm,
      |  CAST(CASE WHEN k.n_sensitive >= 2 THEN 1 ELSE 0 END AS BIGINT)
      |    AS l_diverse
      |FROM coh k JOIN bysv s
      |  ON s.source = k.source AND s.len_bucket = k.len_bucket
      |  AND s.c = k.mc
      |GROUP BY k.source, k.len_bucket, k.n_docs, k.n_sensitive, k.mc
      |ORDER BY k.source, k.len_bucket""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q200_unigram_lm", q200, Some(q200Sql)),
    QueryDef("q207_stored_unigram", q207, Some(q200Sql)),
    QueryDef("q208_l_diversity", q208, Some(q208Sql)),
    QueryDef("q201_cross_signal_dedup", q201, Some(q201Sql)),
    QueryDef("q202_stored_pq_encode", q202, Some(q202Sql)),
    QueryDef("q203_card_diff", q203, Some(q203Sql)),
    QueryDef("q204_tokenizer_fertility", q204, Some(q204Sql)),
    QueryDef("q205_adc_knn", q205, Some(q205Sql)),
    QueryDef("q206_ivf_adc_knn", q206, Some(q206Sql)))
}
