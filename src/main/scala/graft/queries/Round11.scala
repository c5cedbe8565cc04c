package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Dedup

/** Round-11 battery additions. */
object Round11 {

  /** Per-run unique scratch dir for the stored-index demos (q90/q97).
    * A FIXED path under java.io.tmpdir let concurrent sessions on a
    * shared host clobber each other's index mid-read (mode(overwrite)
    * deletes the directory another session may be scanning); a unique
    * dir per call removes the race. Deletion can't happen inside the
    * query fn — the returned DataFrame reads the dir lazily, after fn
    * returns — so cleanup is a one-time JVM shutdown hook over every
    * dir this session minted. */
  private val scratchDirs =
    scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.synchronized(scratchDirs.foreach { p =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case _: Throwable => () }
      })))
  private def freshScratchDir(prefix: String): String = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.synchronized(scratchDirs += p)
    p.toString
  }
  /** Round13's stored-index demos share this session-scoped scratch
    * machinery (one shutdown hook, one dir registry). */
  private[queries] def freshScratchDirShared(prefix: String): String =
    freshScratchDir(prefix)

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
  /** q90's battery cost deliberately includes a full index build+save
    * each run (the demo — same stance as q75's bucketed write). The
    * bench records the two phases separately so the steady-state read
    * path (load + increment, ~the q87 delta) stays visible
    * round-over-round instead of drowning in the save cost:
    * returns (buildSaveSec, loadIncrementSec). */
  def q90PhaseTimings(s: SparkSession, dir: String): (Double, Double) = {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val idxDir = freshScratchDir("graft_q90_phase")
    val t0 = System.nanoTime()
    val built = Dedup.indexCorpus(corpus)
    try Dedup.saveIndex(s, built, idxDir, table = "graft_q90_phase_band_rows")
    finally built.unpersistAll()
    val t1 = System.nanoTime()
    val stored = Dedup.loadIndex(s, idxDir, table = "graft_q90_phase_band_rows")
    Dedup.incrementalDeduplicateIndexed(batch, stored, maxJaccardDist = 0.4)
      .count()
    val t2 = System.nanoTime()
    ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }

  private def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val idxDir = freshScratchDir("graft_q90_index")
    val built = Dedup.indexCorpus(corpus)
    try Dedup.saveIndex(s, built, idxDir, table = "graft_q90_band_rows")
    finally built.unpersistAll()
    val stored = Dedup.loadIndex(s, idxDir, table = "graft_q90_band_rows")
    Dedup.incrementalDeduplicateIndexed(batch, stored, maxJaccardDist = 0.4)
      .select("doc_id", "lang").orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q91
  /** Corpus-statistics document scoring ([[graft.ops.TextStats
    * .unigramFamiliarity]]): the integer-exact stand-in for the
    * KenLM-perplexity gate of C4/CCNet-style pipelines — per document,
    * how corpus-frequent its token occurrences are, plus its
    * rare-token mass. Two aggregates and one token-keyed join; every
    * value BIGINT, so the oracle hash-matches at any partitioning. */
  private def q91(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.unigramFamiliarity(Tables.documents(s, dir))
      .orderBy("doc_id")

  private val q91Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
      |  FROM documents
      |),
      |freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
      |SELECT doc_id,
      |  COUNT(*) AS n_tok,
      |  CAST(SUM(cnt) AS BIGINT) AS familiarity,
      |  CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      |  CAST(MIN(cnt) AS BIGINT) AS min_count
      |FROM toks JOIN freq USING (tok)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Per-(source, lang) corpus audit: document counts, exact-dup
    * structure, token volume, and span-contamination rollup (via
    * [[graft.ops.Dedup.spanContaminationScores]] against the q89
    * benchmark slice) — the "which feeds are dirty" dashboard a
    * curation pipeline gates releases on. Exercises the documents
    * table's `source` column. Integer-only aggregates. */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val ref = docs.filter(col("doc_id") % 5 === 0)
    val spans = Dedup.spanContaminationScores(corpus, ref, shingleSize = 13)
      .select(col("doc_id"), col("max_span_tokens"))
    corpus
      .join(spans, Seq("doc_id"), "left")
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        sum(graft.ops.TextStats.tokenCount(col("text"))).as("total_tokens"),
        sum(when(col("max_span_tokens").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
        coalesce(max(col("max_span_tokens")), lit(0L)).as("worst_leak_tokens"))
      .orderBy("source", "lang")
  }

  private val q92Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text, lang, source FROM documents WHERE doc_id % 5 <> 0
      |),
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
      |runs AS (SELECT doc_id, grp, COUNT(*) AS run_len FROM r GROUP BY doc_id, grp),
      |per_doc AS (
      |  SELECT doc_id, MAX(run_len) + 12 AS max_span FROM runs GROUP BY doc_id
      |)
      |SELECT c.source, c.lang,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT c.text) AS n_distinct_texts,
      |  CAST(SUM(len(regexp_split_to_array(c.text, '\s+'))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
      |  CAST(COALESCE(MAX(p.max_span), 0) AS BIGINT) AS worst_leak_tokens
      |FROM corpus c LEFT JOIN per_doc p ON c.doc_id = p.doc_id
      |GROUP BY c.source, c.lang
      |ORDER BY c.source, c.lang""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Multimodal perceptual-hash dup groups ([[graft.ops.Multimodal
    * .perceptualHash]]): difference-hash signatures over the binary
    * payloads, grouped to dedup candidates (signature, multiplicity,
    * min-id representative) — the image near-dup layer a multimodal
    * curation pipeline runs where the text funnel runs fingerprints.
    * Oracle: DuckDB rebuilds the byte histogram from hex nibbles (the
    * q44 technique — `% 16` IS the low nibble) and replays the
    * neighbor-comparison bit construction integer-exactly. */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val assets = graft.ops.Multimodal.packAsAssets(Tables.documents(s, dir))
    graft.ops.Multimodal.perceptualHash(s, assets).toDF()
      .groupBy("phash")
      .agg(count(lit(1)).as("n_assets"), min("asset_id").as("keep_id"))
      .filter(col("n_assets") >= 2)
      .orderBy("phash")
  }

  private val q93Sql =
    """WITH h AS (
      |  SELECT doc_id AS asset_id, lower(to_hex(encode(text))) AS hx,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents
      |),
      |counts AS (
      |  SELECT asset_id,
      |         strpos('0123456789abcdef', substr(hx, CAST(2*i AS INTEGER), 1)) - 1 AS bin,
      |         COUNT(*) AS c
      |  FROM (SELECT asset_id, hx, unnest(range(1, n + 1)) AS i FROM h) u
      |  GROUP BY 1, 2
      |),
      |bins AS (
      |  SELECT h.asset_id, g.bin, COALESCE(c.c, 0) AS c
      |  FROM h CROSS JOIN (SELECT unnest(range(16)) AS bin) g
      |  LEFT JOIN counts c ON c.asset_id = h.asset_id AND c.bin = g.bin
      |),
      |bits AS (
      |  SELECT a.asset_id, a.bin, CASE WHEN a.c > b.c THEN 1 ELSE 0 END AS bit
      |  FROM bins a JOIN bins b
      |    ON a.asset_id = b.asset_id AND b.bin = (a.bin + 1) % 16
      |),
      |ph AS (
      |  SELECT asset_id,
      |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(bin AS INTEGER))) AS BIGINT) AS phash
      |  FROM bits GROUP BY asset_id
      |)
      |SELECT phash, COUNT(*) AS n_assets, MIN(asset_id) AS keep_id
      |FROM ph GROUP BY phash HAVING COUNT(*) >= 2
      |ORDER BY phash""".stripMargin

  // ---------------------------------------------------------------- q94
  /** SemDeDup-style semantic deduplication ([[graft.ops.Similarity
    * .semanticDeduplicate]]): Voronoi-cell clustering around
    * Knuth-hash-sampled seeds, then greedy lowest-id-survives over
    * within-cell cosine ≥ 0.395 pairs (the q43 demo threshold — the
    * corpus has no true dups, so the loose cut exercises the path).
    * Unlike q22/q43's pair emission, this is the full curation
    * decision: every vector gets a (cluster, kept, dup_of) verdict.
    * Oracle: DuckDB replays the ENTIRE decision bit-for-bit — the
    * HUGEINT Knuth seed draw (q85's technique), the left-to-right
    * squared-distance argmin with (d, cluster) tie order, and the
    * unit-normalize + dot cosine (q43's verified fragment) — so
    * cluster assignment AND the dup verdicts are hash-compared, not
    * just sampled. */
  private def q94(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.semanticDeduplicate(
        Tables.embeddings(s, dir), nClusters = 16, minCosine = 0.395)
      .orderBy("vec_id")

  private val q94Sql =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |         ((CAST(vec_id AS HUGEINT) % 4294967296) * 2654435761)
      |           % 4294967296 AS hv
      |  FROM embeddings
      |),
      |seeds AS (
      |  SELECT v AS c, ROW_NUMBER() OVER (ORDER BY hv, vec_id) - 1 AS cl
      |  FROM v QUALIFY ROW_NUMBER() OVER (ORDER BY hv, vec_id) <= 16
      |),
      |d AS (
      |  SELECT v.vec_id, s.cl,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(len(v.v)), i ->
      |        (v.v[CAST(i+1 AS INTEGER)] - s.c[CAST(i+1 AS INTEGER)]) *
      |        (v.v[CAST(i+1 AS INTEGER)] - s.c[CAST(i+1 AS INTEGER)]))),
      |      (acc, e) -> acc + e) AS dist
      |  FROM v CROSS JOIN seeds s
      |),
      |assign AS (
      |  SELECT vec_id, cl AS cluster
      |  FROM d QUALIFY ROW_NUMBER() OVER (
      |    PARTITION BY vec_id ORDER BY dist, cl) = 1
      |),
      |u AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))),
      |        (acc, e) -> acc + e))) AS unit
      |  FROM embeddings
      |),
      |dup AS (
      |  SELECT bb.vec_id, MIN(aa.vec_id) AS dup_of
      |  FROM assign aa JOIN assign bb
      |    ON aa.cluster = bb.cluster AND aa.vec_id < bb.vec_id
      |  JOIN u ua ON ua.vec_id = aa.vec_id
      |  JOIN u ub ON ub.vec_id = bb.vec_id
      |  WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(len(ua.unit)), i ->
      |        ua.unit[CAST(i+1 AS INTEGER)] * ub.unit[CAST(i+1 AS INTEGER)])),
      |      (acc, e) -> acc + e) >= 0.395
      |  GROUP BY bb.vec_id
      |)
      |SELECT a.vec_id, a.cluster, dup.dup_of IS NULL AS kept, dup.dup_of
      |FROM assign a LEFT JOIN dup ON a.vec_id = dup.vec_id
      |ORDER BY a.vec_id""".stripMargin

  // ---------------------------------------------------------------- q95
  /** Corpus-internal duplicated-text fraction ([[graft.ops.Dedup
    * .duplicatedSpanFraction]]): per document, the fraction of token
    * positions covered by a 13-gram occurring ≥2 times corpus-wide —
    * the Lee et al. repeated-substring metric that scores boilerplate
    * INSIDE kept documents, where q16/q31/q55 only decide whole-doc
    * keep/drop and q89 needs an external benchmark set. Oracle: DuckDB
    * rebuilds positional grams (raw gram text vs the engine's xxhash64
    * — the documented collision tradeoff, same stance as q89) and
    * replays the interval-union island construction and the one double
    * division exactly. */
  private def q95(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpanFraction(Tables.documents(s, dir),
        shingleSize = 13, minOccurrences = 2)
      .orderBy("doc_id")

  private val q95Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
      |gr AS (
      |  SELECT doc_id, i AS pos, array_to_string(t[i+1:i+13], ' ') AS g
      |  FROM t, UNNEST(range(greatest(len(t) - 12, 0))) AS u(i)
      |),
      |hot AS (SELECT g FROM gr GROUP BY g HAVING COUNT(*) >= 2),
      |m AS (SELECT DISTINCT doc_id, pos FROM gr JOIN hot USING (g)),
      |isl AS (
      |  SELECT doc_id, pos, pos + 12 AS e,
      |    CASE WHEN pos > COALESCE(MAX(pos + 12) OVER (
      |      PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      -9223372036854775807) + 1
      |    THEN 1 ELSE 0 END AS ni
      |  FROM m
      |),
      |isl2 AS (
      |  SELECT doc_id, pos, e, SUM(ni) OVER (
      |    PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM isl
      |),
      |cov AS (
      |  SELECT doc_id, island, MAX(e) - MIN(pos) + 1 AS covered
      |  FROM isl2 GROUP BY doc_id, island
      |),
      |per AS (
      |  SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS dup_tokens,
      |    COUNT(*) AS n_dup_spans
      |  FROM cov GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  CAST(len(regexp_split_to_array(d.text, '\s+')) AS BIGINT) AS n_tokens,
      |  COALESCE(p.dup_tokens, 0) AS dup_tokens,
      |  COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
      |  CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE) /
      |    CAST(len(regexp_split_to_array(d.text, '\s+')) AS DOUBLE) AS dup_fraction
      |FROM documents d LEFT JOIN per p USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q96
  /** CCNet-style frequent-chunk boilerplate removal ([[graft.ops
    * .Chunking.removeFrequentChunks]]): aligned 20-token chunks, drop
    * any chunk text appearing in more than 2 distinct documents,
    * reassemble the survivors — the within-document cleaning pass that
    * cuts shared headers/licenses while whole-doc dedup (q16) keeps or
    * drops entire documents. Oracle: DuckDB rebuilds the aligned
    * chunking ((len+19)//20 chunks, inclusive-slice join), the
    * distinct-doc frequency, and the ordered string_agg reassembly. */
  private def q96(s: SparkSession, dir: String): DataFrame =
    graft.ops.Chunking.removeFrequentChunks(Tables.documents(s, dir),
        chunkTokens = 20, maxDocFreq = 2)
      .orderBy("doc_id")

  private val q96Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
      |c AS (
      |  SELECT doc_id, i AS cidx,
      |    array_to_string(t[CAST(i*20+1 AS INTEGER):CAST(i*20+20 AS INTEGER)], ' ') AS chunk
      |  FROM t, UNNEST(range(greatest((len(t)+19)//20, 1))) AS u(i)
      |),
      |fdf AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM c GROUP BY chunk),
      |kept AS (
      |  SELECT c.doc_id, c.cidx, c.chunk
      |  FROM c JOIN fdf USING (chunk) WHERE fdf.df <= 2
      |),
      |re AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |    string_agg(chunk, ' ' ORDER BY cidx) AS clean_text
      |  FROM kept GROUP BY doc_id
      |),
      |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id)
      |SELECT tot.doc_id, tot.n_chunks,
      |  tot.n_chunks - COALESCE(re.n_kept, 0) AS n_removed,
      |  COALESCE(re.clean_text, '') AS clean_text
      |FROM tot LEFT JOIN re USING (doc_id)
      |ORDER BY tot.doc_id""".stripMargin

  // ---------------------------------------------------------------- q97
  /** Exact-IVF kNN against a STORED index ([[graft.ops.Similarity
    * .saveIvf]]/[[graft.ops.Similarity.loadIvf]]): identical probe
    * semantics to q42, but the fitted index is round-tripped through
    * parquet partitioned by ivf_list — the amortized production path
    * where a query session reads 4 of N list directories instead of
    * re-clustering the corpus (partition pruning is plan-asserted in
    * the spec; the save cost paid each run is the demo's, same stance
    * as q75/q90). Oracle: q42's brute-force ground truth — the
    * storage hop must be semantically invisible. */
  private def q97(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val qvec = graft.ops.Similarity.probeVector(emb, 0L)
    val (indexed, model) = graft.ops.Similarity.fitIvf(emb, nLists = 16)
    val idxDir = freshScratchDir("graft_q97_ivf")
    graft.ops.Similarity.saveIvf(indexed, model, idxDir)
    val (stored, storedModel) = graft.ops.Similarity.loadIvf(s, idxDir)
    graft.ops.Similarity.exactIvfKnn(stored, storedModel, qvec, k = 20,
        nProbe0 = 4)
      .select(col("rank").as("rk"), col("vec_id"))
  }

  // ---------------------------------------------------------------- q98
  /** Span-level contamination EXCISION ([[graft.ops.Dedup
    * .exciseContaminatedSpans]]): q89's benchmark-leak detection
    * turned into the surgical fix — remove exactly the leaked token
    * positions, keep the document. Same corpus/benchmark split as
    * q89. Oracle: DuckDB rebuilds positional grams, expands matched
    * grams to covered token positions, anti-joins them out of the
    * posexploded token stream, and replays the ordered reassembly. */
  private def q98(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val ref = docs.filter(col("doc_id") % 5 === 0)
    Dedup.exciseContaminatedSpans(corpus, ref, shingleSize = 13)
      .orderBy("doc_id")
  }

  private val q98Sql =
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
      |cov AS (
      |  SELECT DISTINCT doc_id, pos + j AS tpos
      |  FROM m, UNNEST(range(13)) AS v(j)
      |),
      |tk AS (
      |  SELECT doc_id, i AS tpos, t[CAST(i+1 AS INTEGER)] AS tok
      |  FROM ct, UNNEST(range(len(t))) AS u(i)
      |),
      |kept AS (
      |  SELECT tk.doc_id, tk.tpos, tk.tok
      |  FROM tk LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.tpos = cov.tpos
      |  WHERE cov.doc_id IS NULL
      |),
      |re AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY tpos) AS clean_text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT c.doc_id,
      |  CAST(len(regexp_split_to_array(c.text, '\s+')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_split_to_array(c.text, '\s+')) - COALESCE(re.n_kept, 0)
      |    AS BIGINT) AS removed_tokens,
      |  COALESCE(re.clean_text, '') AS clean_text
      |FROM corpus c LEFT JOIN re USING (doc_id)
      |ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------- q99
  /** Temperature-weighted mixture resampling ([[graft.ops.Splits
    * .temperatureMixtureSample]]): keep-fractions computed from corpus
    * statistics — source s keeps min(1, budget·√n_s / Σ√n / n_s) of
    * its docs, the α=0.5 multinomial flattening training blends use —
    * with the same pure-function-of-the-id hash-cell membership as
    * q66. Oracle: DuckDB recomputes counts, folds √n in source-name
    * order via list_reduce (matching the engine's driver-side
    * left-to-right fold), replays the threshold arithmetic with
    * identical parenthesization, and applies the HUGEINT Knuth-hash
    * cell rule. */
  private def q99(s: SparkSession, dir: String): DataFrame =
    graft.ops.Splits.temperatureMixtureSample(Tables.documents(s, dir),
        budgetDocs = 250, alpha = 0.5)
      .select("doc_id", "source")
      .orderBy("doc_id")

  private val q99Sql =
    """WITH n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      |w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM n),
      |s AS (
      |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list(w ORDER BY source)), (acc, e) -> acc + e) AS sw
      |  FROM w
      |),
      |th AS (
      |  SELECT source,
      |    CAST(floor(LEAST(1.0,
      |      ((250.0 * w) / (SELECT sw FROM s)) / CAST(n AS DOUBLE))
      |      * 4294967296.0) AS BIGINT) AS th
      |  FROM w
      |)
      |SELECT d.doc_id, d.source
      |FROM documents d JOIN th USING (source)
      |WHERE ((CAST(d.doc_id AS HUGEINT) % 4294967296) * 2654435761)
      |  % 4294967296 < th.th
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q100
  /** Cross-source duplication matrix ([[graft.ops.Dedup
    * .crossSourceDupMatrix]]): q31's near-dup pairs rolled up per
    * canonical source pair — within-feed duplication on the diagonal,
    * mirror/syndication signal off it. Oracle: q31's exact all-pairs
    * Jaccard replay joined to each side's source, LEAST/GREATEST
    * canonicalization, grouped; min(jaccard_dist) hash-matches
    * because both sides aggregate the identical pair set with the
    * identical replayed distances. */
  private def q100(s: SparkSession, dir: String): DataFrame =
    Dedup.crossSourceDupMatrix(Tables.documents(s, dir),
        shingleSize = 3, bands = 10, rowsPerBand = 5, maxJaccardDist = 0.4)
      .orderBy("src_lo", "src_hi")

  private val q100Sql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
      |),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(t) - 2),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM toks WHERE len(t) >= 3
      |),
      |p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) AS d
      |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
      |  WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
      |)
      |SELECT LEAST(sa.source, sb.source) AS src_lo,
      |  GREATEST(sa.source, sb.source) AS src_hi,
      |  COUNT(*) AS n_pairs, MIN(d) AS closest_dist
      |FROM p
      |JOIN documents sa ON sa.doc_id = p.da
      |JOIN documents sb ON sb.doc_id = p.db
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q101
  /** The composed curation VERDICT: one row per document with the
    * keep/drop decision and the first failing rule — the Gopher-style
    * policy gate a pipeline actually runs, built by composing the
    * oracle-green signal operators (q15 token counts, q17 quality,
    * q63 repetition, q95 duplicated-span fraction, round 12's q105
    * hashed-linear-classifier score, and — round 13 — the q114
    * semantic-decontamination flag over the 1:1-aligned embeddings
    * table). Rule order is the contract: contaminated → too_short →
    * too_long → low_quality → repetitive → duplicated → classifier —
    * eval-integrity drops precede quality gates, because a leaked
    * benchmark document must never be "rescued" by good quality;
    * `reason` is null iff kept. Every signal expression is already
    * replayed bit-exactly by its own oracle, so the CASE precedence
    * is the only new logic the q101 oracle adds. Benchmark docs
    * themselves (doc_id % 25 = 0, the q114 probe set) carry a null
    * bench_cos — they are the benchmark, not leaks of it. */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextStats
    val docs = Tables.documents(s, dir)
    val base = docs.select(col("doc_id"),
      TextStats.tokenCount(col("text")).as("n_tokens"),
      TextStats.qualityScore(col("text")).as("quality"),
      graft.ops.Classifier.hashedLinearScore(col("text")).as("clf_score"))
    val rep = TextStats.repetitionStats(docs)
      .select(col("doc_id"), col("dup_gram_frac"))
    val dup = Dedup.duplicatedSpanFraction(docs)
      .select(col("doc_id"), col("dup_fraction"))
    val emb = Tables.embeddings(s, dir)
    // flagged set is tiny (≥-threshold survivors only) → broadcast;
    // in-memory index path here, the stored-IVF round trip is q114's
    val flagged = graft.ops.Similarity.benchContamination(
        emb.filter(col("vec_id") % 25 =!= 0),
        emb.filter(col("vec_id") % 25 === 0), minCosine = 0.35)
      .select(col("vec_id").as("doc_id"), col("max_cos").as("bench_cos"))
    base.join(rep, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .join(broadcast(flagged), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        coalesce(col("dup_gram_frac"), lit(0.0)).as("dup_gram_frac"),
        col("dup_fraction"), col("clf_score"), col("bench_cos"))
      .withColumn("reason",
        when(col("bench_cos").isNotNull, "contaminated")
          .when(col("n_tokens") < 20, "too_short")
          .when(col("n_tokens") > 1000, "too_long")
          .when(col("quality") < 0.55, "low_quality")
          .when(col("dup_gram_frac") > 0.10, "repetitive")
          .when(col("dup_fraction") > 0.5, "duplicated")
          .when(col("clf_score") < 0L, "classifier"))
      .withColumn("kept", col("reason").isNull)
      .orderBy("doc_id")
  }

  private val q101Sql = {
    val stops = graft.ops.TextStats.miniStopWords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS tk FROM documents),
       |base AS (
       |  SELECT doc_id,
       |    CAST(len(tk) AS BIGINT) AS n_tokens,
       |    (least(CAST(len(tk) AS DOUBLE) / 50.0, 1.0) * 0.4
       |     + least(CAST(len(list_filter(tk, x -> list_contains($stops, x))) AS DOUBLE) / CAST(len(tk) AS DOUBLE) * 5.0, 1.0) * 0.3
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1) AS quality
       |  FROM t
       |),
       |g AS (
       |  SELECT doc_id,
       |    list_transform(range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2]) AS gr
       |  FROM t WHERE len(tk) >= 2
       |),
       |rep AS (
       |  SELECT doc_id,
       |    CAST(len(gr) - len(list_distinct(gr)) AS DOUBLE) / CAST(len(gr) AS DOUBLE) AS dup_gram_frac
       |  FROM g
       |),
       |pg AS (
       |  SELECT t.doc_id, i AS pos, array_to_string(tk[i+1:i+13], ' ') AS gm
       |  FROM t, UNNEST(range(greatest(len(tk) - 12, 0))) AS u(i)
       |),
       |hot AS (SELECT gm FROM pg GROUP BY gm HAVING COUNT(*) >= 2),
       |m AS (SELECT DISTINCT doc_id, pos FROM pg JOIN hot USING (gm)),
       |isl AS (
       |  SELECT doc_id, pos, pos + 12 AS e,
       |    CASE WHEN pos > COALESCE(MAX(pos + 12) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -9223372036854775807) + 1
       |    THEN 1 ELSE 0 END AS ni
       |  FROM m
       |),
       |isl2 AS (
       |  SELECT doc_id, pos, e, SUM(ni) OVER (
       |    PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl
       |),
       |cov AS (
       |  SELECT doc_id, island, MAX(e) - MIN(pos) + 1 AS covered
       |  FROM isl2 GROUP BY doc_id, island
       |),
       |per AS (SELECT doc_id, SUM(covered) AS dup_tokens FROM cov GROUP BY doc_id),
       |clf AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(list_filter(tk, x -> length(x) > 0), tok ->
       |      ((list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(range(1, length(tok)+1), i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))),
       |        (acc, c) -> (acc * 131 + c) % 1000000007) % 64) * 2654435761) % 4294967296 % 1001 - 500
       |    )) AS BIGINT) AS clf_score
       |  FROM t
       |),
       |uemb AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))),
       |        (acc, e) -> acc + e))) AS unit
       |  FROM embeddings
       |),
       |scos AS (
       |  SELECT c.vec_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(len(c.unit)), i ->
       |        c.unit[CAST(i+1 AS INTEGER)] * b.unit[CAST(i+1 AS INTEGER)])),
       |      (acc, e) -> acc + e) AS cosine
       |  FROM (SELECT vec_id, unit FROM uemb WHERE vec_id % 25 <> 0) c,
       |       (SELECT unit FROM uemb WHERE vec_id % 25 = 0) b
       |),
       |contam AS (
       |  SELECT vec_id, MAX(cosine) AS bench_cos FROM scos
       |  GROUP BY vec_id HAVING MAX(cosine) >= 0.35
       |),
       |joined AS (
       |  SELECT b.doc_id, b.n_tokens, b.quality,
       |    COALESCE(rep.dup_gram_frac, 0.0) AS dup_gram_frac,
       |    CAST(COALESCE(per.dup_tokens, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) AS dup_fraction,
       |    clf.clf_score, contam.bench_cos
       |  FROM base b
       |  LEFT JOIN rep ON b.doc_id = rep.doc_id
       |  LEFT JOIN per ON b.doc_id = per.doc_id
       |  JOIN clf ON b.doc_id = clf.doc_id
       |  LEFT JOIN contam ON b.doc_id = contam.vec_id
       |)
       |SELECT doc_id, n_tokens, quality, dup_gram_frac, dup_fraction, clf_score, bench_cos,
       |  CASE WHEN bench_cos IS NOT NULL THEN 'contaminated'
       |       WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN n_tokens > 1000 THEN 'too_long'
       |       WHEN quality < 0.55 THEN 'low_quality'
       |       WHEN dup_gram_frac > 0.10 THEN 'repetitive'
       |       WHEN dup_fraction > 0.5 THEN 'duplicated'
       |       WHEN clf_score < 0 THEN 'classifier'
       |  END AS reason,
       |  (CASE WHEN bench_cos IS NOT NULL THEN 'contaminated'
       |       WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN n_tokens > 1000 THEN 'too_long'
       |       WHEN quality < 0.55 THEN 'low_quality'
       |       WHEN dup_gram_frac > 0.10 THEN 'repetitive'
       |       WHEN dup_fraction > 0.5 THEN 'duplicated'
       |       WHEN clf_score < 0 THEN 'classifier'
       |  END) IS NULL AS kept
       |FROM joined
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q102
  /** Corpus vocabulary top-20 (the corpus has 31 distinct tokens — a 20-token vocab keeps OOV non-trivial) ([[graft.ops.TextStats.vocabTopN]]):
    * most frequent tokens with deterministic (count desc, token asc)
    * tie order — planned as TakeOrderedAndProject (bounded per-
    * partition heaps), not a global sort. Oracle: the window
    * spelling. */
  private def q102(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.vocabTopN(Tables.documents(s, dir), n = 20)
      .orderBy("rank")

  private val q102Sql =
    """WITH c AS (
      |  SELECT tok AS token, COUNT(*) AS cnt
      |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY tok
      |)
      |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank, token, cnt
      |FROM c
      |ORDER BY cnt DESC, token
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q103
  /** Per-document OOV rate against the q102 vocabulary ([[graft.ops
    * .TextStats.oovStats]]): the coverage metric that sizes a vocab or
    * flags out-of-domain docs. The 100-row vocab broadcasts to the
    * token stream's anti-join; one id-keyed count after. Oracle:
    * vocab CTE + anti-join + per-doc rollup, one exact double
    * division. */
  private def q103(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.oovStats(Tables.documents(s, dir), n = 20)
      .orderBy("doc_id")

  private val q103Sql =
    """WITH c AS (
      |  SELECT tok AS token, COUNT(*) AS cnt
      |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY tok
      |),
      |v AS (SELECT token FROM c ORDER BY cnt DESC, token LIMIT 20),
      |tk AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
      |  FROM documents
      |),
      |oov AS (
      |  SELECT tk.doc_id, COUNT(*) AS n_oov
      |  FROM tk LEFT JOIN v ON tk.token = v.token
      |  WHERE v.token IS NULL
      |  GROUP BY tk.doc_id
      |)
      |SELECT d.doc_id,
      |  CAST(len(regexp_split_to_array(d.text, '\s+')) AS BIGINT) AS n_tokens,
      |  COALESCE(oov.n_oov, 0) AS n_oov,
      |  CAST(COALESCE(oov.n_oov, 0) AS DOUBLE) /
      |    CAST(len(regexp_split_to_array(d.text, '\s+')) AS DOUBLE) AS oov_frac
      |FROM documents d LEFT JOIN oov ON d.doc_id = oov.doc_id
      |ORDER BY d.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q89_span_decontaminate", q89, Some(q89Sql)),
    QueryDef("q90_stored_index_dedup", q90, Some(Round10.q87SqlForStoredIndex)),
    QueryDef("q91_unigram_familiarity", q91, Some(q91Sql)),
    QueryDef("q92_source_audit", q92, Some(q92Sql)),
    QueryDef("q93_phash_groups", q93, Some(q93Sql)),
    QueryDef("q94_semantic_dedup", q94, Some(q94Sql)),
    QueryDef("q95_dup_span_fraction", q95, Some(q95Sql)),
    QueryDef("q96_boilerplate_chunks", q96, Some(q96Sql)),
    QueryDef("q97_stored_ivf_knn", q97, Some(Pipelines.q42Sql)),
    QueryDef("q98_span_excision", q98, Some(q98Sql)),
    QueryDef("q99_temperature_sample", q99, Some(q99Sql)),
    QueryDef("q100_source_dup_matrix", q100, Some(q100Sql)),
    QueryDef("q101_curation_policy", q101, Some(q101Sql)),
    QueryDef("q102_vocab_topn", q102, Some(q102Sql)),
    QueryDef("q103_oov_rate", q103, Some(q103Sql)))
}
