package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Document chunking for training-data pipelines: fixed-size token
  * windows with overlap (the standard pre-tokenization split for
  * context-window-bounded training). Map-only: one generator row per
  * chunk via posexplode over computed window starts — no shuffle, no
  * UDF, linear in corpus size.
  */
object Chunking {

  /** Split each document into chunks of `chunkSize` tokens advancing
    * by `chunkSize - overlap`; emits (id, chunk_idx, chunk_text,
    * n_chunk_tokens). Documents shorter than one step still produce
    * chunk 0. `carryCols` ride through the generator so per-document
    * metadata needs no join-back (a join would re-scan — and possibly
    * recompute — the document frame). */
  def chunkByTokens(docs: DataFrame, chunkSize: Int = 50, overlap: Int = 10,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    require(chunkSize > overlap && overlap >= 0)
    val step = chunkSize - overlap
    val carry = carryCols.map(col)
    val toks = docs
      .select(Seq(col(idCol), TextStats.tokens(col(textCol)).as("toks")) ++ carry: _*)
      .withColumn("starts",
        sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(step)))
    toks
      .select(Seq(col(idCol), col("toks")) ++ carry :+
        posexplode(col("starts")).as(Seq("chunk_idx", "start")): _*)
      .select(Seq(
        col(idCol),
        col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkSize))).as("chunk_text"),
        size(slice(col("toks"), col("start") + 1, lit(chunkSize))).cast(LongType)
          .as("n_chunk_tokens")) ++ carry: _*)
  }

  /** CCNet-style boilerplate removal at chunk granularity: split every
    * document into aligned `chunkTokens`-token chunks, count each
    * distinct chunk text's document frequency across the corpus, drop
    * chunks appearing in more than `maxDocFreq` documents, and
    * reassemble the surviving chunks in order. This is the
    * within-document cousin of exact dedup — repeated headers,
    * licenses, and navigation boilerplate shared by many pages get cut
    * while the unique prose stays. Emits one row per document:
    * (id, n_chunks, n_removed, clean_text) — clean_text is '' when
    * everything was boilerplate.
    *
    * Scale shape: chunking is the same map-only generator as
    * [[chunkByTokens]]; document frequency is one hash-partitioned
    * groupBy with map-side combine; the boilerplate set (df >
    * threshold) is orders of magnitude smaller than the corpus, so
    * AQE turns the anti-join into a broadcast probe; reassembly
    * aggregates per document — collect_list is bounded by
    * tokens-per-document, never corpus-sized. */
  def removeFrequentChunks(docs: DataFrame, chunkTokens: Int = 20,
      maxDocFreq: Long = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1 && maxDocFreq >= 1)
    val chunks = chunkByTokens(docs, chunkSize = chunkTokens, overlap = 0,
        idCol = idCol, textCol = textCol)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"))
    val boilerplate = chunks.groupBy("chunk_text")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select("chunk_text")
    val kept = chunks.join(boilerplate, Seq("chunk_text"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          e => e("chunk_text"))).as("clean_text"))
    chunks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        (col("n_chunks") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** CONTENT-DEFINED CHUNKING (the Rabin/FastCDC family, token
    * granularity): cut AFTER every token whose replayable codepoint
    * hash ([[Classifier.tokenHash]], the same fold the winnowing and
    * classifier oracles replay) satisfies `h mod 2^maskBits = 0` —
    * expected chunk length 2^maskBits tokens. Boundaries are a pure
    * per-token property, which buys the one thing [[chunkByTokens]]'s
    * fixed windows cannot have: SHIFT ROBUSTNESS. Inserting or
    * deleting one token re-cuts ONLY the chunk it lands in; every
    * other chunk's content is bit-identical, so chunk-level dedup
    * still matches the unedited remainder of a re-crawled page
    * (fixed-size chunking re-frames everything after the edit —
    * the metamorphic spec pins exactly this difference). The classic
    * storage-dedup design (Muthitacharoen et al. LBFS SOSP'01,
    * FastCDC ATC'16); min/max chunk-length clamps are the sequential
    * refinement production CDC adds — deliberately omitted here
    * because they reintroduce cross-token state (a scan), while the
    * pure predicate keeps the operator one map-side window over
    * doc-bounded partitions, embarrassingly parallel at any corpus
    * size. Each chunk carries its token count and an
    * order-independent multiset fingerprint (Σ token hashes — chunks
    * are position-delimited, so equal fingerprint + length is the
    * dedup join key). Returns (doc_id, chunk_idx, start_pos,
    * n_tokens, hash_sum). */
  def contentDefinedChunks(docs: DataFrame, maskBits: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maskBits >= 1 && maskBits <= 20)
    val mask = 1L << maskBits
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > lit(0))
    docs
      .select(col(idCol).as("doc_id"), toks.as("__t"))
      .filter(size(col("__t")) >= 1)
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("__pos", "__tok")))
      .withColumn("__h", Classifier.tokenHash(col("__tok")))
      // a boundary token ENDS its chunk: chunk index = boundaries
      // strictly before this position (doc-bounded window partitions)
      .withColumn("chunk_idx", coalesce(sum(
          when(col("__h") % mask === 0, 1L).otherwise(0L)).over(
          Window.partitionBy("doc_id").orderBy("__pos")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(min(col("__pos")).cast("long").as("start_pos"),
        count(lit(1)).as("n_tokens"),
        sum(col("__h")).as("hash_sum"))
  }

  /** CHUNK-LEVEL DEDUP over [[contentDefinedChunks]] — the consumer
    * the CDC fingerprints exist for (LBFS SOSP'01's actual use case):
    * two documents share a chunk when they contain an identical
    * boundary-delimited token span, and because CDC boundaries are
    * shift-robust, an edited RE-CRAWL still matches every chunk the
    * edit did not land in (the end-to-end metamorphic property,
    * Round16OpsSpec) — where fixed windows would re-frame everything
    * after the edit. The join key is the per-chunk
    * (hash_sum, n_tokens) multiset fingerprint; a doc's repeated
    * chunks count once (DISTINCT per doc, the containment
    * convention); keys appearing in more than `maxDf` docs are
    * dropped before the pair join — the [[Winnowing.overlapPairs]]
    * df-cap guard, because a boilerplate chunk (license header,
    * nav bar) otherwise contributes df² pairs of no dedup value.
    * `containment_ppm` = shared·10⁶ div min(|keys_a|, |keys_b|), so
    * a doc fully contained in a larger one scores 10⁶ — the
    * re-crawl / superset-page signal.
    *
    * Shape at scale: chunking is map-side over doc-bounded windows;
    * the posting join shuffles on the chunk key with per-key cost
    * df² ≤ maxDf² — output-pair-bound like winnowing, never corpus².
    *
    * Returns (doc_a, doc_b, n_shared, n_a, n_b, containment_ppm),
    * doc_a < doc_b, ordered by (doc_a, doc_b). */
  def chunkDedupPairs(docs: DataFrame, maskBits: Int = 5,
      maxDf: Long = 64L, minShared: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxDf >= 2L && minShared >= 1L)
    val keys = contentDefinedChunks(docs, maskBits, idCol, textCol)
      .select(col("doc_id"), col("n_tokens"), col("hash_sum")).distinct()
    val cnts = keys.groupBy("doc_id").agg(count(lit(1)).as("__nk"))
    val rare = keys.groupBy("n_tokens", "hash_sum")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("n_tokens", "hash_sum")
    val posting = keys.join(rare, Seq("n_tokens", "hash_sum"))
    val pairs = posting.select(col("n_tokens"), col("hash_sum"),
        col("doc_id").as("doc_a"))
      .join(posting.select(col("n_tokens"), col("hash_sum"),
        col("doc_id").as("doc_b")), Seq("n_tokens", "hash_sum"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(cnts.select(col("doc_id").as("doc_a"), col("__nk").as("n_a")),
        Seq("doc_a"))
      .join(cnts.select(col("doc_id").as("doc_b"), col("__nk").as("n_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        expr("(n_shared * 1000000) div least(n_a, n_b)").as("containment_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** CLAMPED content-defined chunking — [[contentDefinedChunks]]
    * with the min/max chunk-length refinement production CDC systems
    * add (FastCDC ATC'16): a hash boundary is HONORED only once the
    * running chunk has at least `minLen` tokens, and a cut is FORCED
    * at `maxLen` tokens even without a boundary — bounding chunk-size
    * variance (pure-predicate CDC is geometric: lots of tiny chunks,
    * a long tail of huge ones), which is what storage dedup needs for
    * fixed-size container packing. The price is exactly what the
    * unclamped scaladoc warns about: the cut decision becomes
    * SEQUENTIAL cross-token state (each cut depends on the previous
    * cut's position), so the per-doc computation is an ordered fold —
    * expressed as one Catalyst `aggregate` HOF over the doc's
    * (position, hash) array: still a pure map-side pass, still
    * embarrassingly parallel ACROSS docs, with the sequential scan
    * confined to a single doc-bounded array the way the DP in
    * [[Dedup.editDistancePairs]] is confined to a single pair. The
    * fold appends to the accumulator's cut list (O(cuts) copy per
    * append ⇒ O(tokens·cuts) per doc worst case — doc-bounded, and
    * cuts ≤ tokens/minLen by the clamp itself). Chunk lengths land in
    * [minLen, maxLen] except the final partial chunk (≤ maxLen, may
    * be short); with minLen = 1 and maxLen ≥ doc length the clamps
    * never bind and the output EQUALS [[contentDefinedChunks]]
    * (Round16OpsSpec pins both). Clamps also weaken shift robustness
    * from "one chunk" to "until the next honored boundary re-syncs" —
    * the documented FastCDC trade. The oracle replays the scan as a
    * cut-to-cut recursive CTE (see q184's scaladoc for why not a SQL
    * fold), bit-for-bit equal on every cut.
    *
    * Returns (doc_id, chunk_idx, start_pos, n_tokens, hash_sum). */
  def contentDefinedChunksClamped(docs: DataFrame, maskBits: Int = 5,
      minLen: Int = 8, maxLen: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maskBits >= 1 && maskBits <= 20)
    require(minLen >= 1 && maxLen >= minLen)
    val mask = 1L << maskBits
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > lit(0))
    val base = docs
      .select(col(idCol).as("doc_id"), toks.as("__t"))
      .filter(size(col("__t")) >= 1)
      .withColumn("__items", transform(col("__t"),
        (t, i) => struct(i.cast(LongType).as("p"),
          Classifier.tokenHash(t).as("h"))))
    // ordered fold: acc = (last cut position, cut list); a cut at p
    // ends its chunk (the unclamped convention), chunk length = p−last
    val folded = base.withColumn("__cuts",
      aggregate(col("__items"),
        struct(lit(-1L).as("p"), typedLit(Seq.empty[Long]).as("cuts")),
        (acc, x) => {
          val cut = (x("p") - acc("p") >= minLen &&
            x("h") % mask === 0) || (x("p") - acc("p") >= maxLen)
          when(cut, struct(x("p").as("p"),
              concat(acc("cuts"), array(x("p"))).as("cuts")))
            .otherwise(struct(acc("p").as("p"), acc("cuts").as("cuts")))
        })("cuts"))
    folded
      .select(col("doc_id"), col("__cuts"),
        posexplode(col("__items")).as(Seq("__i", "__x")))
      .select(col("doc_id"), col("__x.p").as("__pos"), col("__x.h").as("__h"),
        size(filter(col("__cuts"), c => c < col("__x.p")))
          .cast(LongType).as("chunk_idx"))
      .groupBy("doc_id", "chunk_idx")
      .agg(min(col("__pos")).as("start_pos"),
        count(lit(1)).as("n_tokens"),
        sum(col("__h")).as("hash_sum"))
  }

  /** Masking helpers: deterministic regex scrubbing (emails, URLs,
    * digit runs) with per-doc match counts — the shape of PII
    * redaction in a cleaning pipeline. */
  def maskPattern(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  def countPattern(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast(LongType)

  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlPattern = "https?://[^\\s]+"
  val digitRunPattern = "[0-9]+"
}
