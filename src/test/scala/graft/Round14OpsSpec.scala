package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --------------------------------- weighted systematic sample (q131)
  test("systematicWeightedSample: exactly k picks, weight-proportional, multiplicity") {
    val docs = Seq(
      (1L, 10L), (2L, 0L), (3L, 1L), (4L, 89L) // total W = 100
    ).toDF("doc_id", "w")
    val out = graft.ops.Splits.systematicWeightedSample(
        docs, k = 10, weight = col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // Σ n_picks is ALWAYS k (systematic resampling invariant)
    assert(out.map(_._3).sum === 10L)
    // a zero-weight row can never be picked
    assert(!out.exists(_._1 == 2L))
    // doc 4 holds 89% of the mass at step W/k = 10 → picked ≥ 8 times
    val heavy = out.find(_._1 == 4L).get
    assert(heavy._3 >= 8L)
    // weights echo the input
    assert(out.find(_._1 == 4L).get._2 === 89L)
  }

  test("systematicWeightedSample: repartition-stable and uniform-weight ≡ one pick each") {
    val docs = (1L to 20L).map(i => (i, 5L)).toDF("doc_id", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Splits.systematicWeightedSample(df, k = 20, weight = col("w"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val rows = run(docs)
    // equal weights, k = n → every row picked exactly once
    assert(rows.map(_._1) === (1L to 20L).toArray)
    assert(rows.forall(_._2 == 1L))
    assert(run(docs.repartition(7)) === rows)
  }

  test("systematicWeightedSample: all-zero weights yield an empty sample") {
    val docs = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "w")
    assert(graft.ops.Splits.systematicWeightedSample(
      docs, k = 5, weight = col("w")).count() === 0L)
  }

  // ------------------------------------- normalized dedup (q132)
  test("normalizedExactDedup: case/punct/whitespace variants collapse, min-id survivor") {
    val docs = Seq(
      (1L, "Hello, World!  How are you?"),
      (2L, "hello world how are you"),      // same canonical form as 1, 3
      (3L, "HELLO WORLD -- how ARE you."),
      (4L, "entirely different text here"),
      (5L, "entirely  different\ttext here") // ws-collapse twin of 4
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.normalizedExactDedup(docs)
      .select("doc_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out === Array((1L, 3L), (4L, 2L)))
  }

  // ------------------------------------- funnel lineage (q133)
  test("funnelLineage: every doc gets exactly one stage, precedence respected") {
    val base = "the quick brown fox jumps over the lazy dog today"
    // source A: 3 docs, cap 2 → highest-hash doc capped; the admitted
    // pair are exact twins → one exact_dup. source B: near-dup pair +
    // one clean doc. Scores: synthetic words score via the hashed
    // classifier; we only assert structural properties, not which
    // specific doc lands low_quality.
    val docs = Seq(
      (1L, base, "A"),                               // exact twin of 2
      (2L, base, "A"),
      (3L, base + " extra words appended here", "A"), // near-dup of 1/2
      (10L, "red green blue yellow purple orange pink gray colors list", "B"),
      (11L, "red green blue yellow purple orange pink gray colors lists", "B"),
      (12L, "completely unrelated content about different things entirely", "C")
    ).toDF("doc_id", "text", "source")
    val out = graft.ops.Lineage.funnelLineage(docs, capK = 2,
        maxJaccardDist = 0.5, scoreThreshold = Long.MinValue)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // exactly one disposition per input doc
    assert(out.map(_._1) === Array(1L, 2L, 3L, 10L, 11L, 12L))
    val stages = out.toMap
    // threshold Long.MinValue means nothing is low_quality
    assert(!out.exists(_._2 == "low_quality"))
    // only source A exceeds the cap: exactly one of {1,2,3} is capped
    assert(out.count(_._2 == "capped") === 1)
    assert(Set(1L, 2L, 3L).contains(out.find(_._2 == "capped").get._1))
    // A's two admitted docs: one survives, one is a dup — exact_dup if
    // the twins {1,2} were both admitted, near_dup otherwise
    val aAdmitted = out.filter(t => t._1 <= 3L && t._2 != "capped").map(_._2).sorted
    assert(aAdmitted === Array("exact_dup", "kept") ||
      aAdmitted === Array("kept", "near_dup"))
    // B under cap: near-dup pair resolves to min-id survivor
    assert(stages(10L) === "kept" && stages(11L) === "near_dup")
    assert(stages(12L) === "kept")
  }

  test("funnelLineage + funnelReport: rollup counts match the lineage frame") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "A"),
      (2L, "alpha beta gamma delta epsilon zeta", "A"),
      (3L, "one two three four five six seven", "B")
    ).toDF("doc_id", "text", "source")
    val lin = graft.ops.Lineage.funnelLineage(docs, capK = 5,
      scoreThreshold = Long.MinValue)
    val rep = graft.ops.Lineage.funnelReport(docs, lin)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rep(("A", "exact_dup")) === 1L)
    assert(rep(("A", "kept")) === 1L)
    assert(rep(("B", "kept")) === 1L)
    assert(rep.values.sum === 3L)
  }

  // ------------------------------------- skew audit (q136)
  test("skewKeyAudit: flags only keys above factor×mean, with ppm share and salts") {
    // key 1: 60 rows, keys 2..11: 4 rows each → total 100, 11 keys,
    // mean ≈ 9.09; factor 1.2 → threshold ≈ 10.9: only key 1 flagged
    val rows = Seq.fill(60)(1L) ++ (2L to 11L).flatMap(k => Seq.fill(4)(k))
    val df = rows.toDF("k")
    val out = graft.ops.SkewJoin.skewKeyAudit(df, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array((1L, 60L, 600000L, 7L))) // 60·11/100 = 6.6 → 7 salts
  }

  test("skewKeyAudit: uniform keys yield an empty report") {
    val df = (1L to 10L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    assert(graft.ops.SkewJoin.skewKeyAudit(df, "k").count() === 0L)
  }

  // ------------------------- per-group systematic sample (q137)
  test("systematicWeightedSamplePerGroup: k picks per group, independent lines") {
    val docs = Seq(
      (1L, 10L, "A"), (2L, 90L, "A"),            // A: heavy doc 2
      (10L, 5L, "B"), (11L, 5L, "B"), (12L, 5L, "B") // B: uniform
    ).toDF("doc_id", "w", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Splits.systematicWeightedSamplePerGroup(
          df, k = 3, weight = col("w"), groupCol = "source")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
    val rows = run(docs)
    // Σ n_picks = k within EVERY group
    assert(rows.filter(_._1 == "A").map(_._3).sum === 3L)
    assert(rows.filter(_._1 == "B").map(_._3).sum === 3L)
    // A's 90% doc takes ≥ 2 of A's 3 slots; B uniform → one pick each
    assert(rows.find(t => t._1 == "A" && t._2 == 2L).get._3 >= 2L)
    assert(rows.filter(_._1 == "B").map(_._3).toSet === Set(1L))
    assert(run(docs.repartition(5)) === rows)
  }

  // ------------------------------- length truncation (q138)
  test("truncateAtLengthPercentile: exact cap, slice content, flags") {
    val docs = (1L to 10L).map(i =>
      (i, (1L to i).map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    // lengths 1..10, pct 80/100 → cap = 8th smallest = 8 tokens
    val out = graft.ops.TextStats.truncateAtLengthPercentile(
        docs, pctNum = 80L, pctDen = 100L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getString(4)))
    assert(out.map(_._2) === (1L to 10L).toArray)
    assert(out.map(_._3) === Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 8L, 8L))
    assert(out.map(_._4) === Array(false, false, false, false, false,
      false, false, false, true, true))
    // truncated docs keep exactly their first cap tokens
    assert(out(9)._5 === (1L to 8L).map(j => s"w$j").mkString(" "))
    // untruncated docs round-trip their single-spaced text
    assert(out(4)._5 === (1L to 5L).map(j => s"w$j").mkString(" "))
  }

  // ------------------------------------- dedup provenance (q140)
  test("dupProvenance: exact, direct and transitive evidence kinds") {
    // 30-token docs; 2 differs from 1 in the LAST token (dist 2/29),
    // 3 differs from 2 in the FIRST token (dist 2/29 vs 2), but 3 vs 1
    // differs in both ends (dist 4/30 > threshold 0.1) — so cluster
    // {1,2,3} has a verified pair (1,2) but only a CHAIN to 3.
    val w = (1 to 30).map(i => s"w$i")
    val d1 = w.mkString(" ")
    val d2 = (w.dropRight(1) :+ "x30").mkString(" ")
    val d3 = ("y1" +: w.drop(1).dropRight(1) :+ "x30").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d1))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.dupProvenance(docs, maxJaccardDist = 0.1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getString(3)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._4)) ===
      Array((2L, 1L, "direct"), (3L, 1L, "transitive"), (4L, 1L, "exact")))
    assert(out(0)._3 === Some(1.0 - 27.0 / 29.0)) // the verified pair's dist
    assert(out(1)._3 === None)                    // no pairwise evidence
    assert(out(2)._3 === Some(0.0))               // byte-identical twin
  }

  // ------------------------------------- event funnel (q142)
  test("funnelCounts: strict first-occurrence ORDER, not mere membership") {
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)), // full chain
      (2L, "click", t(1)), (2L, "view", t(2)), (2L, "purchase", t(3)), // click BEFORE view
      (3L, "view", t(1)), (3L, "purchase", t(2)), (3L, "click", t(3)), // purchase before click
      (4L, "click", t(1))                                              // never viewed
    ).toDF("user_id", "event_type", "ts")
    val out = graft.ops.TimeSeries.funnelCounts(
        ev, Seq("view", "click", "purchase"))
      .orderBy("stage").collect().map(r => (r.getString(0), r.getLong(1)))
    // u2's click precedes their first view — an unordered count would
    // say 2 clicks and 2 purchases; the ordered chain says 2 and 1
    assert(out === Array(("1_view", 3L), ("2_click", 2L), ("3_purchase", 1L)))
  }

  test("cohortRetention: first-week cohorts with exact week offsets") {
    import java.sql.Timestamp
    // 2024-01-01 is a Monday; day d (0-based) at noon
    def t(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    val ev = Seq(
      (1L, t(0)), (1L, t(8)),   // cohort wk0, active wk0 and wk1
      (2L, t(1)),               // cohort wk0, active wk0 only
      (3L, t(8)), (3L, t(9))    // cohort wk1, active wk1 (two events, one week)
    ).toDF("user_id", "ts")
    val out = graft.ops.TimeSeries.cohortRetention(ev)
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out === Array(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  // ------------------------------------- curriculum packing (q145)
  test("curriculum phases: terciles partition the corpus by exact quality rank") {
    val docs = (1L to 9L).map(i =>
      (i, (1L to (i * 5)).map(j => s"tok$j").mkString(" "))).toDF("doc_id", "text")
    val ranked = graft.ops.Ranks.exactGroupRank(
      docs.withColumn("__g", lit(1)), "__g", "doc_id",
      graft.ops.TextStats.qualityScore(col("text")))
    val phased = graft.ops.Ranks.withQuantileBucket(ranked, "__g", 3)
      .select("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 9 docs → exactly 3 per tercile, every doc in exactly one phase
    assert(phased.length === 9)
    assert(phased.groupBy(_._2).view.mapValues(_.length).toMap ===
      Map(0L -> 3, 1L -> 3, 2L -> 3))
  }

  // ------------------------------------- cross-modal dedup (q146)
  test("deduplicateCrossModal: text-only OR image-only match both collapse") {
    // 1 and 2: heavy text overlap (near-dup by MinHash), different
    // byte histograms are unlikely but irrelevant — the text edge
    // connects them. 3 and 4: disjoint vocabularies (no text edge at
    // 0.4) but IDENTICAL byte multisets (anagram payloads) → phash
    // Hamming 0 connects them.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " tail"),
      (3L, "abc def"),
      (4L, "fed cba"), // same bytes as 3 reordered → identical histogram
      (5L, "zz qq rr ss tt uu vv ww xx yy zz2 qq2 rr2 ss2")
    ).toDF("doc_id", "text")
    val kept = graft.ops.Multimodal.deduplicateCrossModal(spark, docs,
        maxJaccardDist = 0.4, maxHamming = 0)
      .select("doc_id").as[Long].collect().sorted
    // {1,2} collapse via text, {3,4} via imagery, 5 survives alone
    assert(kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L) && !kept.contains(4L))
    assert(kept.contains(5L))
  }

  // ------------------------------------- event paths (q147)
  test("topEventPaths: consecutive triples with deterministic tie order") {
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    val ev = Seq(
      (1L, 1L, "a", t(1)), (2L, 1L, "b", t(2)), (3L, 1L, "c", t(3)),
      (4L, 1L, "d", t(4)), // user 1 paths: abc, bcd
      (5L, 2L, "a", t(1)), (6L, 2L, "b", t(2)), (7L, 2L, "c", t(3)),
      // same-ts tie for user 3: event_id breaks it → path xyz not xzy
      (8L, 3L, "x", t(1)), (9L, 3L, "y", t(2)), (10L, 3L, "z", t(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.ops.TimeSeries.topEventPaths(ev, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // abc twice (users 1, 2); then bcd and xyz once, path-ordered
    assert(out === Array(
      ("a", "b", "c", 2L), ("b", "c", "d", 1L), ("x", "y", "z", 1L)))
  }

  // ------------------------------------- quantized knn (q69/q135)
  test("quantizedKnn: rank 1 is the query vector itself") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.quantizedKnn(emb, queryId = 0L, k = 3)
      .orderBy("rk").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.head === ((1, 0L)))
    assert(out.map(_._2) === Array(0L, 1L, 2L))
  }
}
