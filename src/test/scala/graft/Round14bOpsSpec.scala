package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round14bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --------------------------------------------- fixed-point k-means (q148)
  test("kmeans: hand-computed 2-round Lloyd on exactly-representable floats") {
    // components are sums of powers of two, so float→double→·1e6→floor
    // quantizes with NO representation surprises
    val emb = Seq(
      (1L, Array(0f, 0f)),
      (2L, Array(0.25f, 0f)),
      (3L, Array(1f, 1f)),
      (4L, Array(0.75f, 1f))
    ).toDF("vec_id", "embedding")
    // init c0=(0,0) c1=(250000,0); after round 1 c1=(666666,666666);
    // after round 2 c0=(125000,0), c1=(875000,1000000) — every final
    // distance is 125000² = 15_625_000_000
    val out = graft.ops.Clustering.kmeans(emb, k = 2, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out === Array(
      (1L, 0, 15625000000L), (2L, 0, 15625000000L),
      (3L, 1, 15625000000L), (4L, 1, 15625000000L)))
  }

  test("kmeans: centroid mean FLOOR-divides on negatives (not truncation)") {
    // sum = -250000 + 0 + 125000 = -125000, n = 3 →
    // floorDiv(-125000, 3) = -41667 (truncation would say -41666);
    // the (0,) point's final dist² pins the digit: 41667² exactly
    val emb = Seq(
      (1L, Array(-0.25f)), (2L, Array(0f)), (3L, Array(0.125f))
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Clustering.kmeans(emb, k = 1, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out.forall(_._2 == 0))
    assert(out.find(_._1 == 2L).get._3 === 41667L * 41667L)
  }

  test("kmeans: duplicate init points — ties to lower cid, empty cluster carried") {
    // both vectors identical → both argmin-tie to cluster 0; cluster 1
    // goes empty on round 1 and must keep its centroid (no crash, no NaN)
    val emb = Seq((1L, Array(0.5f, 0.5f)), (2L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Clustering.kmeans(emb, k = 2, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out === Array((1L, 0, 0L), (2L, 0, 0L)))
  }

  test("kmeans: partitioning-independent (repartition yields identical rows)") {
    val emb = (1L to 40L).map(i =>
      (i, Array((i % 7).toFloat / 8f, (i % 5).toFloat / 4f, -(i % 3).toFloat / 2f)))
      .toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Clustering.kmeans(df, k = 4, iterations = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(run(emb.repartition(13)) === run(emb))
  }

  // --------------------------------------------- containment pairs (q149)
  test("containmentPairs: excerpt found at 100%, sub-threshold pair dropped") {
    val docs = Seq(
      (1L, "a b c d e"),                    // 3 grams, all inside doc 2
      (2L, "a b c d e f g h i j"),          // 8 grams
      (3L, "x y z w q r"),                  // 4 grams, one shared with 4
      (4L, "x y z k l m")                   // 4 grams: xyz shared → 25% < 80
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.containmentPairs(docs, n = 3, tauPct = 80)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out === Array((1L, 2L, 3L, 8L, 3L, 1000000L)))
  }

  test("containmentPairs: equal set sizes orient small = lower id; ppm floors") {
    val docs = Seq(
      (7L, "a b c d e"),   // 3 grams
      (9L, "a b c d x")    // 3 grams, shares 2 (abc, bcd) → 2/3 = 66% ≥ 60
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.containmentPairs(docs, n = 3, tauPct = 60)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out === Array((7L, 9L, 3L, 666666L)))
  }

  test("containmentPairs: docs under n tokens never pair") {
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.containmentPairs(docs, n = 3, tauPct = 1).count() === 0L)
  }

  // --------------------------------------------- n-gram novelty (q150)
  test("ngramNovelty: exact novel-bigram ppm vs the reference set") {
    val ref = Seq((100L, "a b c"), (101L, "p q")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d"),  // bigrams ab bc cd; ref has ab bc → 1/3 novel
      (2L, "x y"),      // xy → 1/1 novel
      (3L, "p q"),      // pq in ref → 0/1
      (4L, "solo")      // no bigrams → excluded
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.ngramNovelty(docs, ref, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, 3L, 1L, 333333L), (2L, 1L, 1L, 1000000L), (3L, 1L, 0L, 0L)))
  }

  // --------------------------------------------- touch attribution (q151)
  test("touchAttribution: window edges, no-touch conversions, same-ts tie by id") {
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1: clicks at :00 and :10, purchase at :20, late click :50
      (10L, ts(0), 1L, "click"),
      (11L, ts(10), 1L, "click"),
      (12L, ts(20), 1L, "purchase"),
      (13L, ts(50), 1L, "click"),
      // user 2: click 31 min before purchase → outside the 30-min window
      (20L, ts(0), 2L, "click"),
      (21L, ts(31), 2L, "purchase"),
      // user 3: two clicks at the SAME ts as the purchase → ids break the tie
      (31L, ts(5), 3L, "click"),
      (30L, ts(5), 3L, "click"),
      (32L, ts(5), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.TimeSeries.touchAttribution(events)
      .collect().map(r => (r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).sortBy(_._1)
    assert(out === Array(
      (12L, 2L, 10L, 11L),   // first=:00 click, last=:10 click
      (21L, 0L, -1L, -1L),   // outside window → un-attributed
      (32L, 2L, 30L, 31L)))  // same ts: min/max struct falls to event id
  }

  test("touchAttribution: a click exactly windowMinutes before counts (closed window)") {
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, ts(0), 1L, "click"),
      (2L, ts(30), 1L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.TimeSeries.touchAttribution(events).collect()
    assert(out.length === 1 && out(0).getLong(3) === 1L)
  }

  // --------------------------------------------- mixture drift (q152)
  test("mixtureDrift: exact ppm shares, one-sided keys get zero") {
    val a = Seq(("s1", 10L), ("s2", 30L)).toDF("source", "w")
    val b = Seq(("s1", 20L), ("s3", 20L)).toDF("source", "w")
    val out = graft.ops.Drift.mixtureDrift(a, b, "source", col("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out === Array(
      ("s1", 10L, 20L, 250000L, 500000L, 250000L),
      ("s2", 30L, 0L, 750000L, 0L, 750000L),
      ("s3", 0L, 20L, 0L, 500000L, 500000L)))
  }

  test("mixtureDrift: floor ppm (shares need not sum to 1e6) and TVD recovery") {
    val a = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("source", "w") // thirds
    val b = Seq(("x", 3L)).toDF("source", "w")
    val rows = graft.ops.Drift.mixtureDrift(a, b, "source", col("w"))
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(5))).sortBy(_._1)
    assert(rows === Array(
      ("x", 333333L, 666667L), ("y", 333333L, 333333L), ("z", 333333L, 333333L)))
    // TVD ppm = half the drift sum
    assert(rows.map(_._3).sum / 2 === 666666L) // floor artifacts included, exact
  }

  // --------------------------------------------- co-visitation (q153)
  test("coVisitation: distinct-user pair counts, repeat views collapse, total order") {
    val views = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // user 1 sees {10, 20}; repeat ignored
      (2L, 10L), (2L, 20L), (2L, 30L), // user 2: {10, 20, 30}
      (3L, 20L), (3L, 30L)             // user 3: {20, 30}
    ).toDF("user_id", "item")
    val out = graft.ops.CoOccurrence.coVisitation(views, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (10,20)=2 users, (20,30)=2, (10,30)=1 — ties rank by (item_a, item_b)
    assert(out === Array((10L, 20L, 2L), (20L, 30L, 2L), (10L, 30L, 1L)))
  }

  test("coVisitation: k truncates under the deterministic order") {
    val views = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("user_id", "item")
    val out = graft.ops.CoOccurrence.coVisitation(views, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((1L, 2L), (1L, 3L))) // all count 1 → first two pairs
  }

  // --------------------------------------------- collocations (q154)
  test("collocations: exact stream counts and integer lift ppm") {
    // stream: "a b" ×3 plus separators; N = 8 tokens,
    // n(a)=3, n(b)=3, n(a,b)=3 → lift = 3·8·1e6 // 9 = 2_666_666
    val docs = Seq("a b x", "a b y", "a b").toDF("text")
    val out = graft.ops.CoOccurrence.collocations(docs, k = 5, minCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out === Array(("a", "b", 3L, 3L, 3L, 2666666L)))
  }

  test("collocations: blank split artifacts never count as tokens") {
    val docs = Seq("  a  b ", "a b").toDF("text") // leading/multi spaces
    val out = graft.ops.CoOccurrence.collocations(docs, k = 5, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5)))
    // N = 4, n(a)=n(b)=2, pair=2 → lift = 2·4·1e6 // 4 = 2_000_000
    assert(out === Array(("a", "b", 2L, 2000000L)))
  }

  // --------------------------------------------- count-min audit (q155)
  test("cmsTopVocabAudit: hand-computed collision — estimates exact, overcount visible") {
    // H('a')=97, H('b')=98, H('c')=99; d=1 row (a=3, b=7), w=2:
    // bucket(a) = (97·3+7) % 2 = 0, bucket(b) = 1, bucket(c) = 0 →
    // 'c' collides with 'a': cell0 = 3+1 = 4, cell1 = 1
    val docs = Seq("a a a b c").toDF("text")
    val out = graft.ops.CountMinSketch.cmsTopVocabAudit(docs, topN = 3, d = 1, w = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      ("a", 3L, 4L, 1L), ("b", 1L, 1L, 0L), ("c", 1L, 4L, 3L)))
  }

  test("cmsTopVocabAudit: CMS never undercounts (n_cms ≥ n_exact), any (d, w)") {
    val docs = (1 to 50).map(i => s"t${i % 7} t${i % 11} t${i % 13}").toDF("text")
    val out = graft.ops.CountMinSketch.cmsTopVocabAudit(docs, topN = 13, d = 3, w = 8)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  // --------------------------------------------- burst detection (q156)
  test("burstHours: trailing-mean cross-multiply flags the spike, not the baseline") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val rows = // type x: 1,1,1 events in hours 0-2, then 10 in hour 3
      (Seq(ts(0, 1), ts(1, 1), ts(2, 1)) ++ (0 until 10).map(m => ts(3, m)))
        .map(t => (t, "x")) ++
      Seq((ts(0, 5), "y"), (ts(1, 5), "y")) // type y: flat, never flags
    val events = rows.zipWithIndex.map { case ((t, ty), i) => (i.toLong, t, ty) }
      .toDF("event_id", "ts", "event_type")
    val out = graft.ops.TimeSeries.burstHours(events, factorPct = 150)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // only x@hour3: 10 events vs w_n=3/w_sum=3 → 10·3·100 > 150·3
    assert(out === Array(("x", 10L, 3L, 3L)))
  }

  test("burstHours: the first observed hour has no baseline and cannot flag") {
    val events = Seq((1L, Timestamp.valueOf("2026-01-01 00:00:00"), "x"))
      .toDF("event_id", "ts", "event_type")
    assert(graft.ops.TimeSeries.burstHours(events, factorPct = 100).count() === 0L)
  }

  // ------------------------------------------------- surprisal (q157)
  test("surprisalScore: hand-computed bit-trick log2, per-100 floor division") {
    // corpus: n(a)=2, n(b)=2, n(c)=1, N=5
    // s(a) = floor(log2(5 div 2)) = 1; s(b) = 1; s(c) = floor(log2(5)) = 2
    val docs = Seq(("d1", "a a b"), ("d2", "b c")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.surprisalScore(docs)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // d1: 3 toks, 2·1 + 1·1 = 3, 300 div 3 = 100
    // d2: 2 toks, 1 + 2 = 3, 300 div 2 = 150
    assert(out === Array(("d1", 3L, 3L, 100L), ("d2", 2L, 3L, 150L)))
  }

  test("surprisalScore: exact power-of-two ratio lands on the integer boundary") {
    // n(a)=1, n(b)=3, N=4: s(a) = floor(log2(4)) = 2 exactly — the
    // case a double log2 can miss by one ulp
    val docs = Seq(("d1", "a b b b")).toDF("doc_id", "text")
    val r = graft.ops.TextStats.surprisalScore(docs).collect()(0)
    // a: 1·2; b: 3·floor(log2(4 div 3 = 1)) = 0 → sum 2
    assert((r.getLong(1), r.getLong(2)) === ((4L, 2L)))
  }

  // -------------------------------------------- gap histogram (q158)
  test("gapHistogram: log2 buckets, same-second gaps in bucket -1") {
    def ts(s: String) = Timestamp.valueOf(s"2026-01-01 00:$s")
    val events = Seq(
      (1L, ts("00:00"), "u1"), (2L, ts("00:01"), "u1"), // gap 1 → bucket 0
      (3L, ts("00:05"), "u1"), (4L, ts("00:05"), "u1"), // gap 4 → bucket 2, gap 0 → -1
      (5L, ts("00:09"), "u2")                           // first event, no gap
    ).toDF("event_id", "ts", "user_id")
    val out = graft.ops.TimeSeries.gapHistogram(events)
      .orderBy("gap_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array((-1L, 1L, 0L, 0L), (0L, 1L, 1L, 1L), (2L, 1L, 4L, 4L)))
  }

  // -------------------------------------- decayed popularity (q159)
  test("decayedPopularity: newest hour gets the top power-of-two weight, depth bounds the window") {
    def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")
    val events = (
      (0 until 2).map(i => (i.toLong, ts(0), "x")) ++      // h0: 2 (beyond depth)
      (0 until 3).map(i => (10L + i, ts(1), "x")) ++       // h1: 3 (rank 2, w=1)
      Seq((20L, ts(2), "x"))                               // h2: 1 (rank 1, w=2)
    ).toDF("event_id", "ts", "event_type")
    val r = graft.ops.TimeSeries.decayedPopularity(events, depth = 2).collect()(0)
    // score = 1·2^1 + 3·2^0 = 5; h0 falls outside depth=2
    assert((r.getString(0), r.getLong(1), r.getLong(3)) === (("x", 2L, 5L)))
    // latest_hour is the hour-truncated grid cell, not the raw ts
    assert(r.getTimestamp(2) === Timestamp.valueOf("2026-01-01 02:00:00"))
  }

  // ------------------------------------------------ triangles (q160)
  test("triangleCounts: square + chord, reversed duplicates and self-loops collapse") {
    // a-b-c-d-a cycle plus chord a-c → triangles (a,b,c) and (a,c,d)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("b", "a") /* reversed dup */, ("a", "a") /* self-loop */)
      .toDF("a", "b")
    val out = graft.ops.Triangles.triangleCounts(edges)
      .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("a", 2L), ("b", 1L), ("c", 2L), ("d", 1L)))
  }

  test("triangleCounts: a star has no triangles; K4 has four") {
    val star = (1 to 6).map(i => ("hub", s"leaf$i")).toDF("a", "b")
    assert(graft.ops.Triangles.triangleCounts(star).count() === 0L)
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")).toDF("a", "b")
    val out = graft.ops.Triangles.triangleCounts(k4)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    // each K4 node sits in C(3,2) = 3 of the 4 triangles
    assert(out === Array(("a", 3L), ("b", 3L), ("c", 3L), ("d", 3L)))
  }

  // ------------------------------------------- lexical health (q161)
  test("lexicalHealth: hand-computed TTR and hapax ppm per source") {
    val docs = Seq(("s1", "a a a b"), ("s1", "a c"), ("s2", "x x"))
      .toDF("source", "text")
    val out = graft.ops.TextStats.lexicalHealth(docs)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // s1: 6 tokens, 3 types (a=4, b=1, c=1), 2 hapax →
    //   ttr 500000, hapax 666666; s2: 2 tokens, 1 type, 0 hapax
    // (columns: source, n_tokens, n_types, n_hapax, ttr_ppm, hapax_ppm)
    assert(out === Array(
      ("s1", 6L, 3L, 2L, 500000L, 666666L),
      ("s2", 2L, 1L, 0L, 500000L, 0L)))
  }

  // ------------------------------------- histogram median audit (q162)
  test("histogramMedianAudit: exact lower median vs log2-bucket midpoint estimate") {
    // g1 values 1..5: n=5, target rank 3 → exact 3; buckets
    // 1|2,3|4,5 cumulate 1,3 → mb=1, est = (2+4-1) div 2 = 2,
    // err = 1e6 div 3 = 333333
    val df = ((1 to 5).map(v => ("g1", v.toLong)) :+ (("g2", 8L)))
      .toDF("source", "n_chars")
    val out = graft.ops.Ranks.histogramMedianAudit(df, "source", "n_chars")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // g2: one value 8 → exact 8, bucket 3, est (8+16-1) div 2 = 11,
    // err = 3e6 div 8 = 375000
    assert(out === Array(
      ("g1", 5L, 3L, 2L, 333333L),
      ("g2", 1L, 8L, 11L, 375000L)))
  }

  test("histogramMedianAudit: log2 buckets keep the estimate within 2x (err_ppm <= 1e6)") {
    val df = (1 to 200).map(v => ("g", (v * 7 % 97 + 1).toLong)).toDF("source", "n_chars")
    val r = graft.ops.Ranks.histogramMedianAudit(df, "source", "n_chars").collect()(0)
    assert(r.getLong(4) <= 1000000L)
  }
}
