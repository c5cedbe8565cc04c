package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------- winnowing (q166)
  test("Winnowing: a shared (w+k-1)-token run guarantees a common fingerprint") {
    // k=3, w=4: any shared run of 6 tokens must contribute >= 1 shared
    // selected fingerprint (the SWA'03 detection guarantee)
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $run four five six seven"),
      (2L, s"red green $run blue yellow purple orange pink")).toDF("doc_id", "text")
    val fps = graft.ops.Winnowing.fingerprints(docs, k = 3, w = 4)
    val f1 = fps.filter($"doc_id" === 1L).select("fp").as[Long].collect().toSet
    val f2 = fps.filter($"doc_id" === 2L).select("fp").as[Long].collect().toSet
    assert((f1 & f2).nonEmpty)
  }

  test("Winnowing: short docs (>= k tokens, < w full windows) still fingerprint") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // exactly one gram
    val fps = graft.ops.Winnowing.fingerprints(docs, k = 3, w = 4).collect()
    assert(fps.length === 1 && fps.head.getLong(2) === 1L)
  }

  test("Winnowing: identical grams collapse to one fingerprint (rightmost-tie rule)") {
    val docs = Seq((1L, "a a a a a a a a")).toDF("doc_id", "text")
    val fps = graft.ops.Winnowing.fingerprints(docs, k = 3, w = 4).collect()
    assert(fps.length === 1) // every window's min is the same hash
  }

  test("Winnowing: identical documents overlap at 1e6 ppm") {
    val t = "spark shuffles the sorted partitions into merged buckets quickly today"
    val docs = Seq((1L, t), (2L, t), (3L, "totally different words entirely here"))
      .toDF("doc_id", "text")
    val out = graft.ops.Winnowing.overlapPairs(docs, k = 3, w = 4,
      minShared = 1L, maxDf = 64L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getLong(5) === 1000000L) // n_shared == n_a == n_b
  }

  test("Winnowing: the maxDf cap removes boilerplate fingerprints from the join") {
    val t = "common boiler plate text shared by every single document here"
    val docs = (1L to 5L).map(i => (i, t)).toDF("doc_id", "text")
    // every fingerprint has df=5 > maxDf=4 -> no pairs at all
    assert(graft.ops.Winnowing.overlapPairs(docs, 3, 4, 1L, 4L).count() === 0L)
  }

  // --------------------------------------- hard negatives (q167)
  test("hardNegatives: exact quantized distances, different label only, tie -> lower id") {
    // exact binary fractions: the float -> double -> floor chain is lossless
    val emb = Seq(
      (1L, Array(0.0f), "A"), (2L, Array(0.125f), "A"),
      (3L, Array(0.125f), "B"), (4L, Array(0.5f), "B"),
      (5L, Array(-0.125f), "B")).toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity.hardNegatives(emb, k = 2,
      labelCol = "label", quantScale = 1e4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // id1 (A): negatives 3 (1250^2), 5 ((-1250)^2), 4 (5000^2)
    // tie at 1562500 between ids 3 and 5 -> 3 first
    val one = out.filter(_._1 == 1L).toSeq
    assert(one === Seq((1L, 1L, 3L, 1562500L), (1L, 2L, 5L, 1562500L)))
    // id3 (B): negatives 2 (dist 0), 1 (1250^2) -> 2 first
    val three = out.filter(_._1 == 3L).toSeq
    assert(three === Seq((3L, 1L, 2L, 0L), (3L, 2L, 1L, 1562500L)))
  }

  // --------------------------------------- next-token table (q168)
  test("nextTokenTopK: hand-computed transitions, ppm floors, deterministic ties") {
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = graft.ops.CoOccurrence.nextTokenTopK(docs, k = 2, minPrefix = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("a", 1L, "b", 2L, 3L, 666666L),
      ("a", 2L, "c", 1L, 3L, 333333L),
      ("b", 1L, "a", 2L, 2L, 1000000L)))
  }

  test("nextTokenTopK: minPrefix gates rare prefixes out") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    assert(graft.ops.CoOccurrence.nextTokenTopK(docs, 3, 2L).count() === 0L)
  }

  // ----------------------------------------------- RRF (q169)
  test("rrfFusion: hand-computed two-signal fusion, negative values, ties by id") {
    val df = Seq(
      (1L, 10L, -5L),
      (2L, 30L, -5L),
      (3L, 20L, 7L)).toDF("id", "s1", "s2")
    val out = graft.ops.Ranks.rrfFusion(df, "id",
      Seq(("one", col("s1")), ("two", col("s2"))), k0 = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // s1 desc: 2(1), 3(2), 1(3); s2 desc: 3(1), then tie -5 -> id order 1(2), 2(3)
    // rrf: id1 = 1e6/61? no: 1e6 div 63 + 1e6 div 62 = 15873+16129 = 32002
    //      id2 = 1e6 div 61 + 1e6 div 63 = 16393+15873 = 32266
    //      id3 = 1e6 div 62 + 1e6 div 61 = 16129+16393 = 32522
    assert(out.toSeq === Seq(
      (3L, 2L, 1L, 32522L),
      (2L, 1L, 3L, 32266L),
      (1L, 3L, 2L, 32002L)))
  }

  test("rrfFusion: rank equals the (signal desc, id) order at wide magnitudes") {
    val big = 1L << 45
    val df = Seq((1L, big), (2L, big - 1L), (3L, -big), (4L, 0L))
      .toDF("id", "s")
    val out = graft.ops.Ranks.rrfFusion(df, "id", Seq(("s", col("s"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toMap === Map(1L -> 1L, 2L -> 2L, 4L -> 3L, 3L -> 4L))
  }

  // ------------------------------------- edit distance (q170)
  test("editDistancePairs: classic kitten/sitting at the threshold boundary") {
    val docs = Seq((1L, "kitten"), (2L, "sitting"), (3L, "zzzzzzzzzzzzzzzzzzzz"))
      .toDF("doc_id", "text")
    val at3 = graft.ops.Dedup.editDistancePairs(docs, maxDist = 3).collect()
    assert(at3.length === 1)
    assert(at3.head.getLong(0) === 1L && at3.head.getLong(1) === 2L &&
      at3.head.getLong(4) === 3L)
    assert(graft.ops.Dedup.editDistancePairs(docs, maxDist = 2).count() === 0L)
  }

  test("editDistancePairs: adjacent length buckets are matched (blocking recall 1)") {
    // len 5 vs len 8, maxDist=3: buckets 1 and 2 -> adjacent; dist exactly 3
    val docs = Seq((1L, "aaaaa"), (2L, "aaaaabbb")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.editDistancePairs(docs, maxDist = 3).collect()
    assert(out.length === 1 && out.head.getLong(4) === 3L)
  }

  test("editDistancePairs: counting filter passes anagrams (L1=0) through to the DP") {
    // "ab" vs "ba": identical histograms (the filter's blind spot by
    // design), lev = 2 -- must be found, not pruned
    val docs = Seq((1L, "ab"), (2L, "ba")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.editDistancePairs(docs, maxDist = 2).collect()
    assert(out.length === 1 && out.head.getLong(4) === 2L)
    // and the filter actually rejects: disjoint alphabets, same length,
    // L1 = 16 > 2*maxDist -- no pair even though |dlen| = 0
    val far = Seq((1L, "aaaaaaaa"), (2L, "bbbbbbbb")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.editDistancePairs(far, maxDist = 3).count() === 0L)
  }

  test("editDistancePairs: length delta beyond maxDist never verifies") {
    val docs = Seq((1L, "abc"), (2L, "abcdefghij")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.editDistancePairs(docs, maxDist = 3).count() === 0L)
  }

  // ------------------------------------ sparse TF-IDF (q171)
  test("tfidfTopK: hand-computed weights, norms, dots and 1e12 scores") {
    val docs = Seq(
      (1L, "x x y"), (2L, "x z"), (3L, "y z"), (4L, "w")).toDF("doc_id", "text")
    // N=4; df(x,y,z)=2 -> idfbits=1; df(w)=1 -> idfbits=2
    // weights: d1{x:2,y:1} n2=5; d2{x:1,z:1} n2=2; d3{y:1,z:1} n2=2; d4{w:2} n2=4
    // dots: (1,2)=2 (1,3)=1 (2,3)=1
    // scores e12: (1,2): 4e12 div 10 = 400000000000; (1,3): 1e12 div 10 = 1e11
    //             (2,3): 1e12 div 4 = 250000000000
    val out = graft.ops.SparseSim.tfidfTopK(docs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 400000000000L), (1L, 2L, 3L, 100000000000L),
      (2L, 1L, 1L, 400000000000L), (2L, 2L, 3L, 250000000000L),
      (3L, 1L, 2L, 250000000000L), (3L, 2L, 1L, 100000000000L)))
  }

  test("tfidfTopK: stopword-grade tokens (df > N/2) carry no postings") {
    // "the" appears in all 4 docs -> idfbits 0 -> no pair meets via it
    val docs = Seq((1L, "the aa"), (2L, "the bb"), (3L, "the cc"), (4L, "the dd"))
      .toDF("doc_id", "text")
    assert(graft.ops.SparseSim.tfidfTopK(docs, k = 3).count() === 0L)
  }

  // --------------------------------- skip-gram co-occurrence (q172)
  test("skipgramCounts: window fan-out, canonical pair order, clipping at doc end") {
    val docs = Seq((1L, "a b c d"), (2L, "b a")).toDF("doc_id", "text")
    // window 2, doc1: (a,b) (a,c) (b,c) (b,d) (c,d); doc2: (a,b) canonical
    val out = graft.ops.CoOccurrence.skipgramCounts(docs, window = 2,
      minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L),
      ("b", "d", 1L), ("c", "d", 1L)))
  }

  // ------------------------------------------- HLL audit (q173)
  test("Hll: shard register tables merge by cell-wise max into the union's table") {
    val shardA = (1 to 300).map(i => ("g", s"tok$i")).toDF("__g", "__tok")
    val shardB = (200 to 500).map(i => ("g", s"tok$i")).toDF("__g", "__tok")
    val union = shardA.union(shardB)
    val merged = graft.ops.Hll.registerTable(shardA)
      .union(graft.ops.Hll.registerTable(shardB))
      .groupBy("__g", "__b").agg(max($"__r").as("__r"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).sorted
    val direct = graft.ops.Hll.registerTable(union)
      .collect().map(r => (r.getLong(1), r.getInt(2))).sorted
    assert(merged === direct)
  }

  test("Hll: audit's exact count is exact and err_ppm is internally consistent") {
    val keys = (1 to 800).map(i => ("g", s"key$i")) ++ Seq(("g", "key1"))
    val out = graft.ops.Hll.cardinalityAudit(
      keys.toDF("__g", "__tok"), "__g", "__tok").collect()
    assert(out.length === 1)
    val r = out.head
    val (exact, est, err) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(exact === 800L) // the duplicate key collapses
    assert(err === math.abs(est - exact) * 1000000L / exact)
    // in the calibrated range (n > 2.5m) the sketch should be within ~3 sigma
    assert(err < 200000L, s"estimate $est vs exact $exact")
  }

  // --------------------------------- quantile audit (q174)
  test("histogramQuantileAudit: hand-computed exact ranks and bucket midpoints") {
    val docs = (1L to 10L).map(v => ("g", v)).toDF("grp", "v")
    val out = graft.ops.Ranks.histogramQuantileAudit(docs, "grp", "v",
      Seq(25, 50, 75, 95))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    // ranks: p25->3, p50->5, p75->7, p95->9; buckets cum: b0:1 b1:3 b2:7 b3:10
    assert(out.toSeq === Seq(
      (25L, 3L, 2L, 333333L),
      (50L, 5L, 5L, 0L),
      (75L, 7L, 5L, 285714L),
      (95L, 9L, 11L, 222222L)))
  }

  // ------------------------------------------- backoff surprisal (q175)
  test("backoffSurprisal: hand-computed ladder hits all four levels") {
    // ref "a b c a b c": n3(a,b,c)=2 (b,c,a)=1 (c,a,b)=1; c2(a,b)=2
    // (b,c)=1 (c,a)=1; n2(a,b)=2 (b,c)=2 (c,a)=1; c1(a)=2 (b)=2 (c)=1;
    // n1(a)=(b)=(c)=2, N=6, penalty P=2, bits(x)=floor(log2 x)
    val ref = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val scored = Seq(
      (1L, "a b c x"),  // (a,b,c): tri, bits(2 div 2)=0; (b,c,x): OOV, 6+bits(6)=8
      (3L, "c c a b"),  // (c,c,a): bigram (c,a), 2+bits(1 div 1)=2; (c,a,b): tri, 0
      (5L, "x x a")     // (x,x,a): unigram a, 4+bits(6 div 2)=5
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.backoffSurprisal(scored, ref)
      .orderBy("doc_id")
      .select("doc_id", "n_scored", "n_tri", "n_bi", "n_uni", "n_oov",
        "surprisal_sum", "surprisal_per_100")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, 0L, 0L, 1L, 8L, 400L),
      (3L, 2L, 1L, 1L, 0L, 0L, 2L, 100L),
      (5L, 1L, 0L, 0L, 1L, 0L, 5L, 500L)))
  }

  test("backoffSurprisal: a corpus scored on its own table never backs off") {
    val docs = Seq((0L, "the quick fox jumps high"),
      (1L, "the slow fox sits low today")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.backoffSurprisal(docs, docs)
      .agg(sum($"n_bi") + sum($"n_uni") + sum($"n_oov"), sum($"n_tri"), sum($"n_scored"))
      .as[(Long, Long, Long)].collect().head
    assert(out._1 === 0L)          // every trigram counts itself
    assert(out._2 === out._3)      // all positions are trigram hits
  }

  test("backoffSurprisal: docs under 3 tokens are absent") {
    val ref = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val scored = Seq((1L, "a b"), (2L, "a"), (3L, "a b c")).toDF("doc_id", "text")
    val ids = graft.ops.TextStats.backoffSurprisal(scored, ref)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  // ------------------------------------------- packing audit (q176)
  test("packing audit rollup: cuts = continuation spans; only the tail is unfilled") {
    // budget 10: d1(4) fills seq0[0,4); d2(8) cut at 10 -> seq0[4,10)+seq1[0,2);
    // d3(5) seq1[2,7) -> 2 seqs, capacity 20, filled 17, 1 cut, waste 3
    val docs = Seq(
      (1L, Seq.fill(4)("w").mkString(" ")),
      (2L, Seq.fill(8)("w").mkString(" ")),
      (3L, Seq.fill(5)("w").mkString(" "))).toDF("doc_id", "text")
    val spans = graft.ops.Packing.packSequences(docs, budget = 10L)
    val a = spans.agg(
      countDistinct($"seq_id").as("n_seqs"),
      countDistinct($"doc_id").as("n_docs"),
      count(lit(1)).as("n_spans"),
      sum($"len").as("tok_total"),
      sum(when($"doc_off" > 0, 1L).otherwise(0L)).as("n_cuts"),
      countDistinct(when($"doc_off" > 0, $"doc_id")).as("n_cut_docs"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(a === ((2L, 3L, 4L, 17L, 1L, 1L)))
    assert(a._3 - a._2 === a._5) // n_spans - n_docs == n_cuts, always
    // every sequence but the last is exactly full
    val fills = spans.groupBy("seq_id").agg(sum($"len").as("f"))
      .orderBy("seq_id").as[(Long, Long)].collect()
    assert(fills.dropRight(1).forall(_._2 === 10L) && fills.last._2 === 7L)
  }

  // ------------------------------------------- k-core early exit
  test("kCore: convergence early-exit is output-identical to the full-round run") {
    // triangle core + a 4-node pendant chain that peels over 3 rounds
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val fixed = graft.ops.KCore.kCore(edges, k = 2, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val generous = graft.ops.KCore.kCore(edges, k = 2, rounds = 500)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(fixed === generous) // 500 rounds exits at convergence (~4)
    assert(fixed === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: early exit never fires before the requested rounds on a shrinking graph") {
    // round-exact contract: rounds=1 must leave the mid-peel state
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r1 = graft.ops.KCore.kCore(chain, k = 2, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r1 === Seq((2L, 1L), (3L, 2L), (4L, 1L))) // endpoints peeled only
    assert(graft.ops.KCore.kCore(chain, k = 2, rounds = 3).count() === 0L)
  }

  // ------------------------------------------- repetition gate (q177)
  test("repetitionScore: hand-computed Gopher dup-3-gram accounting") {
    // "a b a b a b": grams (a b a)x2 (b a b)x2 -> all 4 occurrences
    // repeated, rep_ppm = 1e6; "x y z w": 2 distinct grams, 0 repeated
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z w"), (3L, "p q"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextStats.repetitionScore(docs, n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_distinct", "n_rep", "max_repeat",
        "rep_ppm", "top_gram_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(              // doc 3 (< 3 tokens) absent
      (1L, 4L, 2L, 4L, 2L, 1000000L, 500000L),
      (2L, 2L, 2L, 0L, 1L, 0L, 500000L)))
  }

  // ------------------------------------------- frequency spectrum (q178)
  test("freqSpectrum: hand-computed doubling histogram with exact ppm") {
    val docs = Seq((1L, "a a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=4 (bucket 2), b=2 (bucket 1), c=1 (bucket 0); T=3, N=7
    val out = graft.ops.TextStats.freqSpectrum(docs).orderBy("bucket")
      .select("bucket", "n_types", "n_tokens", "type_ppm", "token_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 1L, 1L, 333333L, 142857L),
      (1L, 1L, 2L, 333333L, 285714L),
      (2L, 1L, 4L, 333333L, 571428L)))
  }

  // ------------------------------------------- vocab coverage (q179)
  test("vocabCoverage: level algebra equals the ranked-prefix mass") {
    val docs = Seq((1L, "a a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts a=4 b=2 c=1, N=7: top-1 covers 4, top-2 covers 6,
    // top-3 covers 7, any larger probe covers everything
    val out = graft.ops.TextStats.vocabCoverageAt(docs,
        sizes = Seq(1L, 2L, 3L, 10L)).orderBy("vocab_size")
      .select("vocab_size", "covered_tokens", "coverage_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 571428L), (2L, 6L, 857142L),
      (3L, 7L, 1000000L), (10L, 7L, 1000000L)))
  }

  test("vocabCoverage: count ties split exactly (partial level takes s - cum types)") {
    // four types all at count 2: top-3 must cover exactly 6 of 8
    val docs = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.vocabCoverageAt(docs, sizes = Seq(3L))
      .select("covered_tokens").as[Long].collect().head
    assert(out === 6L)
  }

  // ------------------------------------------- label propagation (q180)
  test("LabelProp: two triangles with a bridge resolve to two communities") {
    // hand-simulated sync rounds with (count desc, label asc) argmax:
    // r1 [1->2,2->1,3->1,4->3,5->4,6->4]; r2 [1,1,1,4,3,3];
    // r3 [1,1,1,3,3,3]; r4 stable
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val out = graft.ops.LabelProp.propagate(edges, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
  }

  test("LabelProp: oscillation is pinned by the fixed-round contract") {
    // a single edge 2-cycles under sync updates: odd rounds swap,
    // even rounds restore -- deterministic either way
    val edge = Seq((1L, 2L)).toDF("a", "b")
    assert(graft.ops.LabelProp.propagate(edge, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
      === Seq((1L, 2L), (2L, 1L)))
    assert(graft.ops.LabelProp.propagate(edge, rounds = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
      === Seq((1L, 1L), (2L, 2L)))
  }

  // ------------------------------------------- CDC chunking (q181)
  test("contentDefinedChunks: partition invariants — contiguous, complete, deterministic") {
    val text = (1 to 200).map(i => s"tok$i word$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = graft.ops.Chunking.contentDefinedChunks(docs, maskBits = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // chunks tile the token stream: starts contiguous, counts sum to 400
    assert(d1.map(_.getLong(3)).sum === 400L)
    val starts = d1.map(_.getLong(2))
    val lens = d1.map(_.getLong(3))
    starts.zip(lens).sliding(2).foreach {
      case Array((s1, l1), (s2, _)) => assert(s1 + l1 === s2)
      case _ => ()
    }
    // identical docs chunk identically (pure function of content)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d1.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      === d2.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
  }

  test("contentDefinedChunks: shift robustness — one inserted token re-cuts one chunk") {
    val base = (1 to 300).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, s"INSERTED $base")).toDF("doc_id", "text")
    val out = graft.ops.Chunking.contentDefinedChunks(docs, maskBits = 3)
      .select("doc_id", "n_tokens", "hash_sum").collect()
    def sig(id: Long) = out.filter(_.getLong(0) == id)
      .map(r => (r.getLong(1), r.getLong(2))).groupBy(identity)
      .view.mapValues(_.length).toMap
    val (a, b) = (sig(1L), sig(2L))
    // multiset symmetric difference <= 2 chunk kinds: only the chunk
    // containing the insertion changed (fixed-size chunking would
    // re-frame every chunk after the edit)
    val keys = (a.keySet ++ b.keySet).toSeq
    val diff = keys.map(k => math.abs(a.getOrElse(k, 0) - b.getOrElse(k, 0))).sum
    assert(diff <= 2, s"symmetric multiset difference $diff > 2")
  }

  // --------------------------------- round-14 advice guards
  test("kmeans: quantization overflow fails loudly, not silently") {
    val emb = (1L to 4L).map(i => (i, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      graft.ops.Clustering.kmeans(emb, k = 2, iterations = 1, quantScale = 1e9)
    }
  }
}
