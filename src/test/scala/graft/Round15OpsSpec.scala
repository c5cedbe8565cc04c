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

  // --------------------------------- round-14 advice guards
  test("kmeans: quantization overflow fails loudly, not silently") {
    val emb = (1L to 4L).map(i => (i, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      graft.ops.Clustering.kmeans(emb, k = 2, iterations = 1, quantScale = 1e9)
    }
  }
}
