package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round18OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------- q209 IVFADC end-to-end recall
  test("ivfAdcRecall: nProbe=nCents and nCodes=n degenerates to recall 1 at every k") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(29)
    val emb = (0L until 24L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    // every cell probed (no routing loss) + every vector its own
    // codeword (no quantization loss) ⇒ the composed ranking IS the
    // exact ranking
    val got = Similarity.ivfAdcRecall(emb, queryId = 3L, ks = Seq(1, 5, 10),
      nCents = 4, nProbe = 4, m = 2, nCodes = 24)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1000000L), (5L, 5L, 1000000L),
      (10L, 10L, 1000000L)))
  }

  test("ivfAdcRecall: composed recall is bounded above by the quantization-only recall on a lossy geometry") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(31)
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    // coarse codes (nCodes=4) + partial probing (2 of 8 cells): the
    // composed system sees a SUBSET of the candidates the pure-ADC
    // ranking sees under the same codebook, so its overlap with the
    // exact top-k cannot exceed the full-scan ADC's at any k
    val composed = Similarity.ivfAdcRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), nCents = 8, nProbe = 2, m = 2, nCodes = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val adcOnly = Similarity.pqAdcRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), m = 2, nCodes = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    Seq(1L, 5L, 10L).foreach { k =>
      assert(composed(k) <= adcOnly(k),
        s"k=$k: composed ${composed(k)} > quantization-only ${adcOnly(k)}")
    }
  }

  // ------------------------------- q212 batched ADC retrieval
  test("adcTopKBatch: per probe the batch ranking is identical to the single-query adcTopK") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(37)
    val emb = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val books = Similarity.fitPqBooks(emb, m = 2, nCodes = 8)
    val codes = Similarity.encodePq(emb, books)
    val probeIds = Seq(0L, 7L, 15L)
    val probes = emb.filter($"vec_id".isin(probeIds: _*))
      .select($"vec_id".as("query_id"), $"embedding")
    val batch = Similarity.adcTopKBatch(codes, books, probes, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap
    probeIds.foreach { qid =>
      val single = Similarity
        .adcTopK(codes, books, Similarity.probeVector(emb, qid), k = 5)
        .as[(Long, Long, Long)].collect().toSeq
      assert(batch(qid) === single, s"probe $qid diverges from adcTopK")
    }
    // empty query frame refused with a contract message, not an NPE
    intercept[IllegalArgumentException] {
      Similarity.adcTopKBatch(codes, books,
        probes.filter($"query_id" < 0), k = 5)
    }
  }

  test("adcTopKBatch: geometry mismatch and empty codebook are refused") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(41)
    val emb = (0L until 12L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val books = Similarity.fitPqBooks(emb, m = 2, nCodes = 4)
    val codes = Similarity.encodePq(emb, books)
    val badProbes = (0L until 2L).map(i =>
      (i, Array.fill(6)(0.5f))).toDF("query_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.adcTopKBatch(codes, books, badProbes, k = 3)
    }
    // the r17-ADVICE empty-codebook guard fires on the batch path too
    intercept[IllegalArgumentException] {
      Similarity.adcTopKBatch(codes, books.filter(col("code") < 0),
        emb.select($"vec_id".as("query_id"), $"embedding"), k = 3)
    }
  }

  // ------------------------------- q216 ordered t-closeness
  test("tClosenessOrdered: extreme-loaded cohorts score above middle-loaded at identical TVD") {
    import graft.ops.Privacy
    // uniform 3-bucket corpus (3 docs per bucket); cohorts a/b/c each
    // concentrate on one bucket, so every cohort has the SAME TVD
    // numerator (Σ|c·N−C·n| = 36) but different EMDs. Hand algebra
    // for a (buckets (3,0,0), n=3, N=9, V=3): diffs (18,−9,−9),
    // cumsums (18,9,0) → Σ|S|=27 → 27e6/(2·3·9) = 500000.
    // b (0,3,0): cumsums (−9,9,0) → 18 → 333333 (floored).
    // c (0,0,3): cumsums (−9,−18,0) → 27 → 500000.
    val docs = Seq(
      (0L, "a", "en", 50L), (1L, "a", "en", 50L), (2L, "a", "en", 50L),
      (3L, "b", "en", 150L), (4L, "b", "en", 150L), (5L, "b", "en", 150L),
      (6L, "c", "en", 250L), (7L, "c", "en", 250L), (8L, "c", "en", 250L)
    ).toDF("doc_id", "source", "lang", "n_chars")
    val got = Privacy.tClosenessOrdered(docs, tPpm = 400000L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", "en", 3L, 1L, 500000L, 0L),
      ("b", "en", 3L, 1L, 333333L, 1L),
      ("c", "en", 3L, 1L, 500000L, 0L)))
  }

  test("tClosenessOrdered: single-value corpus reports 0 (V=1 guard)") {
    import graft.ops.Privacy
    val docs = Seq(
      (0L, "a", "en", 10L), (1L, "b", "fr", 20L)
    ).toDF("doc_id", "source", "lang", "n_chars")
    val got = Privacy.tClosenessOrdered(docs, tPpm = 0L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", "en", 1L, 1L, 0L, 1L),
      ("b", "fr", 1L, 1L, 0L, 1L)))
  }

  // ------------------------------- q213 nProbe frontier
  test("nProbe frontier: at nProbe=nCents the composed recall equals the full-scan ADC recall") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(43)
    val emb = (0L until 36L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    // every cell probed ⇒ the candidate set is the whole corpus and
    // only quantization loss remains: the frontier's last row must
    // reproduce pqAdcRecall exactly at every k
    val frontier = Similarity.ivfAdcRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), nCents = 6, nProbe = 6, m = 2, nCodes = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val fullScan = Similarity.pqAdcRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), m = 2, nCodes = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(frontier === fullScan)
  }

  // ------------------------------- q219 compression frontier extreme
  test("pqAdcRecall: the frontier's extreme (m = dim, nCodes = n) is exact at every k") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(71)
    val emb = (0L until 20L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    // one dim per subspace AND one codeword per vector: each stored
    // code reconstructs the exact quantized component, so the ADC
    // ranking IS the exact ranking — the lossless end of the
    // bytes-per-vector dial q219 sweeps
    val got = Similarity.pqAdcRecall(emb, queryId = 0L, ks = Seq(1, 5, 10),
      m = 8, nCodes = 20)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1000000L), (5L, 5L, 1000000L),
      (10L, 10L, 1000000L)))
  }

  // ------------------------------- q218 Lloyd-refined PQ codebooks
  test("fitPqBooksLloyd: floor-mean update is negative-safe and empty codes carry") {
    import graft.ops.Similarity
    // hash rank over ids 0..3 orders (0, 2, 1, 3), so the two medoid
    // codewords are id0 and id2 — BOTH (5,5). Every vector ties to
    // them equally and argmin breaks to code 1, leaving code 2 EMPTY
    // (carries its medoid). Code 1's members sum to (-6, 12) over 4
    // rows: floor(-6/4) = -2 (true floor, not truncation), 12/4 = 3.
    val emb = Seq(
      (0L, Array(5.0f, 5.0f)), (1L, Array(4.0f, 5.0f)),
      (2L, Array(5.0f, 5.0f)), (3L, Array(-20.0f, -3.0f))
    ).toDF("vec_id", "embedding")
    val books = Similarity.fitPqBooksLloyd(emb, m = 1, nCodes = 2,
      rounds = 1, quantScale = 1.0)
      .as[(Long, Long, Seq[Long])].collect().toSeq
    assert(books === Seq((0L, 1L, Seq(-2L, 3L)), (0L, 2L, Seq(5L, 5L))))
  }

  test("pqLloydRecall: rounds=0 reproduces the medoid-book pqAdcRecall exactly") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(67)
    val emb = (0L until 34L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val lloyd0 = Similarity.pqLloydRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), m = 2, nCodes = 4, rounds = 0)
      .as[(Long, Long, Long)].collect().toSeq
    val medoid = Similarity.pqAdcRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), m = 2, nCodes = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(lloyd0 === medoid)
  }

  // ------------------------------- q210/q217 Viterbi-hard EM
  // Hand algebra on the q200 corpus (1,"aa aa ab"), (2,"aab x"),
  // vocabN=2. Round-0 vocab: aa:3, aab:4, a:1, b:3 (total 10);
  // segmentation aa→[a,a], ab→[a,b], aab→[aab], x→UNK.
  // E-step counts under it: a:5 (4 from aa×2, 1 from ab), b:1,
  // aab:1; 'aa' is UNUSED and pruned. M-step: total'=7 →
  // costs aab:bin(7)=3, a:bin(1)=1, b:bin(7)=3.
  test("emRound: re-counts under the segmentation, prunes unused pieces, re-costs") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aab x")).toDF("doc_id", "text")
    val v0 = graft.text.UnigramLm.fit(docs, vocabN = 2)
    val v1 = graft.text.UnigramLm.emRound(docs, v0)
    assert(v1.entries.sortBy(_._1) ===
      Seq(("a", 1L), ("aab", 3L), ("b", 3L)))
  }

  test("unigramStatsEm: one round changes the corpus stats; round 2 is the fixed point") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aab x")).toDF("doc_id", "text")
    def stats(r: Int) =
      graft.text.UnigramLm.unigramStatsEm(docs, vocabN = 2, emRounds = r)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val s0 = stats(0)
    val s1 = stats(1)
    val s2 = stats(2)
    // round 1: aab re-costs 4 → 3 bits (doc 2); doc 1 unchanged
    assert(s0 === Seq((1L, 3L, 6L, 0L, 8L), (2L, 2L, 2L, 1L, 4L)))
    assert(s1 === Seq((1L, 3L, 6L, 0L, 8L), (2L, 2L, 2L, 1L, 3L)))
    // round 2 re-counts under an identical segmentation → same costs
    assert(s2 === s1)
  }

  // ------------------------------- q215 routed batch retrieval
  test("ivfAdcTopKBatch: nProbe=nCents degenerates to the full-scan adcTopKBatch per probe") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(59)
    val emb = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val probes = emb.filter($"vec_id" % 9 === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val routed = Similarity.ivfAdcTopKBatch(emb, probes, k = 5,
      nCents = 5, nProbe = 5, m = 2, nCodes = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val books = Similarity.fitPqBooks(emb, m = 2, nCodes = 8)
    val codes = Similarity.encodePq(emb, books)
    val full = Similarity.adcTopKBatch(codes, books, probes, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(routed === full)
  }

  test("ivfAdcTopKBatch: partial probing returns a subset ranking consistent with the full scan") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(61)
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val probes = emb.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding")
    val routed = Similarity.ivfAdcTopKBatch(emb, probes, k = 40,
      nCents = 8, nProbe = 2, m = 2, nCodes = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val books = Similarity.fitPqBooks(emb, m = 2, nCodes = 8)
    val codes = Similarity.encodePq(emb, books)
    val full = Similarity.adcTopKBatch(codes, books, probes, k = 40)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._3 -> r._4).toMap
    // routed candidates are a strict subset (2 of 8 cells probed) and
    // every returned (id, adc_d2) matches the full scan's distance;
    // ranks are contiguous from 1
    assert(routed.nonEmpty && routed.size < 40)
    assert(routed.map(_._2) === (1L to routed.size.toLong))
    routed.foreach { case (_, _, id, d2) => assert(full(id) === d2) }
    intercept[IllegalArgumentException] {
      Similarity.ivfAdcTopKBatch(emb, probes.filter($"query_id" < 0), k = 5,
        nCents = 8, nProbe = 2, m = 2, nCodes = 8)
    }
  }

  // ------------------------------- q214 residual IVFADC
  test("ivfAdcResidualRecall: nCodes=n + nProbe=nCents is exact by translation invariance") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(47)
    val emb = (0L until 28L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    // each candidate is its own residual codeword, so the ADC sum is
    // d²((q−c) − (x−c)) = d²(q, x) exactly — recall 1 at every k
    val got = Similarity.ivfAdcResidualRecall(emb, queryId = 5L,
      ks = Seq(1, 5, 10), nCents = 4, nProbe = 4, m = 2, nCodes = 28)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1000000L), (5L, 5L, 1000000L),
      (10L, 10L, 1000000L)))
  }

  test("ivfAdcResidualRecall: nCents=1 reproduces the raw-vector full-scan ADC recall") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(53)
    val emb = (0L until 32L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    // one shared translation: codebook fit, assignment, and LUT all
    // equal the raw system's term by term, so the recalls coincide
    val res = Similarity.ivfAdcResidualRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), nCents = 1, nProbe = 1, m = 2, nCodes = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val raw = Similarity.pqAdcRecall(emb, queryId = 0L,
      ks = Seq(1, 5, 10), m = 2, nCodes = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(res === raw)
  }

  // ------------------------------- q211 t-closeness
  test("tCloseness: skewed cohort fails, corpus-mirroring cohort passes, exact ppm") {
    import graft.ops.Privacy
    // 50/50 en/fr corpus; cohort a all-en, cohort b mirrors the
    // corpus, cohort c all-fr. Hand algebra for a (n=4, N=12):
    // Σ|c·N − C·n| = |48−24| + |0−24| = 48 →
    // tvd_ppm = 48e6 / (2·4·12) = 500000 > t=300000 → fails.
    // b: both terms zero → 0 ppm → passes.
    val docs = (
      Seq.fill(4)(("a", "en")) ++
      (Seq.fill(2)(("b", "en")) ++ Seq.fill(2)(("b", "fr"))) ++
      Seq.fill(4)(("c", "fr"))
    ).zipWithIndex.map { case ((src, lang), i) => (i.toLong, src, lang, 50L) }
      .toDF("doc_id", "source", "lang", "n_chars")
    val got = Privacy.tCloseness(docs, tPpm = 300000L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 0L, 4L, 1L, 500000L, 0L),
      ("b", 0L, 4L, 2L, 0L, 1L),
      ("c", 0L, 4L, 1L, 500000L, 0L)))
  }

  test("tCloseness: absent corpus values contribute their mass; floor division is exact") {
    import graft.ops.Privacy
    // corpus: en=3, fr=2, de=1 (N=6); cohort a = {en, fr, en} (n=3)
    // misses de entirely. Σ|c·N − C·n| = |12−9| + |6−6| + |0−3|
    // = 3 + 0 + 3 = 6 → tvd_ppm = 6e6 / (2·3·6) = 166666 (floored
    // from 166666.67) → passes at t=300000 with n_sensitive=2.
    val docs = Seq(
      (0L, "a", "en", 10L), (1L, "a", "fr", 10L), (2L, "a", "en", 10L),
      (3L, "z", "en", 10L), (4L, "z", "fr", 10L), (5L, "z", "de", 10L)
    ).toDF("doc_id", "source", "lang", "n_chars")
    val a = Privacy.tCloseness(docs, tPpm = 300000L)
      .filter($"source" === "a")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(a === Seq(("a", 0L, 3L, 2L, 166666L, 1L)))
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(docs, tPpm = 1000001L)
    }
  }
}
