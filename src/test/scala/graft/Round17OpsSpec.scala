package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round17OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------- q200 unigram-LM Viterbi
  // Hand-computed corpus: docs (1, "aa aa ab"), (2, "aab x").
  // Word counts: aa:2, ab:1, aab:1, x:1 → vocabN=2 picks (cnt DESC,
  // tok ASC): aa(2), aab(1). Alphabet {a, b}. TOTAL = Σ cnt·len =
  // 2·2 + 1·2 + 1·3 + 1·1 = 10. Char-stream counts: a = 4+1+2 = 7,
  // b = 1+1 = 2. Surprisal = length(bin(TOTAL div cnt)):
  //   aa → bin(5) = 3 bits; aab → bin(10) = 4; a → bin(1) = 1;
  //   b → bin(5) = 3.
  // Viterbi: "aa" → [a,a] cost 2 BEATS [aa] cost 3 (2 pieces, cost 2
  // — minimum-cost differs from greedy longest-match); "ab" → [a,b]
  // cost 4; "aab" → [aab] cost 4 beats [a,a,b] cost 5; "x" → UNK.
  test("unigramStats: hand-computed Viterbi DP on the 2-doc corpus") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aab x")).toDF("doc_id", "text")
    val got = graft.text.UnigramLm.unigramStats(docs, vocabN = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 6L, 0L, 8L),   // 2+2+2 pieces, cost 2+2+4
      (2L, 2L, 2L, 1L, 4L)))  // aab(1 piece, 4 bits) + x(UNK)
  }

  test("UnigramVocab: packed lexicographic tie-break picks fewest pieces") {
    // surp(a) = bits(10/10) = 1, surp(aa) = bits(10/4) = 2:
    // "aa" as [aa] costs 2 with 1 piece, as [a,a] costs 2 with 2
    // pieces — equal cost, so the packed min must take 1 piece
    val v = graft.text.UnigramVocab.build(Seq(("a", 10L), ("aa", 4L)), 10L)
    assert(v.stats("aa").toSeq === Seq(1L, 1L, 0L, 2L))
    // and the DP is a true minimum, not greedy: with surp(aa) = 3,
    // surp(a) = 1 (total 10, cnt(aa)=2 → bits(5)=3), [a,a] wins
    val g = graft.text.UnigramVocab.build(Seq(("a", 10L), ("aa", 2L)), 10L)
    assert(g.stats("aa").toSeq === Seq(1L, 2L, 0L, 2L))
  }

  test("UnigramVocab: split semantics, empty words and UNK") {
    // surp(a) = bits(10/5=2) = 2, surp(b) = bits(10/2=5) = 3
    val v = graft.text.UnigramVocab.build(Seq(("a", 5L), ("b", 2L)), 10L)
    // leading whitespace yields an empty first token: a word with
    // zero pieces (the q104 contract)
    assert(v.stats(" a b").toSeq === Seq(3L, 2L, 0L, 5L))
    // a word containing an out-of-alphabet char is one UNK piece
    assert(v.stats("ax b").toSeq === Seq(2L, 2L, 1L, 3L))
  }

  test("UnigramVocab: saveVocab/loadVocab round-trips the exact cost table") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aab x")).toDF("doc_id", "text")
    val v = graft.text.UnigramLm.fit(docs, vocabN = 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_uni_spec").toString
    graft.text.UnigramLm.saveVocab(v, dir, spark)
    val l = graft.text.UnigramLm.loadVocab(spark, dir)
    assert(l.entries === v.entries)
    // the hand-computed table: aa→3, aab→4, a→1, b→3 (q200 spec math)
    assert(v.entries === Seq(("a", 1L), ("aa", 3L), ("aab", 4L), ("b", 3L)))
    // and segmentation through the loaded vocab is identical
    assert(l.stats("aa aa ab").toSeq === v.stats("aa aa ab").toSeq)
  }

  // ------------------------------- q201 three-detector dedup
  test("deduplicateCrossSignal: winnowing edge catches a containment pair both other detectors miss") {
    // doc 2 QUOTES doc 1's 30 tokens inside 90 tokens of filler:
    // 3-gram Jaccard = 28/118 ≈ 0.24 → distance 0.76 > 0.4, so the
    // MinHash detector rejects the pair even as a candidate; the fake
    // phash of different payloads won't sit at hamming ≤ 1. Winnowing
    // guarantees fingerprints inside any shared run ≥ w+k−1 = 6
    // tokens, so the 30-token quote shares ≥ 2 selected fingerprints.
    val quoted = (1 to 30).map(i => s"q$i").mkString(" ")
    val filler = (1 to 90).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, "en", quoted),
      (2L, "en", s"$filler $quoted"),
      (3L, "de", "totally different content here now")
    ).toDF("doc_id", "lang", "text")
    val twoDetector = graft.ops.Multimodal
      .deduplicateCrossModal(spark, docs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(twoDetector === Seq(1L, 2L, 3L),
      "two-detector dedup must MISS the containment pair for this spec to bite")
    val threeDetector = graft.ops.Multimodal
      .deduplicateCrossSignal(spark, docs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(threeDetector === Seq(1L, 3L)) // min-id 1 survives, 2 is the loser
  }

  // ------------------------------- q202 stored PQ codebook
  test("savePq/loadPq/encodePq: frozen codebook round-trips and the increment's codes replay the fit-time assignment") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(7)
    val emb = (0L until 24L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val base = emb.filter($"vec_id" % 3 =!= 0)
    val inc = emb.filter($"vec_id" % 3 === 0)
    val books = Similarity.fitPqBooks(base, m = 2, nCodes = 4)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_spec").toString
    Similarity.savePq(books, dir)
    val stored = Similarity.loadPq(spark, dir)
    // byte-identical round-trip: (subspace, code, codeword) rows match
    val a = books.orderBy("subspace", "code")
      .as[(Long, Long, Seq[Float])].collect().toSeq
    val b = stored.orderBy("subspace", "code")
      .as[(Long, Long, Seq[Float])].collect().toSeq
    assert(a === b)
    // encoding the increment against the STORED frame = encoding it
    // against the in-memory fit — the codebook is untouched by use
    val viaStored = Similarity.encodePq(inc, stored)
      .as[(Long, Long, Long)].collect().toSeq
    val viaFit = Similarity.encodePq(inc, books)
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaStored === viaFit)
    assert(viaStored.map(_._1).distinct.sorted ===
      (0L until 24L by 3L).toSeq)
    // and a geometry mismatch is refused, not mis-encoded
    val bad = (0L until 4L).map(i =>
      (i, Array.fill(6)(0.5f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.encodePq(bad, stored)
    }
  }

  // ------------------------------- q203 dataset-card diff
  test("cardDiff: per-stat deltas, appearing groups surface at full share") {
    // old snapshot: 2 en/web docs; new: 2 en + 1 de doc — 'de'
    // exists only on the new side and must read value_old = 0 with
    // delta = its full ppm share, not vanish from the join
    val mk = (id: Long, lang: String, text: String) =>
      (id, lang, "web", text)
    val oldDocs = Seq(
      mk(1L, "en", "alpha beta gamma"),
      mk(2L, "en", "alpha beta gamma")).toDF("doc_id", "lang", "source", "text")
    val newDocs = Seq(
      mk(1L, "en", "alpha beta gamma"),
      mk(2L, "en", "delta epsilon"),
      mk(3L, "de", "zeta eta theta iota")).toDF("doc_id", "lang", "source", "text")
    val diff = graft.ops.DatasetCard.cardDiff(oldDocs, newDocs)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(diff("n_docs") === ((2L, 3L, 1L)))
    assert(diff("n_tokens") === ((6L, 9L, 3L)))
    // old has one exact-dup pair; new has none
    assert(diff("n_exact_dup_docs") === ((1L, 0L, -1L)))
    // lang_de appears only in new: 1 of 3 docs = 333333 ppm
    assert(diff("lang_de_ppm") === ((0L, 333333L, 333333L)))
    assert(diff("lang_en_ppm") === ((1000000L, 666666L, -333334L)))
    // every row satisfies delta = new − old by construction
    assert(diff.values.forall { case (o, n, d) => d === n - o })
  }

  // ------------------------------- q208 l-diversity
  test("lDiversity: homogeneous cohort fails the check that k-anonymity passes") {
    // cohort (web, bucket 0): 3 docs all 'en' — k-anonymous at k=3
    // yet 0-diverse (homogeneity attack); cohort (api, 0): 2 en + 1 de
    val docs = Seq(
      (1L, "en", "web", 10L), (2L, "en", "web", 20L), (3L, "en", "web", 30L),
      (4L, "en", "api", 10L), (5L, "de", "api", 20L), (6L, "en", "api", 30L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val got = graft.ops.Privacy.lDiversity(docs, l = 2L, lenBucket = 100L)
      .as[(String, Long, Long, Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("api", 0L, 3L, 2L, "en", 666666L, 1L),
      ("web", 0L, 3L, 1L, "en", 1000000L, 0L)))
    // the homogeneous web cohort has 3 members — big enough to pass
    // any k=3 cohort-size rule — yet leaks its sensitive value; that
    // gap (size ≠ diversity) is the reason this operator exists
  }

  // ------------------------------- q205 ADC retrieval
  test("adcTopK: with nCodes = n the ADC scan is the exact distance — the query retrieves itself at distance 0") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(13)
    val emb = (0L until 16L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val books = Similarity.fitPqBooks(emb, m = 2, nCodes = 16)
    val codes = Similarity.encodePq(emb, books)
    val qv = emb.filter($"vec_id" === 3).select("embedding")
      .as[Array[Float]].collect().head.map(_.toDouble).toSeq
    val top = Similarity.adcTopK(codes, books, qv, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(top.head === ((1L, 3L, 0L)))
    assert(top.map(_._1) === Seq(1L, 2L, 3L))
    // geometry mismatch refused
    intercept[IllegalArgumentException] {
      Similarity.adcTopK(codes, books, qv.take(6), k = 3)
    }
  }

  // ------------------------------- q206 IVF+ADC composition
  test("ivfAssign + adcTopK: one cell degenerates IVFADC to the plain ADC scan") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(17)
    val emb = (0L until 20L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val asg = Similarity.ivfAssign(emb, nCents = 1, nProbe = 1)
      .as[(Long, Long, Seq[Long])].collect()
    assert(asg.length === 20)
    assert(asg.map(_._2).distinct.length === 1)     // everyone in the cell
    assert(asg.forall(a => a._3 === Seq(a._2)))     // probes = [own cell]
    val books = Similarity.fitPqBooks(emb, m = 2, nCodes = 4)
    val qv = emb.filter($"vec_id" === 7).select("embedding")
      .as[Array[Float]].collect().head.map(_.toDouble).toSeq
    val full = Similarity
      .adcTopK(Similarity.encodePq(emb, books), books, qv, k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    // the q206 composition with one cell probes the whole corpus
    val probed = asg.filter(_._1 == 7L).flatMap(_._3).toSet
    val candEmb = emb.filter($"vec_id".isin(
      asg.filter(a => probed.contains(a._2)).map(_._1).toSeq: _*))
    val viaIvf = Similarity
      .adcTopK(Similarity.encodePq(candEmb, books), books, qv, k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaIvf === full)
  }

  // ------------------------------- ann curve instrument
  test("ivfProbeStats: cand_pairs is n at nCents=n/nProbe=1 and n² at nCents=1") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(11)
    val emb = (0L until 16L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()), i % 3)).toDF("vec_id", "embedding", "label")
    // one cell: every query probes the single cell holding everyone
    val one = Similarity.ivfProbeStats(emb, nCents = 1, nProbe = 1)
      .as[(Long, Long, Long)].collect().head
    assert(one === ((16L, 1L, 256L)))
    // n cells, 1 probe: each vector probes its own nearest cell; the
    // pair stream is Σ members·probes = n when every cell holds its
    // own medoid (distinct vectors ⇒ each medoid is its own argmin)
    val own = Similarity.ivfProbeStats(emb, nCents = 16, nProbe = 1)
      .as[(Long, Long, Long)].collect().head
    assert(own._1 === 16L)
    assert(own._3 >= 16L && own._3 <= 32L) // n + slack for shared argmins
  }

  // ------------------------------- PageRank convergence early-exit
  test("PageRank: early-exit output is bit-identical to fixed-rounds (regular graph = instant fixed point)") {
    // on a directed 4-cycle the uniform start IS the integer fixed
    // point (tele 3.75e10 + 85% of 25e10 = 25e10 exactly), so a
    // 200-round request must early-exit at its first probe and return
    // exactly the 1-round output
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r1 = graft.ops.PageRank.ranks(cycle, iterations = 1)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val t0 = System.nanoTime()
    val r200 = graft.ops.PageRank.ranks(cycle, iterations = 200)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r1 === r200)
    assert(r1.map(_._2).distinct === Seq(250000000000L))
    // 200 genuine rounds of join+agg would take minutes; the exit
    // must make this a handful of rounds
    assert(secs < 60.0, s"early exit did not fire: $secs s for 200 rounds")
  }

  test("PageRank: early-exit never fires before the integer fixed point") {
    // asymmetric graph at damping 50: diffs halve per round from
    // ~1.6e11, so rounds 12 and 13 are still moving and must differ
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    def run(n: Int) = graft.ops.PageRank.ranks(e, n, dampingPct = 50)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(run(12) !== run(13))
    // and once converged, a fixed-round run and a much longer
    // early-exiting run agree exactly (identity rounds change nothing)
    assert(run(60) === run(300))
  }

  test("personalizedRanks: early-exit ≡ fixed-rounds on a converging seed graph") {
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    def run(n: Int) = graft.ops.PageRank
      .personalizedRanks(e, seeds, n, dampingPct = 50)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(run(12) !== run(13)) // still moving: probe must not fire
    assert(run(60) === run(300))
  }
}
