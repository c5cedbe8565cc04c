package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round16OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------- LPA convergence early-exit
  test("LabelProp: early-exit output is bit-identical to full-rounds (exact fixed point)") {
    // two triangles + bridge converge by round 3 (hand-simulated in
    // the round-15 spec); 25 requested rounds must return the same
    // labels as 4 — the early-exit fires at the fixed point and every
    // skipped round would have been the identity
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val r4 = graft.ops.LabelProp.propagate(edges, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val r25 = graft.ops.LabelProp.propagate(edges, rounds = 25)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r4 === r25)
    assert(r4 === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
  }

  test("LabelProp: early-exit never fires on a genuine oscillation") {
    // the single-edge 2-cycle changes labels EVERY round, so rounds
    // stay authoritative: odd and even round counts still differ
    val edge = Seq((1L, 2L)).toDF("a", "b")
    assert(graft.ops.LabelProp.propagate(edge, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
      === Seq((1L, 2L), (2L, 1L)))
    assert(graft.ops.LabelProp.propagate(edge, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
      === Seq((1L, 1L), (2L, 2L)))
  }

  // ------------------------------- q170 composed blocking key
  test("editDistancePairs: composed class-count key is recall-1 (equals plain blocking)") {
    // seeded corpus of vowel/consonant strings with random edits —
    // including edits that change the FIRST character (where blocking
    // on the first codepoint would lose the pair) and edits that push
    // the vowel count across a bucket boundary (where the ±1
    // expansion must catch it)
    val rnd = new scala.util.Random(42)
    val alpha = "aeioubcdfg "
    def randDoc(len: Int): String =
      (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val base = (1 to 20).map(i => (i.toLong, randDoc(20 + rnd.nextInt(30))))
    val edited = base.take(10).map { case (id, tx) =>
      val arr = tx.toCharArray
      // 1..3 random substitutions; position 0 included on purpose
      (1 to 1 + rnd.nextInt(3)).foreach { _ =>
        arr(rnd.nextInt(arr.length)) = alpha(rnd.nextInt(alpha.length)) }
      (id + 100L, new String(arr))
    }
    val docs = (base ++ edited).toDF("doc_id", "text")
    def run(ck: Option[String]) =
      graft.ops.Dedup.editDistancePairs(docs, maxDist = 3, classKey = ck)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val plain = run(None)
    val composed = run(Some("aeiou"))
    assert(plain.nonEmpty) // the 10 edited docs guarantee close pairs
    assert(composed === plain)
  }

  test("editDistancePairs: composed key catches a pair straddling a class-bucket edge") {
    // maxDist=3 -> w=4. a has 4 vowels (bucket 1), b has 3 (bucket 0):
    // one substitution apart, so the pair must survive composition
    val docs = Seq((1L, "aaaa bbbb"), (2L, "aaab bbbb")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.editDistancePairs(docs, maxDist = 3,
      classKey = Some("aeiou")).as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L, 9L, 9L, 1L)))
  }

  // ------------------------------- q182 approximate hard negatives
  test("ivfHardNegatives: probing every cell reduces to the exact operator") {
    val emb = Seq(
      (1L, Array(0.5f), "A"), (2L, Array(0.375f), "B"),
      (3L, Array(0.625f), "B"), (4L, Array(1.0f), "A"),
      (5L, Array(-0.125f), "B")).toDF("vec_id", "embedding", "label")
    val exact = graft.ops.Similarity.hardNegatives(emb, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val full = graft.ops.Similarity.ivfHardNegatives(emb, k = 2,
      nCents = 5, nProbe = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(full === exact)
  }

  test("ivfHardNegatives: narrow probe returns a subset ranked exactly like the exact miner") {
    val emb = Seq(
      (1L, Array(0.5f), "A"), (2L, Array(0.375f), "B"),
      (3L, Array(0.625f), "B"), (4L, Array(1.0f), "A"),
      (5L, Array(-0.125f), "B")).toDF("vec_id", "embedding", "label")
    val ap = graft.ops.Similarity.ivfHardNegatives(emb, k = 2,
      nCents = 3, nProbe = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val exactPairs = graft.ops.Similarity.hardNegatives(emb, k = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    // every returned pair is a true cross-label pair with the exact
    // integer distance, ranks strictly increasing per query
    ap.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2) === (1L to rows.length.toLong))
      assert(rows.map(_._4) === rows.map(_._4).sorted)
    }
    ap.foreach { case (qid, _, neg, d2) =>
      assert(exactPairs((qid, neg)) === d2)
    }
  }

  // ------------------------------- q183 chunk-level dedup
  test("chunkDedupPairs: an edited re-crawl still matches every unedited chunk (end-to-end metamorphic)") {
    val toks = (1 to 240).map(i => s"w${i * 37 % 211}x$i")
    val orig = toks.mkString(" ")
    // edit one token in the middle; runtime-verify it is NOT a cut
    // token so exactly one chunk's fingerprint changes
    val editPos = 120
    val edited = toks.updated(editPos, "EDITED").mkString(" ")
    val docs = Seq((1L, orig), (2L, edited)).toDF("doc_id", "text")
    val fps = graft.ops.Chunking.contentDefinedChunks(docs, maskBits = 4)
    val k1 = fps.filter($"doc_id" === 1L)
      .select("n_tokens", "hash_sum").as[(Long, Long)].collect().toSet
    val k2 = fps.filter($"doc_id" === 2L)
      .select("n_tokens", "hash_sum").as[(Long, Long)].collect().toSet
    val spans = fps.filter($"doc_id" === 1L)
      .select("start_pos", "n_tokens").as[(Long, Long)].collect()
    // the edit lands strictly inside one chunk of doc 1
    val hit = spans.filter(s => editPos >= s._1 && editPos < s._1 + s._2)
    assert(hit.length === 1)
    // CDC shift-robustness: every other chunk key survives the edit
    assert((k1 & k2).size === k1.size - 1)
    val out = graft.ops.Chunking.chunkDedupPairs(docs, maskBits = 4,
      maxDf = 64L, minShared = 2L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, (k1.size - 1).toLong,
      k1.size.toLong, k2.size.toLong,
      (k1.size - 1).toLong * 1000000L / math.min(k1.size, k2.size))))
  }

  test("chunkDedupPairs: the df cap drops boilerplate chunk keys before pairing") {
    // 5 docs all sharing the same single-chunk content: with
    // maxDf = 4 the shared key is boilerplate -> no pairs at all
    val docs = (1 to 5).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    assert(graft.ops.Chunking.chunkDedupPairs(docs, maskBits = 5,
      maxDf = 4L, minShared = 1L).count() === 0L)
  }

  // ------------------------------- q184 clamped CDC
  test("contentDefinedChunksClamped: unbinding clamps reproduces the pure predicate exactly") {
    val text = (1 to 300).map(i => s"tok$i word${i % 17}").mkString(" ")
    val docs = Seq((1L, text), (2L, text.takeWhile(_ != 'w'))).toDF("doc_id", "text")
    val pure = graft.ops.Chunking.contentDefinedChunks(docs, maskBits = 3)
      .select("doc_id", "chunk_idx", "start_pos", "n_tokens", "hash_sum")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val clamped = graft.ops.Chunking.contentDefinedChunksClamped(docs,
      maskBits = 3, minLen = 1, maxLen = 1000000)
      .select("doc_id", "chunk_idx", "start_pos", "n_tokens", "hash_sum")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(clamped === pure)
  }

  test("contentDefinedChunksClamped: chunk lengths land in [minLen, maxLen] with the tail exempt") {
    val text = (1 to 500).map(i => s"t${i * 13 % 419}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = graft.ops.Chunking.contentDefinedChunksClamped(docs,
      maskBits = 3, minLen = 4, maxLen = 16)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_pos", "n_tokens").as[(Long, Long, Long)]
      .collect()
    assert(out.length >= 2)
    // contiguous cover of all 500 positions
    assert(out.head._2 === 0L)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 === a._2 + a._3) }
    assert(out.map(_._3).sum === 500L)
    out.init.foreach(c => assert(c._3 >= 4L && c._3 <= 16L))
    assert(out.last._3 <= 16L)
  }

  // ------------------------------- q186 shuffle-mixing audit
  test("orderMixingAudit: hand-computed adjacency in knuth-hash order") {
    // hash order of ids 1..6 is (5, 2, 4, 1, 6, 3); with sources
    // 1-3 = A and 4-6 = B the shuffled order alternates BABABA —
    // zero same-source adjacencies against an expectation of
    // 3*2/(6*5) = 200000 ppm per source
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("doc_id", "source")
    val out = graft.ops.Splits.orderMixingAudit(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("A", 3L, 0L, 0L, 200000L),
      ("B", 3L, 0L, 0L, 200000L)))
  }

  test("orderMixingAudit: a single source saturates at 1e6 ppm observed and expected") {
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"))
      .toDF("doc_id", "source")
    val out = graft.ops.Splits.orderMixingAudit(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("A", 4L, 3L, 1000000L, 1000000L)))
  }

  // ------------------------------- q187 k-anonymity ladder
  test("kAnonymityLevels: hand-computed generalization ladder") {
    val docs = Seq(
      (1L, "en", "web", 100L), (2L, "en", "web", 150L),
      (3L, "en", "web", 120L), // len bucket 1 shared by 3 -> level 0
      (4L, "en", "web", 250L), // unique bucket; (en,web)=4 -> level 1
      (5L, "en", "book", 300L), // (en,book)=1; (en)=5 -> level 2
      (6L, "fr", "web", 100L)) // (fr)=1 -> level 3, corpus cohort 6
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = graft.ops.Privacy.kAnonymityLevels(docs, k = 3L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L, 3L), (2L, 0L, 3L), (3L, 0L, 3L),
      (4L, 1L, 4L), (5L, 2L, 5L), (6L, 3L, 6L)))
  }

  // ------------------------------- q185 product quantization
  test("pqCodes: hand-computed seeded-medoid codebooks and assignments") {
    // Knuth-hash order of ids 1..5 is (5, 2, 4, 1, 3), so with
    // nCodes = 2 the codewords are id5 (-1250 quantized) as code 1
    // and id2 (3750) as code 2; every other vector sits nearer 3750
    val emb = Seq(
      (1L, Array(0.5f)), (2L, Array(0.375f)), (3L, Array(0.625f)),
      (4L, Array(1.0f)), (5L, Array(-0.125f))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.pqCodes(emb, m = 1, nCodes = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L, 2L), (2L, 0L, 2L), (3L, 0L, 2L),
      (4L, 0L, 2L), (5L, 0L, 1L)))
  }

  test("pqAdcRecall: nCodes = n degenerates ADC to the exact distance (recall 1)") {
    // every vector is its own codeword: the reconstruction is exact,
    // so ADC sums equal the full quantized distance and recall is
    // 1e6 at every k
    val emb = Seq(
      (1L, Array(0.5f, 0.1f)), (2L, Array(0.375f, -0.2f)),
      (3L, Array(0.625f, 0.9f)), (4L, Array(1.0f, 0.0f)),
      (5L, Array(-0.125f, 0.4f))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.pqAdcRecall(emb, queryId = 1L,
      ks = Seq(1, 3, 5), m = 2, nCodes = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 1000000L), (3L, 3L, 1000000L),
      (5L, 5L, 1000000L)))
  }

  test("contentDefinedChunksClamped: forced cuts produce exact maxLen chunks when no boundary fires") {
    // single repeated token whose hash is runtime-verified non-zero
    // mod 2^15 (no natural boundary): every cut is forced at maxLen
    val docs = Seq((1L, (1 to 47).map(_ => "kappa").mkString(" ")))
      .toDF("doc_id", "text")
    assert(graft.ops.Chunking.contentDefinedChunks(docs, maskBits = 15)
      .count() === 1L) // no natural boundaries at this mask
    val out = graft.ops.Chunking.contentDefinedChunksClamped(docs,
      maskBits = 15, minLen = 2, maxLen = 10)
      .orderBy("chunk_idx").select("n_tokens").as[Long].collect().toSeq
    assert(out === Seq(10L, 10L, 10L, 10L, 7L))
  }
}
