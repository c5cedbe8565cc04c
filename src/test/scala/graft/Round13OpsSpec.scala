package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

class Round13OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- BPE
  // Hand-derivable corpus (counts weighted by word frequency):
  //   low×4 lower×2 lowest new×3 newer newest wider wide×2 width
  // Round 1: (l,o) 8 occurrences (low/lower/lowest) — top.
  // Round 2: (lo,w) 8 — the merged symbol chains immediately.
  // Round 3: (e,w) 5 (new/newer/newest) beats (i,d) 4; tie-breaks never
  //   fire here but the count ordering is exercised.
  // Rounds 4-6: (i,d) 4, then (n,ew) 5, then (w,id) 4.
  private val docs = Seq(
    (0L, "low lower lowest low low"),
    (1L, "new newer newest new"),
    (2L, "wider wide wide width"),
    (3L, "low new wide lower"),
    (4L, "  leading space artifact")).toDF("doc_id", "text")

  test("bpe: learned merges match the hand computation, in order") {
    val m = Bpe.fit(docs, k = 6)
    assert(m.merges === IndexedSeq(
      ("l", "o"), ("lo", "w"), ("e", "w"), ("i", "d"), ("n", "ew"), ("w", "id")))
  }

  test("bpe: per-doc piece counts after 6 merges, hand-checked") {
    // low=low(1) lower=low,e,r(3) lowest=low,e,s,t(4) new=n,ew→new?
    // careful: after (e,w) then (n,ew): new = [n,ew] → [new] (1 piece);
    // newer = [new,e,r] (3); newest = [new,e,s,t] (4);
    // wide = [w,id,e] → [wid,e] (2); wider = [wid,e,r] (3);
    // width = [wid,t,h] (3); leading/space/artifact stay chars.
    val rows = Bpe.bpeStats(docs, k = 6).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows === Array(
      (0L, 5L, 10L),  // low(1)+lower(3)+lowest(4)+low(1)+low(1)
      (1L, 4L, 9L),   // new(1)+newer(3)+newest(4)+new(1)
      (2L, 4L, 10L),  // wider(3)+wide(2)+wide(2)+width(3)
      (3L, 4L, 7L),   // low(1)+new(1)+wide(2)+lower(3)
      (4L, 4L, 20L))) // leading-split artifact counts as a 0-piece word
  }

  test("bpe: left-to-right non-overlapping merge (aaa -> [aa, a])") {
    // pair counting weights overlap: 'aaa' contributes (a,a) twice, so
    // one doc suffices; apply must NOT merge the fresh 'aa' with the
    // trailing 'a' in the same round
    val df = Seq((0L, "aaa")).toDF("doc_id", "text")
    val m = Bpe.fit(df, k = 1)
    assert(m.merges === IndexedSeq(("a", "a")))
    val r = Bpe.bpeStats(df, k = 1).collect().head
    assert(r.getLong(2) === 2L) // [aa, a]
  }

  test("bpe: early exhaustion stops cleanly (all words single-symbol)") {
    val df = Seq((0L, "a b a")).toDF("doc_id", "text")
    val m = Bpe.fit(df, k = 4)
    assert(m.merges.isEmpty)
    val r = Bpe.bpeStats(df, k = 4).collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 3L)
  }

  test("bpe: stats stable under repartitioning (pure function of corpus)") {
    val a = Bpe.bpeStats(docs, k = 6).orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    val b = Bpe.bpeStats(docs.repartition(7), k = 6).orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    assert(a === b)
  }

  // ---------------------------------------------- benchContamination
  // Deterministic synthetic embeddings: seeded pseudo-random unit-ish
  // vectors; ids 0..59, bench = id % 20 == 0 (3 vectors).
  private def vec(id: Long, dim: Int = 8): Array[Float] = {
    val r = new scala.util.Random(id * 1315423911L + 7)
    Array.fill(dim)((r.nextDouble() - 0.5).toFloat)
  }
  private lazy val emb = (0L until 60L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")

  private def bruteMax(corpusIds: Seq[Long], benchIds: Seq[Long]): Map[Long, (Long, Double)] = {
    def unit(a: Array[Float]): Array[Double] = {
      var ss = 0.0; a.foreach(x => ss += x.toDouble * x.toDouble)
      val n = math.sqrt(ss); a.map(_.toDouble / n)
    }
    corpusIds.map { c =>
      val cu = unit(vec(c))
      var best = Double.NegativeInfinity; var bid = -1L
      benchIds.sorted.foreach { b =>
        val bu = unit(vec(b))
        var acc = 0.0
        var i = 0
        while (i < cu.length) { acc += cu(i) * bu(i); i += 1 }
        if (acc > best) { best = acc; bid = b }
      }
      c -> (bid, best)
    }.toMap
  }

  test("benchContamination: equals brute-force max cosine at any threshold") {
    val bench = emb.filter($"vec_id" % 20 === 0)
    val corpus = emb.filter($"vec_id" % 20 =!= 0)
    val tau = 0.2
    val got = graft.ops.Similarity.benchContamination(corpus, bench, minCosine = tau, nLists = 4)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = bruteMax((0L until 60L).filter(_ % 20 != 0), Seq(0L, 20L, 40L))
      .filter(_._2._2 >= tau).toSeq.sortBy(_._1)
      .map { case (c, (b, m)) => (c, b, m) }
    assert(got.length === exp.length)
    got.zip(exp).foreach { case ((gc, gb, gm), (ec, eb, em)) =>
      assert(gc === ec && gb === eb)
      assert(gm === em, s"cosine mismatch for $gc")
    }
  }

  test("benchContamination: stored-IVF path prunes list partitions and stays exact") {
    val bench = emb.filter($"vec_id" % 20 === 0)
    val corpus = emb.filter($"vec_id" % 20 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_bc_ivf").toString
    // a high threshold → few lists survive the triangle bound; the
    // stored path must read only those partitions, and results must
    // equal the in-memory path exactly
    val stored = graft.ops.Similarity.benchContamination(corpus, bench,
      minCosine = 0.5, nLists = 8, storageDir = Some(dir))
    val mem = graft.ops.Similarity.benchContamination(corpus, bench,
      minCosine = 0.5, nLists = 8)
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_list"),
      s"expected ivf_list partition pruning in:\n$plan")
    assert(stored.orderBy("vec_id").collect().map(_.toSeq).toSeq ===
      mem.orderBy("vec_id").collect().map(_.toSeq).toSeq)
  }

  test("benchContamination: refuses a corpus-sized benchmark side (fail fast)") {
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.benchContamination(emb, emb, minCosine = 0.5, maxBench = 10)
    }
  }

  test("bpe: stored merges round-trip — order preserved, stats identical") {
    val m = Bpe.fit(docs, k = 6)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_merges").toString
    Bpe.saveMerges(m, dir, spark)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded.merges === m.merges) // order IS the tokenizer
    val a = docs.select(Bpe.statsCol(col("text"), m)).collect().map(_.getSeq[Long](0)).toSeq
    val b = docs.select(Bpe.statsCol(col("text"), loaded)).collect().map(_.getSeq[Long](0)).toSeq
    assert(a === b)
  }

  // ---------------------------------------------------- packShuffled
  test("packShuffled: spans conserve every token exactly, once") {
    val d = (0L until 50L).map(i => (i, Seq.fill((i % 9 + 1).toInt)(s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = graft.ops.Packing.packShuffled(d, budget = 16L).collect()
    // per-doc span lengths sum to the doc's token count
    val perDoc = spans.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(4)).sum).toMap
    (0L until 50L).foreach(i => assert(perDoc(i) === i % 9 + 1))
    // sequence offsets tile each sequence without gaps or overlaps
    spans.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getLong(3))
      sorted.zip(sorted.drop(1)).foreach { case (x, y) =>
        assert(x.getLong(3) + x.getLong(4) === y.getLong(3))
      }
    }
  }

  test("packShuffled: pure function of the id set (repartition-invariant) and actually shuffled") {
    val d = (0L until 60L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val a = graft.ops.Packing.packShuffled(d, budget = 10L)
      .orderBy("seq_id", "doc_id").collect().map(_.toSeq).toSeq
    val b = graft.ops.Packing.packShuffled(d.repartition(7), budget = 10L)
      .orderBy("seq_id", "doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    // the permutation must differ from id order: with equal-length
    // docs, id-order packing puts docs 0,1,2 in sequence 0
    val seq0 = a.filter(_.head == 0L).map(_(1).asInstanceOf[Long]).toSet
    assert(seq0 !== Set(0L, 1L, 2L),
      "hash order coincided with id order — permutation not applied?")
  }

  // ------------------------------------------------------------ Sharding
  import graft.ops.Sharding

  private lazy val shardDocs = (0L until 40L)
    .map(i => (i, Seq.fill((i % 7 + 1).toInt)(s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  test("sharding: every doc lands in exactly one shard, at its start offset") {
    val a = Sharding.assignShards(shardDocs, budget = 10L)
      .orderBy("doc_id").collect()
    assert(a.length === 40)
    var start = 0L
    a.foreach { r =>
      assert(r.getLong(2) === start, s"start of doc ${r.getLong(0)}")
      assert(r.getLong(3) === start / 10, "shard = start div budget")
      start += r.getLong(1)
    }
  }

  test("sharding: manifest totals reconcile with the corpus exactly") {
    val m = Sharding.shardManifest(Sharding.assignShards(shardDocs, budget = 10L))
    val totalDocs = m.agg(sum($"n_docs")).head().getLong(0)
    val totalToks = m.agg(sum($"n_tokens")).head().getLong(0)
    assert(totalDocs === 40L)
    assert(totalToks === (0L until 40L).map(_ % 7 + 1).sum)
  }

  test("sharding: assignment + hash invariant under repartitioning") {
    val a = Sharding.shardManifest(Sharding.assignShards(shardDocs, budget = 10L))
      .orderBy("shard_id").collect().map(_.toSeq).toSeq
    val b = Sharding.shardManifest(Sharding.assignShards(shardDocs.repartition(7), budget = 10L))
      .orderBy("shard_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("sharding: writer round-trip — stored shards reproduce the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val manifest = Sharding.writeShards(shardDocs, dir, budget = 10L)
      .orderBy("shard_id").collect()
    // re-derive every manifest column from what actually landed in the
    // shard directories: counts, token sums, content hash, id range
    val written = spark.read.parquet(s"$dir/shards")
    val re = written
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(graft.ops.TextStats.tokenCount($"text")).as("n_tokens"),
        pmod(sum(graft.ops.TextStats.rollingFingerprint($"text")), lit(1000000007L)).as("content_hash"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy("shard_id").collect()
    assert(manifest.map(_.toSeq).toSeq === re.map(_.toSeq).toSeq)
    // shard directories are the partition layout (prunable by shard_id)
    val dirs = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.length.toLong === manifest.length.toLong)
  }

  // ------------------------------------------- keep-best dedup (q119)
  test("deduplicateKeepBest: cluster keeps the max-score member, ties to min id") {
    val base = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, base, 1L),                 // exact twin of 3, near-dup of 2
      (2L, base + " extra", 7L),      // highest score in cluster {1,2,3}
      (3L, base, 1L),                 // exact twin of 1 (same text, same score)
      (4L, "completely different words entirely separate content here now", 0L),
      (5L, "red green blue yellow purple orange pink gray colors list", 4L),
      (6L, "red green blue yellow purple orange pink gray colors lists", 4L) // tie with 5
    ).toDF("doc_id", "text", "q")
    val kept = graft.ops.Dedup.deduplicateKeepBest(docs, col("q"),
        maxJaccardDist = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // {1,3} collapse exactly to 1; cluster {1,2} keeps 2 (score 7 > 1);
    // {5,6} tie on score 4 → min id 5; 4 untouched
    assert(kept === Array(2L, 4L, 5L))
  }

  test("deduplicateKeepBest: non-text score keeps the best EXACT twin, output column is score") {
    val base = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, base, 1L),            // exact twin of 3, lower stored score
      (2L, base + " extra", 7L), // near-dup of {1,3}
      (3L, base, 9L)             // best twin AND best of the whole cluster
    ).toDF("doc_id", "text", "q")
    val kept = graft.ops.Dedup.deduplicateKeepBest(docs, col("q"),
        maxJaccardDist = 0.5)
    // score is evaluated per ORIGINAL row, so twin 3 (score 9) survives
    // the exact collapse and then beats 2 (score 7) in the cluster —
    // min-id twin collapse would have discarded the 9 before the argmax
    val rows = kept.select("doc_id", "score").as[(Long, Long)].collect()
    assert(rows === Array((3L, 9L)))
    assert(kept.columns.contains("score") && !kept.columns.contains("__score"))
  }

  // ------------------------------------- duplicated-span excision (q120)
  test("exciseDuplicatedSpans: keep-first cuts later occurrences only") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y a b c d z"),
      (3L, "p q r p q r p q r")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.exciseDuplicatedSpans(docs, shingleSize = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 holds the first occurrences of "a b c" and "b c d" → intact;
    // doc 2 loses positions 2-5 (union of the two dup spans) → "x y z";
    // doc 3's self-repeats: first gram occurrences are at 0,1,2, dup
    // occurrences at 3..6 cover positions 3-8 → "p q r"
    assert(out === Array(
      (1L, 5L, 0L, "a b c d e"),
      (2L, 7L, 4L, "x y z"),
      (3L, 9L, 6L, "p q r")))
  }

  // ------------------------------------------ source vocab overlap (q121)
  test("sourceVocabOverlap: exact vocab sizes, shared counts, zero-overlap pairs") {
    val docs = Seq(
      (1L, "a b c", "A"), (2L, "b d", "A"),
      (3L, "b c e", "B"),
      (4L, "z", "C")).toDF("doc_id", "text", "source")
    val rows = graft.ops.TextStats.sourceVocabOverlap(docs)
      .orderBy("source_a", "source_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows === Array(
      ("A", "B", 4L, 3L, 2L, 2.0 / 5.0),
      ("A", "C", 4L, 1L, 0L, 0.0),
      ("B", "C", 3L, 1L, 0L, 0.0)))
  }

  // ------------------------------------------- target affinity (q122)
  test("targetAffinityScores: hand-computed bucket counts, integer rate, empty guard") {
    // dim=4; single-char tokens hash to their codepoint: a→1 b→2 c→3 d→0
    val target = Seq((100L, "a a b")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d"), // lut = [d:0, a:2, b:1, c:0] → 2+1+0+0 = 3
      (2L, "c d"),     // 0
      (3L, " ")        // no tokens → n_tok 0, rate 0 (div-by-zero guard)
    ).toDF("doc_id", "text")
    val rows = graft.ops.Classifier.targetAffinityScores(corpus, target, dim = 4L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows === Array(
      (1L, 4L, 3L, 750000L),
      (2L, 2L, 0L, 0L),
      (3L, 0L, 0L, 0L)))
  }

  // --------------------------------------- label centroid cosine (q123)
  test("labelCentroidSimilarity: hand-computed centroids, fixed-point mean, repartition-stable") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0), // centroid (1e6, 0)
      (3L, Seq(0.0f, 1.0f), 1),                           // centroid (0, 1e6)
      (4L, Seq(0.5f, 0.5f), 2),                           // centroid (5e5, 5e5)
      (5L, Seq(1.0f, 0.0f), 3), (6L, Seq(0.0f, 0.0f), 3)  // mean floor → (5e5, 0)
    ).toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Similarity.labelCentroidSimilarity(df)
        .orderBy("label_a", "label_b")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(4)))
    val rows = run(emb)
    val inv = 5e11 / (math.sqrt(1e12) * math.sqrt(5e11)) // 1/√2 via the same arithmetic
    assert(rows.map(t => (t._1, t._2)) ===
      Array((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)))
    assert(rows(0)._3 === 0.0)                // orthogonal centroids
    assert(rows(1)._3 === inv)                // 45° exact fixed-point
    assert(rows(2)._3 === 1.0)                // same direction, mean-floored half
    assert(rows(5)._3 === inv)
    // integer quantization before aggregation ⇒ partitioning-invariant
    assert(run(emb.repartition(7)) === rows)
  }

  // ------------------------------------------------- epoch plan (q124)
  test("epochPlan: sqrt-temperature targets, fixed-point repeats, upsampling > 1 epoch") {
    val docs = Seq(
      (1L, "a b c d", "A"),
      (2L, "a b c d", "B"), (3L, "a b c d", "B"),
      (4L, "a b c d", "B"), (5L, "a b c d", "B")).toDF("doc_id", "text", "source")
    val rows = graft.ops.Splits.epochPlan(docs, budgetTokens = 20L, alpha = 0.5)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // w(A)=√4=2, w(B)=√16=4, Σ=6: A target=floor(40/6)=6 → repeats 1.5
    // epochs; B target=floor(80/6)=13 → 0.812 epochs
    assert(rows === Array(
      ("A", 1L, 4L, 6L, 1500L),
      ("B", 4L, 16L, 13L, 812L)))
  }

  // ------------------------------------------ phash near-dup (q125)
  test("phashNearDupPairs: banded pairs equal brute-force all-pairs Hamming (recall 1)") {
    val assets = graft.ops.Multimodal.packAsAssets(
      Seq(
        (1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee"), // identical → hamming 0
        (3L, "aa bb cc dd ef"), (4L, "zz yy xx ww vv"),
        (5L, "aa bb cc dd"), (6L, "mm nn oo pp qq rr")).toDF("doc_id", "text"))
    val spark0 = spark
    def brute(maxH: Int): Set[(Long, Long, Int)] = {
      val s = graft.ops.Multimodal.perceptualHash(spark0, assets).toDF()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      (for {
        (ia, ha) <- s; (ib, hb) <- s if ia < ib
        hm = java.lang.Long.bitCount(ha ^ hb) if hm <= maxH
      } yield (ia, ib, hm)).toSet
    }
    for (maxH <- Seq(0, 1, 3, 7)) {
      val banded = graft.ops.Multimodal.phashNearDupPairs(spark0, assets,
          maxHamming = maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded === brute(maxH), s"maxHamming=$maxH")
    }
    // the identical payloads must surface at radius 0
    assert(brute(0).contains((1L, 2L, 0)))
  }

  // ------------------------------------- centroid outliers (q126)
  test("centroidOutliers: exact integer verdicts, strict cross-multiply, repartition-stable") {
    val emb = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(2.0f), 0),            // symmetric: nobody flagged
      (3L, Seq(0.0f), 1), (4L, Seq(0.0f), 1),
      (5L, Seq(0.0f), 1), (6L, Seq(8.0f), 1)             // 6 is the outlier
    ).toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Similarity.centroidOutliers(df)
        .orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val rows = run(emb)
    // label 0: m=1e6, dist2=1e12 each; 1e12·2 > 2·2e12 is false for both
    // label 1: m=2e6, dist2=(4e12,4e12,4e12,36e12); only 36e12·4 > 2·48e12
    assert(rows === Array(
      (1L, 0, 1000000000000L, false),
      (2L, 0, 1000000000000L, false),
      (3L, 1, 4000000000000L, false),
      (4L, 1, 4000000000000L, false),
      (5L, 1, 4000000000000L, false),
      (6L, 1, 36000000000000L, true)))
    assert(run(emb.repartition(5)) === rows)
  }

  // -------------------------------------------- shard append (q127)
  test("appendShards: increment continues the token stream, existing shards untouched") {
    import graft.ops.Sharding
    // budget 10. Base: starts 0,4,9 → all shard 0 (12 tokens, bounded
    // overrun). Increment: offset 12 → starts 12,18 → both shard 1.
    val base = Seq(
      (1L, "a b c d"), (2L, "e f g h i"), (3L, "j k l")).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "m n o p q r"), (11L, "s t")).toDF("doc_id", "text")
    val m0 = Sharding.shardManifest(Sharding.assignShards(base, budget = 10L))
    val merged = Sharding.appendShards(m0, inc, budget = 10L)
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(merged.map(t => (t._1, t._2, t._3, t._4, t._5)) === Array(
      (0L, 3L, 12L, 1L, 3L),
      (1L, 2L, 8L, 10L, 11L)))
    // the pre-existing shard's manifest row is bit-identical after the
    // append (content_hash included): nothing about shard 0 was rewritten
    val row0Before = m0.orderBy("shard_id").collect().head
    val row0After = Sharding.appendShards(m0, inc, budget = 10L)
      .orderBy("shard_id").collect().head
    assert(row0Before.toSeq === row0After.toSeq)
    // merged manifest ≡ a from-scratch rollup of the union at the same
    // start offsets (hash-combine correctness, not just counts)
    val offset = 12L
    val unionAssigned = Sharding.assignShards(base, budget = 10L)
      .unionByName(Sharding.assignShards(inc, budget = 10L, startOffset = offset))
    val rebuilt = Sharding.shardManifest(unionAssigned)
      .orderBy("shard_id").collect().map(_.toSeq)
    val full = Sharding.appendShards(m0, inc, budget = 10L)
      .orderBy("shard_id").collect().map(_.toSeq)
    assert(full === rebuilt)
  }

  // ---------------------------------------- stratified split (q128)
  test("stratifiedSplit: exact per-stratum quotas in hash order, repartition-stable") {
    // strata sizes 12, 3, 25 → held quotas floor(n/10) = 1, 0, 2
    val docs = (
      (1L to 12L).map(i => (i, "A", "en")) ++
      (101L to 103L).map(i => (i, "A", "de")) ++
      (201L to 225L).map(i => (i, "B", "en"))).toDF("doc_id", "source", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Splits.stratifiedSplit(df, Seq("source", "lang"), 1L, 10L)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))
    val rows = run(docs)
    val byStratum = rows.groupBy(t => (t._2, t._3))
    assert(byStratum(("A", "en")).count(_._7 == "held") === 1)
    assert(byStratum(("A", "de")).count(_._7 == "held") === 0)
    assert(byStratum(("B", "en")).count(_._7 == "held") === 2)
    // held rows are exactly the smallest-(hv, id) prefix of each stratum
    for ((_, g) <- byStratum) {
      val sorted = g.sortBy(t => (t._4, t._1))
      val k = g.length / 10
      assert(sorted.take(k).forall(_._7 == "held"))
      assert(sorted.drop(k).forall(_._7 == "train"))
      // ranks are 1..n within the stratum
      assert(g.map(_._5).sorted === (1L to g.length.toLong).toArray)
    }
    assert(run(docs.repartition(9)) === rows)
  }

  test("stratifiedSplit: concat-colliding and null-bearing tuples stay separate strata") {
    // four DISTINCT strata whose naive string concats collide:
    // ("ab","c")/("a","bc") and (null,"x")/("x",null); 10 rows each,
    // quota floor(10·1/2) = 5 per stratum — a merged key would pool
    // 20 rows into one stratum and hold 10 from the pool instead
    val docs = (
      (1L to 10L).map(i => (i, "ab", "c")) ++
      (11L to 20L).map(i => (i, "a", "bc")) ++
      (21L to 30L).map(i => (i, null.asInstanceOf[String], "x")) ++
      (31L to 40L).map(i => (i, "x", null.asInstanceOf[String])))
      .toDF("doc_id", "source", "lang")
    val rows = graft.ops.Splits.stratifiedSplit(docs, Seq("source", "lang"), 1L, 2L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getString(6)))
    val byStratum = rows.groupBy(t => (t._2, t._3))
    assert(byStratum.size === 4)
    for ((_, g) <- byStratum) {
      assert(g.length === 10)
      assert(g.count(_._4 == "held") === 5) // exact per-tuple quota
    }
  }

  test("epochPlan: huge budgets don't overflow the fixed-point step") {
    // (the sumW == 0 branch is defensive only: tokenCount is ≥ 1 for
    // every non-null string — split of "" yields one empty token, the
    // same semantics the oracle's regexp_split_to_array replays — so
    // no public input reaches it)
    // budget near Long.Max: target·1000 overflows Long (~9.2e18/1000);
    // the BigInt fixed-point hop must keep epochs_x1000 exact
    val docs = Seq((1L, Seq.fill(2000)("a").mkString(" "), "A"))
      .toDF("doc_id", "text", "source")
    val budget = 8000000000000000000L // 8e18
    val r = graft.ops.Splits.epochPlan(docs, budgetTokens = budget)
      .head()
    // single source gets ~the whole budget (the w/sumW double round
    // trip may slip an ulp at 8e18 — that slack is not what's under
    // test); the ×1000 fixed-point step must be BigInt-exact: Long
    // arithmetic would wrap target·1000 to a wildly different value
    val target = r.getLong(3)
    assert(math.abs(target - budget) <= 4096L)
    assert(r.getLong(4) === (BigInt(target) * 1000 / 2000).toLong)
  }

  // ------------------------------------- dedup multiplicity (q130)
  test("deduplicateWithMultiplicity: exact twins + cluster members sum into n_copies") {
    val x = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, x, "en"), (2L, x, "en"),          // exact twins → rep 1, en=2
      (3L, x + " extra", "en"),              // near-dup of the rep
      (4L, "completely different words entirely separate content here now", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = graft.ops.Dedup.deduplicateWithMultiplicity(docs,
        maxJaccardDist = 0.5)
      .select("doc_id", "n_copies").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows === Array((1L, 3L), (4L, 1L)))
  }

  // ------------------------------------- split-leakage repair (q129)
  test("repairSplitLeakage: spanning clusters move wholly to train; audit is clean after") {
    // id→bucket (knuth): 1,2,4→train, 3→val, 11→test
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val docs = Seq(
      (1L, a), (3L, a + " iota"),            // cluster spans train/val
      (2L, b), (4L, b + " ten"),             // cluster all-train
      (11L, "lonely unmatched document with no duplicate partner here")
    ).toDF("doc_id", "text")
    val rows = graft.ops.Dedup.repairSplitLeakage(docs, maxJaccardDist = 0.4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(rows === Array(
      (1L, "train", "train", false),
      (2L, "train", "train", false),
      (3L, "val", "train", true),
      (4L, "train", "train", false),
      (11L, "test", "test", false)))
    // the q111 audit property: after repair, no near-dup pair crosses splits
    val finals = rows.map(t => t._1 -> t._3).toMap
    val pairs = graft.ops.Dedup.minhashPairs(docs, maxJaccardDist = 0.4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (p, q) => finals(p) === finals(q) })
  }
}
