package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 wave-2 specs: the codegen'd IntL1 counting-filter kernel,
  * the LSH parameter audit, the bloom FPR audit (with the Fnv64
  * avalanche), the code-switch profile, the batch padding-waste
  * audit, and the calibration audit. */
class Round16bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------- IntL1Expr (q170 counting filter)
  test("IntL1Expr: equals the HOF aggregate∘zip_with∘abs form, null semantics match") {
    val rows = Seq(
      (Array(1, 5, 0, 7), Array(4, 5, 2, 1)),
      (Array(0, 0, 0, 0), Array(0, 0, 0, 0)),
      (Array(Int.MaxValue, 0, 3, 9), Array(Int.MinValue, 2, 3, 4)))
      .toDF("a", "b")
    val out = rows.select(
      graft.engine.Columns.ofExpr(graft.ops.IntL1Expr(
        graft.engine.Columns.exprOf(col("a")),
        graft.engine.Columns.exprOf(col("b")))).as("l1"),
      aggregate(zip_with(col("a").cast("array<long>"),
        col("b").cast("array<long>"), (x, y) => abs(x - y)),
        lit(0L), (acc, v) => acc + v).as("hof"))
      .as[(Long, Long)].collect()
    out.foreach { case (l1, hof) => assert(l1 === hof) }
    // length mismatch -> null (zip_with pads then abs(null) nulls the
    // SUM in the HOF form; the kernel contract is NULL, matching)
    val mis = Seq((Array(1, 2), Array(1, 2, 3))).toDF("a", "b")
      .select(graft.engine.Columns.ofExpr(graft.ops.IntL1Expr(
        graft.engine.Columns.exprOf(col("a")),
        graft.engine.Columns.exprOf(col("b")))).as("l1"))
      .collect()
    assert(mis.head.isNullAt(0))
  }

  test("IntL1Expr: rejects non-array<int> inputs at analysis time") {
    val df = Seq((Array(1L, 2L), Array(1L, 2L))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(graft.engine.Columns.ofExpr(graft.ops.IntL1Expr(
        graft.engine.Columns.exprOf(col("a")),
        graft.engine.Columns.exprOf(col("b"))))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<int>")
      || ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  // ------------------------------- SortedIntersectCountExpr kernel
  test("SortedIntersectCountExpr: equals array_intersect size on sorted distinct sets") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map { _ =>
      val a = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted.toArray
      val b = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted.toArray
      (a, b)
    } :+ ((Array.empty[Long], Array(1L, 2L)))
    val out = rows.toDF("a", "b").select(
      graft.engine.Columns.ofExpr(graft.ops.SortedIntersectCountExpr(
        graft.engine.Columns.exprOf(col("a")),
        graft.engine.Columns.exprOf(col("b")))).as("k"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    out.foreach { case (k, ref) => assert(k === ref) }
  }

  // ------------------------------- q188 LSH parameter audit
  test("minhashParamAudit: an exact duplicate is found at recall 1 in every config") {
    // doc 2 duplicates doc 1; doc 3 is unrelated. sampleMod=1 samples
    // every doc, so truth = the 2 directed (dup, dup) pairs
    val base = (1 to 40).map(i => s"tok${i * 13 % 97}z$i").mkString(" ")
    val other = (1 to 40).map(i => s"oth${i * 29 % 89}q$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val out = graft.ops.LshAudit.minhashParamAudit(docs, sampleMod = 1L)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((12L, 2L), (8L, 3L), (4L, 6L)))
    out.foreach { case (_, _, nSample, nTrue, nCand, nHit, recall, _) =>
      assert(nSample === 3L)
      assert(nTrue === 2L)  // (1->2) and (2->1)
      assert(nHit === 2L)   // identical sigs collide in every band
      assert(nCand >= 2L)
      assert(recall === Some(1000000L))
    }
  }

  test("minhashParamAudit: query sampling keeps single-endpoint pairs (directed truth)") {
    // same corpus; sampleMod chosen so EXACTLY ONE of the twin docs is
    // a query — the truth set must still contain its directed pair
    val base = (1 to 40).map(i => s"tok${i * 13 % 97}z$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    // find a mod where exactly one of ids 1,2 lands in bucket 0
    val mod = (2L to 50L).find { m =>
      val picked = Seq(1L, 2L).map(id =>
        Seq(id).toDF("id").select(
          graft.ops.Splits.hashBucketN(col("id"), m).as("b"))
          .as[Long].head() == 0L)
      picked.count(identity) == 1
    }.get
    val out = graft.ops.LshAudit.minhashParamAudit(docs, sampleMod = mod)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    out.foreach { r =>
      assert(r._3 === 1L) // one query
      assert(r._4 === 1L) // its directed twin pair IS ground truth
      assert(r._7 === Some(1000000L))
    }
  }

  // ------------------------------- q189 bloom FPR audit + Fnv64
  test("Fnv64Expr: matches an independent byte-wise FNV-1a re-derivation") {
    // independent reference: BigInt arithmetic mod 2^64
    def ref(v: Long): Long = {
      val m = BigInt(2).pow(64)
      var h = BigInt("14695981039346656037")
      (0 until 8).foreach { b =>
        val byte = (v >>> (8 * b)) & 0xffL
        h = ((h ^ BigInt(byte)) * BigInt(1099511628211L)).mod(m)
      }
      h.bigInteger.longValue()
    }
    Seq(0L, 1L, 999999999L, 1000000006L, 536870911L).foreach { v =>
      assert(graft.ops.Fnv64Expr.hash(v) === ref(v))
    }
  }

  test("fprAudit: counts reproduce a driver-side simulation of the position schedule") {
    val docs = (1L to 30L).map { id =>
      (id, (1 to 25).map(i => s"d${id}w${i * 7 % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val numBits = 1 << 10
    val row = graft.ops.BloomAudit.fprAudit(docs, numBits = numBits,
      numHashes = 3, memberMod = 3L).collect().head
    // independent JVM simulation: re-derive grams, members, probes,
    // positions (the signed-long positions() sequence re-implemented
    // here from the documented contract)
    val txts = docs.as[(Long, String)].collect()
    def gramHashes(t: String): Set[Long] = {
      val tk = t.split("\\s+").filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3).map { g =>
        g.foldLeft(0L)((acc, tok) =>
          (acc * 10007L + graft.ops.CodepointHashExpr.hash(tok)) % 1000000007L)
      }.toSet
    }
    def bucket(id: Long): Long = {
      val base = id & 0xFFFFFFFFL
      val lo = base & 0xFFFFL
      val hi = base >>> 16
      (((lo * 2654435761L) + ((hi * 2654435761L) % 65536L << 16)) % 4294967296L + 4294967296L) % 4294967296L % 3L
    }
    val members = txts.filter(t => bucket(t._1) == 0L).flatMap(t => gramHashes(t._2)).toSet
    val probes = txts.filter(t => bucket(t._1) != 0L).flatMap(t => gramHashes(t._2)).toSet -- members
    def positions(gh: Long): Seq[Long] = {
      val u = graft.ops.Fnv64Expr.hash(gh)
      val h2 = (u >>> 33) * 0xff51afd7ed558ccdL | 1L
      (0 until 3).map(i => ((u + i * h2) & Long.MaxValue) % numBits)
    }
    val ones = members.flatMap(positions)
    val fps = probes.count(p => positions(p).forall(ones.contains))
    assert(row.getAs[Long]("n_members") === members.size.toLong)
    assert(row.getAs[Long]("n_probes") === probes.size.toLong)
    assert(row.getAs[Long]("n_ones") === ones.size.toLong)
    assert(row.getAs[Long]("n_false_pos") === fps.toLong)
    assert(row.getAs[Long]("fill_ppm") === ones.size.toLong * 1000000L / numBits)
  }

  test("fprAudit: numHashes=4 uses the fourth probe (simulation agrees at k=4)") {
    val docs = (1L to 20L).map { id =>
      (id, (1 to 20).map(i => s"k${id}v${i * 5 % 17}").mkString(" "))
    }.toDF("doc_id", "text")
    val numBits = 1 << 9
    val row = graft.ops.BloomAudit.fprAudit(docs, numBits = numBits,
      numHashes = 4, memberMod = 2L).collect().head
    val txts = docs.as[(Long, String)].collect()
    def gramHashes(t: String): Set[Long] = {
      val tk = t.split("\\s+").filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3).map { g =>
        g.foldLeft(0L)((acc, tok) =>
          (acc * 10007L + graft.ops.CodepointHashExpr.hash(tok)) % 1000000007L)
      }.toSet
    }
    def bucket(id: Long): Long = {
      val base = id & 0xFFFFFFFFL
      ((base & 0xFFFFL) * 2654435761L +
        (((base >>> 16) * 2654435761L) % 65536L << 16)) % 4294967296L % 2L
    }
    val members = txts.filter(t => bucket(t._1) == 0L).flatMap(t => gramHashes(t._2)).toSet
    val probes = txts.filter(t => bucket(t._1) != 0L).flatMap(t => gramHashes(t._2)).toSet -- members
    def positions(gh: Long): Seq[Long] = {
      val u = graft.ops.Fnv64Expr.hash(gh)
      val h2 = (u >>> 33) * 0xff51afd7ed558ccdL | 1L
      (0 until 4).map(i => ((u + i * h2) & Long.MaxValue) % numBits)
    }
    val ones = members.flatMap(positions)
    val fps = probes.count(p => positions(p).forall(ones.contains))
    assert(row.getAs[Long]("n_ones") === ones.size.toLong)
    assert(row.getAs[Long]("n_false_pos") === fps.toLong)
    assert(row.getAs[Long]("n_hashes") === 4L)
  }

  // ------------------------------- q190 code-switch profile
  test("codeSwitchProfile: hand-computed mixed, monolingual and empty docs") {
    val en20 = Seq.fill(20)("the").mkString(" ")
    val es20 = Seq.fill(20)("el").mkString(" ")
    val noise = Seq.fill(20)("zzz").mkString(" ")
    val docs = Seq(
      (1L, s"$en20 $es20"),          // 2 windows: en, es
      (2L, en20),                    // 1 window: en
      (3L, s"$noise $en20 $noise"),  // und, en, und
      (4L, "")                       // tokenless
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.codeSwitchProfile(docs)
      .orderBy("doc_id")
      .as[(Long, Long, String, Option[Long], Long, Long)].collect().toSeq
    assert(out(0) === ((1L, 2L, "en", Some(500000L), 1L, 2L)))
    assert(out(1) === ((2L, 1L, "en", Some(1000000L), 0L, 1L)))
    assert(out(2) === ((3L, 3L, "und", Some(666666L), 2L, 1L)))
    assert(out(3) === ((4L, 0L, "und", None, 0L, 0L)))
  }

  test("codeSwitchProfile: window argmax tie breaks in marker-list order") {
    // one 'the' (en) and one 'der' (de) in a single window: tie at 1,
    // en wins (list order); a window of only 'der' is de
    val docs = Seq((1L, "the der"), (2L, "der der")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.codeSwitchProfile(docs)
      .orderBy("doc_id")
      .as[(Long, Long, String, Option[Long], Long, Long)].collect().toSeq
    assert(out(0)._3 === "en")
    assert(out(1)._3 === "de")
  }

  test("codeSwitchProfile: exact window-multiple token counts produce no ragged window") {
    // exactly 40 tokens -> 2 full windows, no third partial window
    val docs = Seq((1L, (Seq.fill(20)("the") ++ Seq.fill(20)("el")).mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.ops.TextStats.codeSwitchProfile(docs)
      .as[(Long, Long, String, Option[Long], Long, Long)].collect().head
    assert(r._2 === 2L && r._5 === 1L && r._6 === 2L)
  }

  test("vocabGrowth: a level of 1 sees exactly the first doc's types") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "a f")).toDF("doc_id", "text")
    val first = docs.select(col("doc_id"),
      graft.ops.Splits.hashBucketN(col("doc_id"), 1L << 32).as("hv"))
      .orderBy("hv", "doc_id").as[(Long, Long)].collect().head._1
    val expTypes = Map(1L -> 3L, 2L -> 2L, 3L -> 2L)(first)
    val out = graft.ops.TextStats.vocabGrowth(docs, levels = Seq(1L))
      .as[(Long, Long, Long, Long)].collect().head
    assert(out._2 === 1L && out._4 === expTypes)
  }

  // ------------------------------- q191 batch padding-waste audit
  test("batchWasteAudit: hand-computed sorted policy; sorted never wastes more than hash") {
    // lengths 10, 9, 5, 3 at B=2: sorted batches (10,9) and (5,3) —
    // padding 1 + 2 = 3, rectangle 20 + 10 = 30
    val docs = Seq(
      (1L, Seq.fill(10)("a").mkString(" ")),
      (2L, Seq.fill(9)("b").mkString(" ")),
      (3L, Seq.fill(5)("c").mkString(" ")),
      (4L, Seq.fill(3)("d").mkString(" "))).toDF("doc_id", "text")
    val out = graft.ops.Packing.batchWasteAudit(docs, batchSize = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val sorted = out("sorted_desc")
    assert(sorted === (("sorted_desc", 4L, 2L, 27L, 3L, 100000L)))
    val hash = out("hash")
    assert(hash._2 === 4L && hash._3 === 2L && hash._4 === 27L)
    // sorted-desc grouping minimizes sum(batch max) over all orders
    assert(sorted._5 <= hash._5)
  }

  // ------------------------------- q197 dataset card
  test("DatasetCard: hand-computed card on a four-doc corpus with one exact dup") {
    val docs = Seq(
      (1L, "the a b", "en", "s1"),
      (2L, "the a b", "en", "s1"),   // exact dup of 1
      (3L, "x y", "de", "s2"),
      (4L, "z z z z z", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val card = graft.ops.DatasetCard.card(docs)
      .as[(String, Long)].collect().toMap
    assert(card("n_docs") === 4L)
    assert(card("n_tokens") === 3L + 3L + 2L + 5L)
    assert(card("n_exact_dup_docs") === 1L)
    assert(card("n_types") === 6L) // the a b x y z
    assert(card("n_stopwords") === 4L) // 'the','a' twice each
    assert(card("lang_en_ppm") === 750000L)
    assert(card("lang_de_ppm") === 250000L)
    assert(card("source_s1_ppm") === 500000L)
    // lengths 3,3,2,5 sorted: 2,3,3,5. p50: smallest len with
    // cum*100 >= 50*4 -> cum >= 2 -> len 3; p90 -> cum >= 3.6 -> len 5
    assert(card("len_p50") === 3L)
    assert(card("len_p90") === 5L)
    assert(card("len_p99") === 5L)
  }

  // ------------------------------- q198 incremental winnowing
  test("incrementalOverlapPairs: equals the batch operator restricted to cross pairs") {
    val rnd = new scala.util.Random(19)
    def doc(seed: Int) =
      (1 to 60).map(i => s"w${(i * 7 + seed) % 41}t${(i + seed) % 13}").mkString(" ")
    val corpus = (1L to 8L).map(id => (id, doc(id.toInt))).toDF("doc_id", "text")
    // increment: one exact copy of corpus doc 3, one fresh doc
    val inc = Seq((101L, doc(3)), (102L, doc(99))).toDF("doc_id", "text")
    val stored = graft.ops.Winnowing.fingerprints(corpus, k = 3, w = 4)
    val out = graft.ops.Winnowing
      .incrementalOverlapPairs(inc, stored, minShared = 2L, maxDf = 64L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // batch reference over the union, restricted to (inc, corpus)
    val union = corpus.unionAll(inc)
    val batch = graft.ops.Winnowing
      .overlapPairs(union, k = 3, w = 4, minShared = 2L, maxDf = 64L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .filter { case (a, b, _, _, _, _) => a <= 8L && b >= 100L }
      .map { case (a, b, ns, na, nb, ppm) => (b, a, ns, nb, na, ppm) }
      .sorted
    assert(out.sorted === batch)
    // the exact copy matches its original at full containment
    val copyRow = out.find(r => r._1 === 101L && r._2 === 3L).get
    assert(copyRow._6 === 1000000L)
  }

  // ------------------------------- q199 template prefixes
  test("templatePrefixFamilies: shared openings group; short docs excluded") {
    val open = "the quick brown fox jumps over the lazy"   // 8 tokens
    val docs = Seq(
      (1L, open + " tail one x y z"),
      (2L, open + " a completely different continuation"),
      (3L, "some other opening entirely for this doc here now"),
      (4L, "too short")).toDF("doc_id", "text")
    val fam = graft.ops.TextStats.templatePrefixFamilies(docs,
      prefixTokens = 8, minFamily = 2L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(fam.length === 1)
    val (_, n, ex, ppm) = fam.head
    // denominator is the 3 docs long enough to have a full prefix
    assert((n, ex, ppm) === ((2L, 1L, 666666L)))
  }

  // ------------------------------- q192 calibration audit
  test("calibrationAudit: hand-computed two-bucket reliability table") {
    // scores 10..1 on ids 1..10, label = score >= 8 (3 positives)
    val df = (1L to 10L).map(id => (id, 11L - id)).toDF("doc_id", "s")
    val out = graft.ops.Classifier.calibrationAudit(df,
      score = col("s"), label = col("s") >= 8L, buckets = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // bucket 0 = ranks 1..5 = scores 10..6 -> 3 positives
    assert(out === Seq(
      (0L, 5L, 6L, 10L, 3L, 600000L),
      (1L, 5L, 1L, 5L, 0L, 0L)))
  }

  // ------------------------------- q193 vocabulary growth
  test("vocabGrowth: hand-computed curve on a corpus with known first-seen ranks") {
    // ids 1..4; find their knuth order via the same hashBucketN the op
    // uses, then hand-assemble the expected prefix rows for levels 1,2,4
    val texts = Map(1L -> "a b", 2L -> "b c c", 3L -> "a", 4L -> "d d d d")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val order = docs.select(col("doc_id"),
      graft.ops.Splits.hashBucketN(col("doc_id"), 1L << 32).as("hv"))
      .orderBy("hv", "doc_id").as[(Long, Long)].collect().map(_._1)
    val out = graft.ops.TextStats.vocabGrowth(docs, levels = Seq(1L, 2L, 4L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    def typesAt(s: Int) =
      order.take(s).flatMap(id => texts(id).split(" ")).distinct.size.toLong
    def toksAt(s: Int) =
      order.take(s).map(id => texts(id).split(" ").length.toLong).sum
    assert(out === Seq(
      (1L, 1L, toksAt(1), typesAt(1)),
      (2L, 2L, toksAt(2), typesAt(2)),
      (4L, 4L, toksAt(4), typesAt(4))))
  }

  test("vocabGrowth: monotone in both axes and saturates at the corpus") {
    val docs = (1L to 50L)
      .map(id => (id, (1 to 10).map(i => s"t${(id * 7 + i) % 31}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.TextStats.vocabGrowth(docs,
      levels = Seq(4L, 16L, 64L)).as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    assert(out.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    assert(out.last._2 === 50L) // level 64 realizes the whole corpus
    assert(out.last._3 === 500L)
  }

  // ------------------------------- q196 self-retrieval
  test("selfRetrievalAudit: unique docs self-retrieve at rank 1; an exact twin ties and loses by id") {
    // N = 5 so the twins' shared grams sit at df = 2 ≤ N/2 and keep
    // idf bits (at N = 3 the gate prunes them — df > N/2 is
    // stopword-grade by the operator's own semantics)
    val a = (1 to 30).map(i => s"aa${i * 13 % 97}z$i").mkString(" ")
    def noise(id: Long) =
      (1 to 30).map(i => s"n${id}w${(i * 29 + id) % 89}q$i").mkString(" ")
    val docs = (Seq((1L, a), (2L, a)) ++ (3L to 5L).map(id => (id, noise(id))))
      .toDF("doc_id", "text")
    val out = graft.ops.SparseSim.selfRetrievalAudit(docs, sampleMod = 1L)
      .as[(Long, Long, Option[Long], Long)].collect().toSeq
    // twins share every gram: equal scores, (score desc, id asc) puts
    // doc 1 above doc 2 for BOTH twin queries
    assert(out.map(r => (r._1, r._3)) ===
      Seq((1L, Some(1L)), (2L, Some(2L)), (3L, Some(1L)),
        (4L, Some(1L)), (5L, Some(1L))))
    assert(out.map(_._4) ===
      Seq(1000000L, 500000L, 1000000L, 1000000L, 1000000L))
  }

  // ------------------------------- q195 detector agreement
  test("detectorAgreement: exact twins are flagged by both detectors; kappa positive") {
    // docs 1,2 identical (both detectors must flag the directed pair
    // both ways under sampleMod=1); 3..6 mutually unrelated noise
    val twin = (1 to 40).map(i => s"tw${i * 13 % 97}z$i").mkString(" ")
    val docs = (Seq((1L, twin), (2L, twin)) ++ (3L to 6L).map(id =>
      (id, (1 to 40).map(i => s"n${id}w${(i * 17 + id) % 83}q$i").mkString(" "))))
      .toDF("doc_id", "text")
    val r = graft.ops.LshAudit.detectorAgreement(docs, sampleMod = 1L)
      .collect().head
    assert(r.getAs[Long]("n_universe") === 6L * 5L)
    assert(r.getAs[Long]("n_both") >= 2L)     // (1→2) and (2→1)
    assert(r.getAs[Long]("n_minhash") >= 2L)
    assert(r.getAs[Long]("n_simhash") >= 2L)
    assert(r.getAs[Long]("kappa_ppm") > 0L)
    val po = r.getAs[Long]("po_ppm")
    val pe = r.getAs[Long]("pe_ppm")
    assert(po <= 1000000L && pe <= 1000000L && po >= pe)
  }

  // ------------------------------- q194 stored-IVF append
  test("appendIvf: append ≡ full index for exact probing; radii grow monotonically") {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(8)(rnd.nextFloat() * 2f - 1f)
    val all = (0L until 60L).map(id => (id, vec()))
    val base = all.filter(_._1 % 4 != 0L).toDF("vec_id", "embedding")
    val inc = all.filter(_._1 % 4 == 0L).toDF("vec_id", "embedding")
    val union = all.toDF("vec_id", "embedding")
    val qvec = all.head._2.map(_.toDouble).toSeq

    val (indexed, model) = graft.ops.Similarity.fitIvf(base, nLists = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_append_spec").toString
    graft.ops.Similarity.saveIvf(indexed, model, dir)
    graft.ops.Similarity.appendIvf(spark, inc, dir)
    val (stored, m2) = graft.ops.Similarity.loadIvf(spark, dir)
    // every list's radius grew or held (merge-by-max contract)
    model.radii.foreach { case (l, r) => assert(m2.radii(l) >= r) }
    assert(stored.count() === 60L)
    // exact probe over the appended index == brute force over the union
    val viaIndex = graft.ops.Similarity
      .exactIvfKnn(stored, m2, qvec, k = 10, nProbe0 = 1)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    val brute = graft.ops.Similarity.bruteForceKnn(union, qvec, 10)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(viaIndex === brute)
  }

  test("calibrationAudit: equal-count buckets under heavy score ties, deterministic") {
    // constant score: ranks break by id; buckets still 5/5
    val df = (1L to 10L).map(id => (id, 7L)).toDF("doc_id", "s")
    val out = graft.ops.Classifier.calibrationAudit(df,
      score = col("s"), label = col("doc_id") <= 5L, buckets = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) === Seq(5L, 5L))
    // rank order is (score desc, id asc): bucket 0 holds ids 1..5
    assert(out.head._5 === 5L && out(1)._5 === 0L)
  }
}
