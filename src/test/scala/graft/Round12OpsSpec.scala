package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Classifier, Splits}
import graft.text.{Subword, SubwordVocab}

class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------- Subword
  // Vocab {join, hash} derives:
  //   starts = {join, hash} ∪ chars {j,o,i,n,h,a,s}
  //   conts  = proper suffixes {oin,in,n,ash,sh,h} ∪ the same chars
  private lazy val vocab = SubwordVocab.build(Seq("join", "hash"))

  test("subword: whole-vocab token is one piece") {
    assert(vocab.stats("join").toSeq === Seq(1L, 1L, 0L))
  }

  test("subword: char continuation after whole-token match (joins = join+s)") {
    assert(vocab.stats("joins").toSeq === Seq(1L, 2L, 0L))
  }

  test("subword: greedy multi-char suffix continuation (nosh = n+o+sh)") {
    // pos0: no vocab token prefixes "nosh" → char 'n'; pos1: conts have
    // no 'os*' piece → char 'o'; pos2: 'sh' (suffix of hash) beats 'h'
    assert(vocab.stats("nosh").toSeq === Seq(1L, 3L, 0L))
  }

  test("subword: longest start beats char, continuation restarts greedy (hashjoin)") {
    // pos0: 'hash' (len 4) beats 'h'; 'join' is NOT a continuation
    // piece (starts only), so: 'j' char, then suffix 'oin' → 3 pieces
    assert(vocab.stats("hashjoin").toSeq === Seq(1L, 3L, 0L))
  }

  test("subword: letter outside the vocab alphabet → UNK, one piece") {
    assert(vocab.stats("wash").toSeq === Seq(1L, 1L, 1L)) // 'w' unmatched
  }

  test("subword: whole text sums words/pieces/unks; empty split artifacts count 0 pieces") {
    // " join" splits to ["", "join"]: 2 words, empty word adds nothing
    assert(vocab.stats(" join").toSeq === Seq(2L, 1L, 0L))
    assert(vocab.stats("join joins wash nosh").toSeq === Seq(4L, 1 + 2 + 1 + 3L, 1L))
  }

  test("subword: DataFrame op matches the direct vocab computation") {
    val docs = Seq(
      (0L, "join hash join"),
      (1L, "joins nosh"),
      (2L, "wash wash join")
    ).toDF("doc_id", "text")
    // vocabN=2 over this corpus yields {join, hash}: join appears 3x,
    // hash 1x, wash 2x... so top-2 by (cnt desc, token asc) = join(3), wash(2)
    val got = Subword.subwordStats(docs, vocabN = 2).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // vocab {join, wash}: alphabet {j,o,i,n,w,a,s,h}, conts
    // {oin,in,n,ash,sh,h} ∪ chars
    val v2 = SubwordVocab.build(Seq("join", "wash"))
    val expect = Seq(
      (0L, "join hash join"),
      (1L, "joins nosh"),
      (2L, "wash wash join")
    ).map { case (id, t) =>
      val s = v2.stats(t); (id, s(0), s(1), s(2))
    }
    assert(got.toSeq === expect)
  }

  // ------------------------------------------------------- Classifier
  test("classifier: score is the sum of per-token bucket weights, hand-checked") {
    // h("ab") = (0*131+97)*131 + 98 mod p = 12805; bucket = 12805 % 64 = 5
    // w(5) = (5*2654435761) % 2^32 % 1001 - 500
    val h = (97L * 131 + 98) % 1000000007L
    assert(h === 12805L)
    val w = (h % 64) * 2654435761L % 4294967296L % 1001L - 500L
    val got = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val row = Classifier.scoreDocs(got).collect().head
    assert(row.getLong(1) === 2L)
    assert(row.getLong(2) === 2 * w)
    assert(row.getBoolean(3) === (2 * w >= 0))
  }

  test("classifier: empty tokens are excluded; empty text scores 0 and is kept") {
    val df = Seq((0L, ""), (1L, "  "), (2L, "x")).toDF("doc_id", "text")
    val rows = Classifier.scoreDocs(df).orderBy("doc_id").collect()
    assert(rows(0).getLong(1) === 0L && rows(0).getLong(2) === 0L && rows(0).getBoolean(3))
    assert(rows(1).getLong(1) === 0L && rows(1).getLong(2) === 0L)
    assert(rows(2).getLong(1) === 1L)
  }

  test("classifier: non-ASCII tokens hash by CODEPOINT (ascii() byte parity trap)") {
    // Spark's ascii() would feed the first UTF-8 BYTE of 'é' (0xC3 as a
    // signed byte = -61) into the fold and diverge from the oracle's
    // unicode() (233) — the round-12 advice trap. The expression must
    // fold true code points, including supplementary-plane ones
    // (surrogate pairs must count as ONE code point, not two).
    def cpHash(s: String): Long = {
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); i += Character.charCount(cp)
        acc = (acc * 131 + cp) % 1000000007L
      }
      acc
    }
    def weight(h: Long): Long = (h % 64) * 2654435761L % 4294967296L % 1001L - 500L
    val toks = Seq("héllo", "wörld", "日本語", "x😀y") // last: U+1F600
    val expected = toks.map(t => weight(cpHash(t))).sum
    val row = Classifier.scoreDocs(
      Seq((0L, toks.mkString(" "))).toDF("doc_id", "text")).collect().head
    assert(row.getLong(1) === 4L)
    assert(row.getLong(2) === expected)
    // every bucket weight must come from a non-negative hash: spot-check
    // that the single-token hashes are non-negative and within [0, p)
    toks.foreach(t => assert(cpHash(t) >= 0L && cpHash(t) < 1000000007L))
  }

  test("classifier: score is stable under repartitioning (pure function of text)") {
    val docs = (0L until 50L).map(i => (i, s"tok$i alpha beta$i")).toDF("doc_id", "text")
    val a = Classifier.scoreDocs(docs).orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    val b = Classifier.scoreDocs(docs.repartition(7)).orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    assert(a === b)
  }

  test("subword: UNK when the dead letter is mid-word, not only at position 0") {
    // 'jowx': j, o consumed; 'wx' has no continuation and 'w' is
    // outside the {join,hash} alphabet → whole word collapses to UNK
    assert(vocab.stats("jowx").toSeq === Seq(1L, 1L, 1L))
  }

  test("subword: piece count is bounded by word length and deterministic") {
    val words = Seq("join", "joins", "nosh", "hashjoin", "ajsn", "oinoin", "h")
    words.foreach { w =>
      val a = vocab.stats(w)
      val b = vocab.stats(w)
      assert(a.toSeq === b.toSeq)
      assert(a(1) <= w.length, s"$w: pieces ${a(1)} > len")
      assert(a(1) >= 1)
    }
  }

  // ---------------------------------------------- plan-shape guards
  test("subwordStats and scoreDocs stay map-only: no exchange in the operator plan") {
    val docs = Seq((0L, "join hash"), (1L, "nosh wash")).toDF("doc_id", "text")
    val p1 = Subword.subwordStats(docs, vocabN = 2)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"subwordStats plan shuffles:\n$p1")
    val p2 = Classifier.scoreDocs(docs)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"scoreDocs plan shuffles:\n$p2")
  }

  // -------------------------------------------- packing w/ countExpr
  test("packSequences countExpr overrides the whitespace count (subword-budget packing)") {
    import graft.ops.Packing
    // three docs of 3/4/5 "units" under a custom count; budget 6 cuts
    // the 12-unit stream at 6: doc0 [0,3), doc1 [3,7) crosses, doc2 [7,12)
    val docs = Seq((0L, "aaa"), (1L, "bbbb"), (2L, "ccccc")).toDF("doc_id", "text")
    val spans = Packing.packSequences(docs, budget = 6L,
        countExpr = Some(length(col("text")).cast("long")))
      .orderBy("seq_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.toSeq === Seq(
      (0L, 0L, 0L, 0L, 3L),  // doc0 fully in seq0 at offset 0
      (0L, 1L, 0L, 3L, 3L),  // doc1 first 3 units fill seq0
      (1L, 1L, 3L, 0L, 1L),  // doc1 last unit opens seq1
      (1L, 2L, 0L, 1L, 5L))) // doc2 after it
    // default count still the whitespace tokenCount: same docs = 1 token each
    val d = Packing.packSequences(docs, budget = 2L).collect()
    assert(d.map(_.getLong(4)).sum === 3L)
  }

  // ------------------------------------------- repetitionProfile
  test("repetitionProfile: hand-computed fractions at n=1..3, null below n tokens") {
    import graft.ops.TextStats
    // "a a b": 1-grams [a,a,b] → (3-2)/3; 2-grams [a a, a b] → 0; 3-grams [a a b] → 0
    // "x": 1-gram dup 0.0; n=2,3 null
    val docs = Seq((0L, "a a b"), (1L, "x")).toDF("doc_id", "text")
    val rows = TextStats.repetitionProfile(docs).orderBy("doc_id").collect()
    assert(rows(0).getLong(1) === 3L)
    assert(math.abs(rows(0).getDouble(2) - 1.0 / 3.0) < 1e-15)
    assert(rows(0).getDouble(3) === 0.0 && rows(0).getDouble(4) === 0.0)
    assert(rows(1).getLong(1) === 1L)
    assert(rows(1).getDouble(2) === 0.0)
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))
  }

  test("repetitionProfile matches repetitionStats at n=2 on shared rows") {
    import graft.ops.TextStats
    val docs = Seq(
      (0L, "the cat sat on the cat sat again"),
      (1L, "all same all same all same")
    ).toDF("doc_id", "text")
    val prof = TextStats.repetitionProfile(docs).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val stats = TextStats.repetitionStats(docs).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(prof === stats)
  }

  // ---------------------------------------------------- vocabCoverage
  test("vocabCoverage: cumulative counts and fractions, deterministic tie order") {
    import graft.ops.TextStats
    // counts: a=3, b=2, c=1 → total 6; ties impossible here
    val docs = Seq((0L, "a b a"), (1L, "a b c")).toDF("doc_id", "text")
    val got = TextStats.vocabCoverage(docs, n = 2).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1, "a", 3L, 3L, 6L, 0.5),
      (2, "b", 2L, 5L, 6L, 5.0 / 6.0)))
  }

  // ------------------------------------------------------ capPerGroup
  test("capPerGroup admits at most k per group, in sampleKPerGroup's hash order") {
    val docs = (0L until 40L).map(i => (i, s"g${i % 2}", s"text $i"))
      .toDF("doc_id", "grp", "text")
    val capped = Splits.capPerGroup(docs, "grp", "doc_id", k = 3)
    assert(capped.count() === 6L)
    assert(capped.groupBy("grp").count().collect().forall(_.getLong(1) === 3L))
    // original columns survive, and the admitted set matches the sampler
    assert(capped.columns.toSet === Set("grp", "doc_id", "text", "rk", "hv"))
    val expect = Splits.sampleKPerGroup(docs, "grp", "doc_id", 3)
      .select("grp", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = capped.select("grp", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("capPerGroup admission is append-stable: a kept id stays unless displaced by a lower hash") {
    val docs = (0L until 30L).map(i => (i, "g", i.toString)).toDF("doc_id", "grp", "text")
    val before = Splits.capPerGroup(docs, "grp", "doc_id", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val more = (0L until 60L).map(i => (i, "g", i.toString)).toDF("doc_id", "grp", "text")
    val after = Splits.capPerGroup(more, "grp", "doc_id", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // appends can only displace, never reorder survivors arbitrarily:
    // every row kept after the append was either kept before or is new
    assert(after.forall(id => before.contains(id) || id >= 30L))
  }
}
