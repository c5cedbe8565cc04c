package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BloomFns, Dedup, HeavyHitters, Merge, PageRank}

class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------- Merge

  private def mergeFixture = {
    val base = Seq(
      (1L, "one", 10.0),
      (2L, "two", 20.0),
      (3L, "three", 30.0)
    ).toDF("id", "name", "bal")
    // out-of-order feed: id 1 updated twice (v2 must win although it
    // arrives first), id 2 deleted, id 4 inserted, id 9 deleted while
    // absent (no-op), id 3 updated to a NULL name (must stay NULL)
    val changes = Seq(
      (1L, "one-v2", 99.0, 2L, 10L, "U"),
      (1L, "one-v1", 50.0, 1L, 11L, "U"),
      (2L, "two", 20.0, 1L, 12L, "D"),
      (4L, "four", 40.0, 1L, 13L, "U"),
      (9L, "nine", 90.0, 1L, 14L, "D"),
      (3L, null, 33.0, 1L, 15L, "U")
    ).toDF("id", "name", "bal", "v", "tie", "op")
    (base, changes)
  }

  test("applyCdc: latest wins, tombstones delete, inserts land, absent-key delete is a no-op") {
    val (base, changes) = mergeFixture
    val got = Merge.applyCdc(base, changes, "id", Seq("v", "tie"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, Some("one-v2"), 99.0), // v=2 beats v=1 despite feed order
      (3L, None, 33.0),           // change row taken WHOLESALE: null stays null
      (4L, Some("four"), 40.0)    // insert; id 2 deleted; id 9 never existed
    ))
  }

  test("applyCdc: version tie broken by the declared tie-break column") {
    val base = Seq((1L, "base", 0.0)).toDF("id", "name", "bal")
    val changes = Seq(
      (1L, "tie-low", 1.0, 5L, 100L, "U"),
      (1L, "tie-high", 2.0, 5L, 200L, "U")
    ).toDF("id", "name", "bal", "v", "tie", "op")
    val got = Merge.applyCdc(base, changes, "id", Seq("v", "tie")).collect()
    assert(got.head.getString(1) === "tie-high")
  }

  test("applyCdc is partitioning-independent") {
    val (base, changes) = mergeFixture
    val a = Merge.applyCdc(base, changes, "id", Seq("v", "tie"))
      .orderBy("id").collect().toSeq
    val b = Merge.applyCdc(base.repartition(7), changes.repartition(5),
      "id", Seq("v", "tie")).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("scd2History: intervals chain, tombstones close history without appearing") {
    val changes = Seq(
      (1L, 10.0, 1L, 100L, "U"),
      (1L, 20.0, 3L, 101L, "U"),
      (1L, 0.0, 5L, 102L, "D"), // closes the v=3 row, emits nothing
      (2L, 5.0, 2L, 103L, "U")  // open-ended current row
    ).toDF("id", "bal", "v", "tie", "op")
    val got = Merge.scd2History(changes, "id", Seq("v", "tie"))
      .orderBy("id", "v")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      (1L, 10.0, 1L, Some(3L)), // closed by the v=3 update
      (1L, 20.0, 3L, Some(5L)), // closed by the tombstone
      (2L, 5.0, 2L, None)       // still current
    ))
  }

  test("snapshotDiff classifies I/U/D, skips unchanged keys, round-trips through applyCdc") {
    val before = Seq(
      (1L, "same", 1.0),
      (2L, "will-change", 2.0),
      (3L, "will-delete", 3.0)
    ).toDF("id", "name", "bal")
    val after = Seq(
      (1L, "same", 1.0),
      (2L, "changed", 2.0),
      (4L, "new", 4.0)
    ).toDF("id", "name", "bal")
    val diff = Merge.snapshotDiff(before, after, "id")
    val got = diff.orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("U", 2L), ("D", 3L), ("I", 4L)))
    // the diff IS a valid change feed: applying it onto `before`
    // reconstructs `after` exactly (versionless feed — one change per
    // key, a constant version column suffices)
    val feed = diff.withColumn("v", lit(1L))
    val rebuilt = Merge.applyCdc(before, feed, "id", Seq("v"))
    assert(rebuilt.orderBy("id").collect().toSeq ===
      after.orderBy("id").collect().toSeq)
  }

  test("snapshotDiff counts NULL→value and value→NULL as updates") {
    val before = Seq((1L, Some("x")), (2L, None: Option[String]))
      .toDF("id", "name")
    val after = Seq((1L, None: Option[String]), (2L, Some("y")))
      .toDF("id", "name")
    val got = Merge.snapshotDiff(before, after, "id").orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
    assert(got.toSeq === Seq(("U", 1L, None), ("U", 2L, Some("y"))))
  }

  // ------------------------------------------------------ HeavyHitters

  test("misra-gries sketch never loses a true heavy hitter (superset guarantee)") {
    // adversarial stream: 2 heavy tokens drowned in 5000 distinct ones,
    // spread over many partitions so merge() shrinking is exercised
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta")
    val noise = (0 until 5000).map(i => s"noise$i")
    val toks = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(heavy ++ noise), 16)
      .toDF("token")
    val n = heavy.size + noise.size
    val support = 300.0 / n // beta sits exactly on the threshold
    val got = HeavyHitters.exact(toks, "token", support)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("alpha" -> 400L, "beta" -> 300L))
  }

  test("heavy hitters equals the naive exact groupBy answer") {
    val toks = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.ops.TextStats.tokens(col("text"))).as("token"))
    val support = 0.003
    val fast = HeavyHitters.exact(toks, "token", support)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val nTotal = toks.count()
    val thresh = math.ceil(support * nTotal).toLong
    val naive = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fast === naive)
    assert(naive.nonEmpty) // fixture must actually exercise the path
  }

  // ------------------------------------------------------------- Bloom

  test("bloom has no false negatives and a sane false-positive rate") {
    val members = (0L until 2000L).map(i => i * 2654435761L)
    val bloomBytes = members.toDF("h")
      .agg(BloomFns.bloomAgg(col("h"), numBits = 1 << 15, numHashes = 5))
      .collect().head.getAs[Array[Byte]](0)
    val bloomLit = lit(bloomBytes)
    // every member answers "maybe" — a bloom "no" must be certain
    val misses = members.toDF("h")
      .filter(!BloomFns.bloomContains(bloomLit, col("h"))).count()
    assert(misses === 0L)
    // non-members mostly answer "no" (32k bits / 2k elems ≈ 16 bits per
    // element → fp well under 5%)
    val probes = (1L to 10000L).map(i => i * 7919L + 3L).toDF("h")
      .filter(BloomFns.bloomContains(lit(bloomBytes), col("h"))).count()
    assert(probes < 500L, s"false-positive count $probes out of 10000")
  }

  test("bloom-prefiltered contamination scores equal the exact broadcast-set path") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val ref = docs.filter(col("doc_id") % 10 === 0)
    val exact = Dedup.contaminationScores(corpus, ref)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = Dedup.bloomContaminationScores(corpus, ref)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed === exact)
    assert(exact.nonEmpty)
  }

  // ---------------------------------------------------------- PageRank

  test("pagerank: star graph ranks the hub highest, leaves equal, mass bounded") {
    // 1..6 all point at 0, and 0 points back at 1..6 (no dangling mass)
    val leaves = (1L to 6L)
    val edges = (leaves.map(i => (i, 0L)) ++ leaves.map(i => (0L, i)))
      .toDF("src", "dst")
    val ranks = PageRank.ranks(edges, iterations = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hub = ranks(0L)
    val leafRanks = leaves.map(ranks)
    assert(leafRanks.distinct.size === 1, "symmetric leaves must tie exactly")
    assert(hub > leafRanks.head * 3, s"hub $hub vs leaf ${leafRanks.head}")
    // floor division only ever LOSES mass: total ≤ Scale, and most of
    // the mass must survive 10 rounds
    val total = ranks.values.sum
    assert(total <= PageRank.Scale)
    assert(total > PageRank.Scale * 9 / 10)
  }

  test("pagerank is partitioning-independent (exact integer equality)") {
    val edges = (for {
      i <- 0L until 40L
      j <- Seq((i * 7 + 3) % 40, (i * 13 + 5) % 40) if j != i
    } yield (i, j)).toDF("src", "dst")
    val a = PageRank.ranks(edges, 5).orderBy("id").collect().toSeq
    val b = PageRank.ranks(edges.repartition(13), 5).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("pagerank checkpoint cadences are semantically invisible") {
    val edges = (for {
      i <- 0L until 30L
      j <- Seq((i * 11 + 7) % 30, (i * 3 + 1) % 30) if j != i
    } yield (i, j)).toDF("src", "dst")
    // 10 rounds: every-other-round lineage cuts (default threshold 8)
    // vs the single-action lazy DAG — bit-identical integer ranks
    val cut = PageRank.ranks(edges, 10, midCheckpointAbove = 8)
      .orderBy("id").collect().toSeq
    val lazyDag = PageRank.ranks(edges, 10, midCheckpointAbove = 100)
      .orderBy("id").collect().toSeq
    assert(cut === lazyDag)
  }
}
