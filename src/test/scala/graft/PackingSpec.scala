package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

class PackingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val budget = 16L

  private def fixture = Seq(
    (0L, Seq.fill(5)("a").mkString(" ")),    // 5 tokens
    (1L, Seq.fill(20)("b").mkString(" ")),   // straddles a cut
    (2L, "c"),
    (3L, Seq.fill(40)("d").mkString(" ")),   // spans 3+ sequences
    (7L, Seq.fill(3)("e").mkString(" ")))    // sparse ids are fine
    .toDF("doc_id", "text")

  test("token counting splits on ANY whitespace run (the q82/q83 oracle contract)") {
    // "a  b\tc \n d" = 4 tokens under \s+, 5 under a single-space
    // split — the exact divergence the hardened DuckDB oracle
    // (regexp_split_to_array(text, '\s+')) now matches
    val df = Seq((0L, "a  b\tc \n d"), (1L, "x y")).toDF("doc_id", "text")
    val spans = Packing.packSequences(df, budget).collect()
      .map(r => (r.getLong(1), r.getLong(4)))
    assert(spans.toMap === Map(0L -> 4L, 1L -> 2L))
  }

  test("spans tile every sequence to exactly `budget` tokens (last may be short)") {
    val packed = Packing.packSequences(fixture, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySeq = packed.groupBy(_._1).toSeq.sortBy(_._1)
    val lastSeq = bySeq.map(_._1).max
    bySeq.foreach { case (seq, rows) =>
      val total = rows.map(_._5).sum
      if (seq < lastSeq) assert(total === budget, s"seq $seq not full: $total")
      else assert(total <= budget && total > 0)
      // spans tile the sequence contiguously from offset 0
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"seq $seq does not start at offset 0")
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, _, o1, l1), (_, _, _, o2, _)) =>
          assert(o1 + l1 === o2, s"gap/overlap inside seq $seq")
        case _ =>
      }
    }
  }

  test("spans reconstruct every document exactly once, in order") {
    val packed = Packing.packSequences(fixture, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nTok = Map(0L -> 5L, 1L -> 20L, 2L -> 1L, 3L -> 40L, 7L -> 3L)
    packed.groupBy(_._2).foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"doc $doc does not start at doc_off 0")
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, o1, _, l1), (_, _, o2, _, _)) =>
          assert(o1 + l1 === o2, s"doc $doc spans not contiguous")
        case _ =>
      }
      assert(sorted.map(_._5).sum === nTok(doc), s"doc $doc tokens lost/duplicated")
      // a doc's spans sit on consecutive sequences
      assert(sorted.map(_._1).toSeq === (sorted.head._1 to sorted.last._1).toSeq)
    }
  }

  test("packing is independent of input partitioning") {
    val a = Packing.packSequences(fixture.repartition(1), budget).collect().toSet
    val b = Packing.packSequences(fixture.repartition(7), budget).collect().toSet
    assert(a === b)
  }

  // ------------------------------------------------------- packBestFit
  // skewed lengths: a few near-budget docs + many small ones — the
  // shape where placement order decides fragmentation
  private def skewed = Seq(
    9L -> 9, 10L -> 9, 11L -> 9, 12L -> 9,
    20L -> 7, 21L -> 7, 22L -> 7, 23L -> 7,
    30L -> 5, 31L -> 5,
    40L -> 2, 41L -> 2, 42L -> 2, 43L -> 2, 44L -> 2, 45L -> 2,
    50L -> 1, 51L -> 1, 52L -> 1, 53L -> 1,
    60L -> 20) // oversized (> budget): unpackable without splitting
    .map { case (id, n) => (id, Seq.fill(n)("t").mkString(" ")) }
    .toDF("doc_id", "text")

  test("best-fit packing: every packable doc lands whole in exactly one bin, no overflow") {
    val packed = Packing.packBestFit(skewed, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // oversized doc 60 dropped, all others placed exactly once
    val expected = skewed.filter(col("doc_id") =!= 60L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(packed.map(_._2).sorted === expected)
    packed.groupBy(_._1).foreach { case (bin, rows) =>
      assert(rows.map(_._3).sum <= budget, s"bin $bin overflows")
    }
  }

  test("best-fit packing is a pure function of (id, n_tok): partitioning-independent") {
    val a = Packing.packBestFit(skewed.repartition(1), budget).collect().toSet
    val b = Packing.packBestFit(skewed.repartition(7), budget, groupSize = 8).collect().toSet
    // same groupSize must agree across partitionings...
    val a8 = Packing.packBestFit(skewed.repartition(3), budget, groupSize = 8).collect().toSet
    assert(a8 === b)
    // ...and the default single-slice result must also be stable
    val a1 = Packing.packBestFit(skewed.repartition(5), budget).collect().toSet
    assert(a === a1)
  }

  test("FFD beats next-fit-in-id-order on bins and splits nothing, where q82 splits docs") {
    val items = Seq(9, 9, 9, 9, 7, 7, 7, 7, 5, 5, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1)
    val totalTok = items.sum // 90 tokens
    val packed = Packing.packBestFit(skewed, budget).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // no-split property: exactly one bin row per packable doc
    assert(packed.length === items.length)
    assert(packed.map(_._2).sum === totalTok.toLong)
    val ffdBins = packed.map(_._1).distinct.length
    // next-fit in id order (the no-sort baseline FFD must not lose
    // to): close the bin whenever the next doc doesn't fit
    var nfBins = 1; var fill = 0L
    items.foreach { n =>
      if (fill + n > budget) { nfBins += 1; fill = n.toLong } else fill += n.toLong
    }
    assert(ffdBins < nfBins, s"FFD used $ffdBins bins vs next-fit $nfBins")
    // golden FFD trace on this fixture: 9+7 pairs fill four bins to
    // exactly 16, fifth bin takes 5+5+2+2+2, sixth the remainder —
    // 6 bins, waste 6*16-90 = 6 (vs next-fit's 7 bins / waste 22)
    assert(ffdBins === 6)
    assert(ffdBins * budget - totalTok === 6L)
    // the opposite trade: concat-and-cut wastes nothing but splits
    // boundary docs — FFD splits none
    val spans = Packing.packSequences(skewed.filter(col("doc_id") =!= 60L), budget)
      .collect().map(r => r.getLong(1))
    val splitDocs = spans.groupBy(identity).count(_._2.length > 1)
    assert(splitDocs >= 1, "concat-and-cut should split at least one boundary doc here")
  }

  test("no corpus-sized single-partition window in the plan") {
    // the operator's scale contract: the only unpartitioned window
    // (the logical Window node prints `[functions], [partitionBy],
    // [orderBy]` — empty partition list = one task) reads the
    // per-BUCKET aggregate (`btotal`, one row per bucketSpan ids),
    // never the doc-level frame; the doc-level running sum over
    // `n_tok` must carry a non-empty partition list.
    val plan = Packing.packSequences(fixture, budget, bucketSpan = 2L)
      .queryExecution.optimizedPlan.toString
    // the logical Window node prints `Window [fns], [partitionBy],
    // [orderBy]` with the partition group OMITTED when empty — so a
    // partitioned window line carries two `], [` separators and an
    // unpartitioned (single-task) one carries exactly one
    def groups(l: String) = "\\], \\[".r.findAllIn(l).size
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size === 2, s"expected exactly 2 windows in:\n$plan")
    val unpartitioned = windows.filter(groups(_) == 1)
    assert(unpartitioned.size === 1, s"exactly one single-task window allowed:\n$plan")
    assert(unpartitioned.head.contains("btotal") && !unpartitioned.head.contains("n_tok"),
      s"the single-task window must read bucket totals only:\n${unpartitioned.head}")
    val partitioned = windows.filter(groups(_) == 2)
    assert(partitioned.size === 1 && partitioned.head.contains("sum(n_tok"),
      s"the doc-level running sum must be a partitioned window:\n$plan")
  }
}
