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
