package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L)
    .toDF("p")
  private lazy val intervals = Seq(
    (1L, 0L, 10L),     // p=0,5 in; p=10 out (end exclusive)
    (2L, 10L, 101L),   // spans several buckets: 10,15,99,100 in
    (3L, 100L, 100L),  // empty interval: matches nothing
    (4L, 240L, 260L)   // p=250 in
  ).toDF("iid", "s", "e")

  test("bucketized range join equals the naive cross-join filter") {
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", w)
        .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = points.crossJoin(intervals)
        .filter(col("p") >= col("s") && col("p") < col("e"))
        .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"bucketWidth=$w")
      assert(naive.nonEmpty)
    }
  }

  test("each matching (point, interval) pair appears exactly once") {
    val rows = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 7L)
      .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.size === rows.toSet.size)
  }

  test("colliding column names fail fast") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumnRenamed("p", "s"),
        intervals, "s", "s", "e", 7L)
    }
    assert(e.getMessage.contains("collide"))
  }
  test("interval-overlap join equals the naive cross-join filter, pairs exactly once") {
    val l = Seq((1L, 0L, 10L), (2L, 5L, 25L), (3L, 30L, 31L), (4L, 40L, 40L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 8L, 12L), (20L, 24L, 40L), (30L, 0L, 100L))
      .toDF("rid", "rs", "re")
    for (w <- Seq(1L, 7L, 16L, 1000L)) {
      val rows = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      // s1<e2 ∧ s2<e1 alone would count the empty [40,40) as
      // overlapping — true ∩≠∅ semantics excludes empty intervals
      val naive = l.crossJoin(r)
        .filter(col("ls") < col("le") && col("rs") < col("re") &&
          col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(rows.toSet === naive, s"bucketWidth=$w")
      assert(rows.size === rows.toSet.size, s"duplicate pairs at bucketWidth=$w")
      assert(naive.nonEmpty)
    }
  }

  test("interval-overlap extra equi keys restrict pairs inside the join") {
    val l = Seq((1L, 7L, 0L, 10L), (2L, 8L, 0L, 10L)).toDF("lid", "lk", "ls", "le")
    val r = Seq((10L, 7L, 5L, 15L), (20L, 8L, 5L, 15L)).toDF("rid", "rk", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 4L,
        extraKeys = Seq(("lk", "rk")))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }

  test("randomized property: both joins equal the naive filter on 20 seeded instances") {
    val rnd = new scala.util.Random(1234L)
    for (trial <- 0 until 20) {
      val nP = 1 + rnd.nextInt(40)
      val nI = 1 + rnd.nextInt(25)
      val pts = (0 until nP).map(i => (i.toLong, rnd.nextInt(400).toLong)).toDF("pid", "p")
      val ivs = (0 until nI).map { i =>
        val a = rnd.nextInt(400).toLong
        // mix of forward, empty, and inverted intervals
        val b = a + rnd.nextInt(90) - 15
        (i.toLong, a, b.toLong)
      }.toDF("iid", "s", "e")
      val w = 1L + rnd.nextInt(120)

      val gotPoint = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val naivePoint = pts.crossJoin(ivs)
        .filter(col("p") >= col("s") && col("p") < col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotPoint.toSet === naivePoint, s"point trial=$trial w=$w")
      assert(gotPoint.size === gotPoint.toSet.size, s"point dup trial=$trial w=$w")

      val l = ivs.select(col("iid").as("lid"), col("s").as("ls"), col("e").as("le"))
      val r2 = pts.select(col("pid").as("rid"), col("p").as("rs"),
        (col("p") + 1 + (col("pid") % 30)).as("re"))
      val gotOv = RangeJoin.intervalOverlap(l, r2, "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val naiveOv = l.crossJoin(r2)
        .filter(col("ls") < col("le") && col("rs") < col("re") &&
          col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotOv.toSet === naiveOv, s"overlap trial=$trial w=$w")
      assert(gotOv.size === gotOv.toSet.size, s"overlap dup trial=$trial w=$w")
    }
  }

}
