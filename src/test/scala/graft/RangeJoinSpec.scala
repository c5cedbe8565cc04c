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
}
