package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range join (point-in-interval): every point row joins
  * the interval rows whose [start, end) contains it.
  *
  * Spark has no range-join optimization — a naive
  * `p >= start AND p < end` join plans as BroadcastNestedLoopJoin (or
  * a cartesian), which is quadratic row traffic at scale. Here the
  * range predicate becomes an EQUI key: time is cut into fixed-width
  * buckets, each interval explodes into the buckets it covers, each
  * point lands in exactly one bucket, and the bucket equi-join (hash
  * shuffle, AQE-eligible) is followed by the exact range filter.
  *
  * A point matches an interval in exactly one bucket — its own — so
  * no post-join dedup is needed. Shuffle volume is |points| +
  * |intervals| × (interval width / bucketWidth + 1) narrow rows;
  * choose `bucketWidth` ≈ the typical interval width so intervals
  * cover ≤ 2 buckets. Degenerate very-long intervals fan out
  * proportionally — cap them upstream or route them through a
  * broadcast side-join.
  *
  * Precondition: the join domain is non-negative (epoch
  * seconds/days/ids) — `div` truncates toward zero, which only equals
  * floor-bucketing for non-negative values.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"point/interval column names collide: ${shared.mkString(", ")}")
    val p = points.withColumn("__rjb",
      expr(s"CAST($pointCol AS LONG) div $bucketWidth"))
    val i = intervals
      .filter(col(startCol) < col(endCol)) // empty intervals match nothing
      .withColumn("__rjb", explode(sequence(
        expr(s"CAST($startCol AS LONG) div $bucketWidth"),
        expr(s"(CAST($endCol AS LONG) - 1) div $bucketWidth"))))
    p.join(i, Seq("__rjb"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__rjb")
  }

  /** Interval-overlap join: pairs where [s1, e1) ∩ [s2, e2) ≠ ∅
    * (i.e. s1 < e2 AND s2 < e1), as a bucket equi-join.
    *
    * Both sides explode into covered buckets. A pair can now collide
    * in MANY buckets, but its overlap region begins at max(s1, s2) —
    * so keeping only the collision in the bucket containing that point
    * emits each pair exactly once WITHOUT a distinct shuffle (the
    * usual dedup pass other bucketized overlap joins pay). */
  /** `extraKeys` (leftCol, rightCol) pairs join INSIDE the bucket
    * equi-join — e.g. a user/customer key — so co-keyed blocking
    * happens in the exchange, not as a post-join filter over
    * every-pair-per-bucket. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketWidth: Long,
      extraKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left/right column names collide: ${shared.mkString(", ")}")
    def banded(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s) < col(e))
      .withColumn("__rjb", explode(sequence(
        expr(s"CAST($s AS LONG) div $bucketWidth"),
        expr(s"(CAST($e AS LONG) - 1) div $bucketWidth"))))
    val l = banded(left, leftStart, leftEnd).alias("l")
    val r = banded(right, rightStart, rightEnd).alias("r")
    val cond = extraKeys.foldLeft(col("l.__rjb") === col("r.__rjb")) {
      case (c, (lk, rk)) => c && col(s"l.$lk") === col(s"r.$rk")
    }
    l.join(r, cond)
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .filter(col("l.__rjb") ===
        expr(s"CAST(greatest($leftStart, $rightStart) AS LONG) div $bucketWidth"))
      .drop("__rjb")
  }
}
