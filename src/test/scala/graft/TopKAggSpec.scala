package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TopKAgg

/** The bounded-heap per-group top-k aggregate must agree exactly with
  * the window-function spelling on any input, under any partitioning
  * (merge/serialize paths), with deterministic tie-breaks. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** window-function ground truth: rank by (ord desc, id asc) */
  private def windowTopK(df: DataFrame, k: Int): Set[(String, Int, Long, Double)] = {
    val w = Window.partitionBy("g").orderBy(col("o").desc, col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("rk"),
        r.getAs[Long]("id"), r.getAs[Double]("o"))).toSet
  }

  private def heapTopK(df: DataFrame, k: Int): Set[(String, Int, Long, Double)] =
    df.groupBy("g").agg(TopKAgg.topK(col("o"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rk"),
        col("e.id"), col("e.ord"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  private def fixture: DataFrame =
    (0 until 500).map { i =>
      (s"g${i % 7}", i.toLong, ((i * 131) % 97).toDouble / 10.0)
    }.toDF("g", "id", "o")

  test("heap top-k equals the window-function spelling") {
    val df = fixture
    assert(heapTopK(df, 5) === windowTopK(df, 5))
    assert(heapTopK(df, 1) === windowTopK(df, 1))
  }

  test("result is partitioning-independent (merge + serialize paths)") {
    val df = fixture
    val expected = heapTopK(df, 4)
    assert(heapTopK(df.repartition(17), 4) === expected)
    assert(heapTopK(df.repartition(1), 4) === expected)
    assert(heapTopK(df.repartition(64, col("id")), 4) === expected)
  }

  test("ties break on ascending id, k beyond group size returns the group") {
    val df = Seq(
      ("a", 10L, 1.0), ("a", 3L, 1.0), ("a", 7L, 1.0), ("a", 5L, 0.5),
      ("b", 1L, 2.0)).toDF("g", "id", "o")
    val got = heapTopK(df, 2)
    assert(got === Set(("a", 1, 3L, 1.0), ("a", 2, 7L, 1.0), ("b", 1, 1L, 2.0)))
    // k larger than every group: all rows come back, ranked
    assert(heapTopK(df, 10) === windowTopK(df, 10))
  }

  test("randomized equivalence: 15 instances of heap == window") {
    val rnd = new scala.util.Random(20260812L)
    for (inst <- 1 to 15) {
      val n = 20 + rnd.nextInt(300)
      val groups = 1 + rnd.nextInt(9)
      val k = 1 + rnd.nextInt(6)
      // coarse ord values force plenty of ties
      val rows = (0 until n).map { i =>
        (s"g${rnd.nextInt(groups)}", i.toLong, rnd.nextInt(7).toDouble) }
      val df = rows.toDF("g", "id", "o").repartition(1 + rnd.nextInt(8))
      assert(heapTopK(df, k) === windowTopK(df, k), s"instance $inst (k=$k, n=$n)")
    }
  }

  test("NaN ords rank greatest, exactly like the window ordering") {
    // NaN must neither poison the heap (a NaN that enters a non-full
    // heap must still be evictable) nor rank differently than Spark's
    // ORDER BY, where NaN is the greatest double
    val df = Seq(
      ("a", 1L, Double.NaN), ("a", 2L, 5.0), ("a", 3L, 7.0), ("a", 4L, 9.0))
      .toDF("g", "id", "o")
    // compare on (g, rk, id): NaN != NaN would fail a tuple compare
    // even when both sides emit the same rows
    def ids(s: Set[(String, Int, Long, Double)]) = s.map(t => (t._1, t._2, t._3))
    assert(ids(heapTopK(df, 2)) === ids(windowTopK(df, 2)))
    assert(ids(heapTopK(df, 2)) === Set(("a", 1, 1L), ("a", 2, 4L)),
      "NaN first (greatest), then the best real score")
  }

  test("null ords are skipped; largest=false ranks ascending") {
    val df = Seq(
      ("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, Some(1.0)),
      ("a", 4L, Some(2.0))).toDF("g", "id", "o")
    val asc = df.groupBy("g")
      .agg(TopKAgg.topK(col("o"), col("id"), 2, largest = false).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("e.id")).collect().map(_.getLong(0)).toSeq
    assert(asc === Seq(3L, 4L), "ascending keeps the 2 smallest, null skipped")
  }
}
