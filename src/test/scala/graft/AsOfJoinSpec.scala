package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 110.0),
    (1L, ts("2024-01-01 12:00:00"), 120.0),
    (2L, ts("2024-01-01 10:30:00"), 200.0)
  ).toDF("q_key", "q_ts", "price")

  private lazy val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:59:59")), // before 11:00 quote → 100
    (11L, 1L, ts("2024-01-01 11:00:00")), // exactly at quote ts → 110 (>= semantics)
    (12L, 1L, ts("2024-01-01 23:00:00")), // after everything → 120
    (13L, 2L, ts("2024-01-01 10:00:00")), // before any key-2 quote → null
    (14L, 3L, ts("2024-01-01 10:00:00"))  // key with no quotes at all → null
  ).toDF("trade_id", "t_key", "t_ts")

  private lazy val joined = AsOfJoin.backward(trades, quotes,
      leftKey = "t_key", rightKey = "q_key",
      leftTs = "t_ts", rightTs = "q_ts",
      valueCols = Seq("price"))
    .collect().map(r => r.getAs[Long]("trade_id") ->
      Option(r.getAs[Any]("price")).map(_.asInstanceOf[Double])).toMap

  test("picks the latest right row at or before the left timestamp") {
    assert(joined(10L) === Some(100.0))
    assert(joined(12L) === Some(120.0))
  }

  test("a right row stamped exactly at the left ts is visible (>= semantics)") {
    assert(joined(11L) === Some(110.0))
  }

  test("left rows before any right row, or with unmatched keys, get null") {
    assert(joined(13L) === None)
    assert(joined(14L) === None)
  }

  test("all left rows survive (left-join semantics)") {
    assert(joined.size === 5)
  }
  test("value column colliding with a left column fails fast") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "px")
    val r = Seq((1L, 5L, "y")).toDF("k", "ts", "px")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "k", "k", "ts", "ts", Seq("px"))
    }
    assert(e.getMessage.contains("px"))
  }
}
