package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Chunking, TimeSeries}

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hourly resample fills gaps and forward-carries the last active sum") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:15:00"), 10.0),
      (1L, Timestamp.valueOf("2024-01-01 10:45:00"), 5.0),
      // gap at 11:00 and 12:00 for user 1
      (1L, Timestamp.valueOf("2024-01-01 13:05:00"), 2.0),
      (2L, Timestamp.valueOf("2024-01-01 12:30:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val grid = TimeSeries.resampleHourly(ev).orderBy("user_id", "hour").collect()
    // span 10:00..13:00 → 4 hours × 2 users
    assert(grid.length === 8)
    val u1 = grid.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(2)).toSeq === Seq(2L, 0L, 0L, 1L), "activity counts")
    assert(u1.map(_.getDouble(3)).toSeq === Seq(15.0, 15.0, 15.0, 2.0), "forward fill")
    val u2 = grid.filter(_.getLong(0) == 2L)
    // user 2 inactive before 12:00 → null fills
    assert(u2.take(2).forall(_.isNullAt(3)))
    assert(u2(2).getDouble(3) === 7.0 && u2(3).getDouble(3) === 7.0)
  }

  test("chunking carries metadata columns through the generator") {
    val docs = Seq((1L, "a b c d e f", "en", 0.9))
      .toDF("doc_id", "text", "lang", "quality")
    val chunks = Chunking.chunkByTokens(docs, chunkSize = 4, overlap = 1,
      carryCols = Seq("lang", "quality")).collect()
    assert(chunks.length === 2)
    chunks.foreach { r =>
      assert(r.getAs[String]("lang") === "en")
      assert(r.getAs[Double]("quality") === 0.9)
    }
    assert(chunks.map(_.getAs[String]("chunk_text")).toSeq ===
      Seq("a b c d", "d e f"))
  }
}
