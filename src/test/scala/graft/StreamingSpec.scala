package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** The file streaming source requires a directory: stage the single
    * events.parquet into a temp dir (simulating a landing zone). */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming hourly agg matches the batch aggregation") {
    val stream = EventsStream.readEvents(spark, streamDir)
    assert(stream.isStreaming)
    val q = EventsStream.runToMemory(
      EventsStream.hourlyAgg(stream), "hourly_stream", outputMode = "append")
    try {
      val streamed = spark.table("hourly_stream")
        .select("hour", "event_type", "n_events", "sum_value")
      val batch = Tables.events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      // watermark: the final (latest) windows may not be emitted in
      // append mode; every emitted row must match batch exactly.
      val joined = streamed.alias("s").join(batch.alias("b"),
        Seq("hour", "event_type"), "left")
      val mismatched = joined.filter(
        col("s.n_events") =!= col("b.n_events") ||
          col("s.sum_value") =!= col("b.sum_value")).count()
      assert(mismatched === 0L)
      assert(streamed.count() > 0L)
    } finally q.stop()
  }

  test("session windows produce bounded per-user sessions") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.userSessions(stream), "sessions_stream", outputMode = "append")
    try {
      val sessions = spark.table("sessions_stream")
      assert(sessions.count() > 0L)
      assert(sessions.filter(col("session_end") < col("session_start")).count() === 0L)
      assert(sessions.filter(col("n_events") <= 0).count() === 0L)
    } finally q.stop()
  }
}
