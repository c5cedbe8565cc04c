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

  test("flatMapGroupsWithState emits threshold alerts with running state") {
    import spark.implicits._
    import graft.streaming.Stateful
    val stream = EventsStream.readEvents(spark, streamDir)
      .select(col("user_id"), col("value")).as[Stateful.Event]
    val q = EventsStream.runToMemory(
      Stateful.thresholdAlerts(spark, stream, step = 500.0).toDF(),
      "alerts_stream", outputMode = "append")
    try {
      val alerts = spark.table("alerts_stream")
      assert(alerts.count() > 0, "users crossing 500-value multiples must alert")
      // alerts are per-user monotone in total_value and thresholds are multiples of step
      val bad = alerts.filter(col("threshold_crossed") % 500.0 =!= 0.0).count()
      assert(bad === 0L)
      // batch cross-check: a user's final total implies its alert count
      val finalTotals = graft.engine.Tables.events(spark, dir)
        .groupBy("user_id").sum("value")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val alertCounts = alerts.groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finalTotals.foreach { case (u, total) =>
        val expected = (total / 500.0).toLong
        assert(alertCounts.getOrElse(u, 0L) === expected,
          s"user $u total $total expected $expected alerts")
      }
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.signupToPurchase(stream), "s2p_stream", outputMode = "append")
    try {
      val streamed = spark.table("s2p_stream")
      val ev = graft.engine.Tables.events(spark, dir)
      val s = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"), col("value"))
      val batch = s.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("signup_ts") &&
          col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 1 HOUR"))
        .select("user_id", "signup_ts", "purchase_ts", "value")
      assert(streamed.count() > 0)
      // every emitted streaming row must exist in the batch result
      assert(streamed.exceptAll(batch).count() === 0L)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops duplicate event ids") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.dedupedEvents(stream), "dedup_stream", outputMode = "append")
    try {
      val deduped = spark.table("dedup_stream")
      val total = graft.engine.Tables.events(spark, dir).count()
      assert(deduped.count() === total, "source has unique ids: nothing should drop")
      assert(deduped.select("event_id").distinct().count() === total)
    } finally q.stop()
  }

  test("checkpointed file-sink query recovers state across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val work = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val in = work.resolve("in"); val out = work.resolve("out")
    val ckpt = work.resolve("ckpt")
    java.nio.file.Files.createDirectories(in)
    // stage 1: first half of events lands
    val all = graft.engine.Tables.events(spark, dir)
    val half1 = all.filter(col("event_id") < 500)
    val half2 = all.filter(col("event_id") >= 500)
    half1.write.mode("overwrite").parquet(s"$in/batch1")

    def schemaOf = org.apache.spark.sql.types.StructType(
      all.schema.fields.map(f => f.copy()))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schemaOf).parquet(s"$in/*")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      val q = stream.writeStream
        .format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = spark.read.parquet(out.toString).count()
    assert(n1 === 500L)
    // stage 2: more data arrives (including replayed duplicates of batch1)
    half2.union(half1.limit(50)).write.mode("overwrite").parquet(s"$in/batch2")
    runOnce()
    val res = spark.read.parquet(out.toString)
    assert(res.count() === 1000L, "restart must process only new rows, dedup replays")
    assert(res.select("event_id").distinct().count() === 1000L)
  }

  test("late events beyond the watermark are dropped from the windowed agg") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-late")
    val in = work.resolve("in"); val out = work.resolve("out")
    val ckpt = work.resolve("ckpt")
    java.nio.file.Files.createDirectories(in)
    val h0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(h0.getTime + min * 60000L)

    def runOnce(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType)))
      val q = EventsStream.hourlyAgg(
          spark.readStream.schema(schema).parquet(s"$in/*"))
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: three rows in window A [00:00, 01:00) plus one at 03:30
    // that drives the watermark to 02:30 — past window A's end
    Seq((ts(5), "click", 10.0), (ts(10), "click", 5.0), (ts(20), "click", 1.0),
      (ts(210), "view", 2.0))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$in/b1")
    runOnce()

    // batch 2: a LATE click at 00:40 — 110 minutes behind the
    // restored watermark — must be dropped, not re-open window A
    Seq((ts(40), "click", 99.0), (ts(330), "view", 3.0))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$in/b2")
    runOnce()

    val res = spark.read.parquet(out.toString)
      .filter(col("hour") === lit(h0) && col("event_type") === "click")
      .collect()
    assert(res.length === 1,
      s"window A must be emitted exactly once, got ${res.length} rows")
    assert(res.head.getAs[Long]("n_events") === 3L,
      "the late event must NOT be counted into the closed window")
    assert(res.head.getAs[Double]("sum_value") === 16.0,
      "the late event's value must not leak into the closed window")
  }

  test("TopKAgg works as a streaming windowed aggregate, equal to batch") {
    // the custom TypedImperativeAggregate must serialize its heap
    // through the streaming state store; every emitted window's top-3
    // must match the batch computation over the same data
    val stream = EventsStream.readEvents(spark, streamDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.ops.TopKAgg.topK(col("value"), col("event_id"), 3).as("tk"))
      .select(col("window.start").as("hour"), col("event_type"),
        expr("transform(tk, e -> e.id)").as("top_ids"))
    val q = EventsStream.runToMemory(stream, "topk_stream", outputMode = "append")
    try {
      val streamed = spark.table("topk_stream").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getSeq[Long](2)).toMap
      assert(streamed.nonEmpty)
      val batch = Tables.events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(graft.ops.TopKAgg.topK(col("value"), col("event_id"), 3).as("tk"))
        .select(col("hour"), col("event_type"),
          expr("transform(tk, e -> e.id)").as("top_ids"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getSeq[Long](2)).toMap
      streamed.foreach { case (key, ids) =>
        assert(batch(key) === ids, s"window $key: streamed $ids vs batch ${batch(key)}")
      }
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
  test("streaming session windows match batch sessionize on emitted sessions") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.userSessions(stream), "sessions_eq_stream", outputMode = "append")
    try {
      // session_window.start is the raw min ts; the batch twin truncates
      // to whole seconds (ns-safety), so align before joining
      val streamed = spark.table("sessions_eq_stream")
        .select(col("user_id"),
          date_trunc("second", col("session_start")).as("session_start"),
          col("n_events"), col("session_value"))
      val batch = graft.ops.TimeSeries.sessionize(Tables.events(spark, dir))
        .select(col("user_id"), col("session_start"),
          col("n_events").as("b_n_events"), col("value_sum").as("b_value_sum"))
      // watermark: append mode withholds the final open windows; every
      // emitted session must match its batch twin exactly
      val joined = streamed.join(batch, Seq("user_id", "session_start"), "left")
      val mismatched = joined.filter(
        col("b_n_events").isNull ||
          col("n_events") =!= col("b_n_events") ||
          col("session_value") =!= col("b_value_sum")).count()
      assert(mismatched === 0L)
      assert(streamed.count() > 0L)
    } finally q.stop()
  }

  test("streaming incremental dedup admits exactly what the batch funnel admits") {
    import graft.engine.Tables
    val docs = Tables.documents(spark, dir)
    val batchDocs = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    // landing zone: the increment arrives as a parquet drop
    val landing = java.nio.file.Files.createTempDirectory("graft-docs-landing")
    batchDocs.coalesce(1).write.mode("overwrite").parquet(s"$landing/inc1")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-docs-ckpt")
    val admitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // the batch-funnel expectation runs FIRST (its own transient index
    // and funnel caches are not the stream's), so the cache-hygiene
    // delta below measures only what the two streaming runs leave
    val batch = graft.ops.Dedup.incrementalDeduplicate(batchDocs, corpus,
        maxJaccardDist = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val stream = graft.streaming.DocsStream.readDocs(spark, landing.toString, docs)
    assert(stream.isStreaming)
    val q = graft.streaming.DocsStream.incrementalDedupStream(
      stream, corpus, ckpt.toString,
      sink = df => df.select("doc_id").collect().foreach(r => admitted.add(r.getLong(0))),
      maxJaccardDist = 0.4)
    try {
      q.awaitTermination(120000)
      val streamed = admitted.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      assert(streamed.length > 0 && streamed.sameElements(batch),
        s"stream admitted ${streamed.length} vs batch ${batch.length}")
      // exactly-once across restart: a second AvailableNow run over the
      // same checkpoint reprocesses nothing
      val q2 = graft.streaming.DocsStream.incrementalDedupStream(
        graft.streaming.DocsStream.readDocs(spark, landing.toString, docs),
        corpus, ckpt.toString,
        sink = df => df.select("doc_id").collect().foreach(r => admitted.add(r.getLong(0))),
        maxJaccardDist = 0.4)
      try q2.awaitTermination(120000) finally q2.stop()
      assert(admitted.size === streamed.length, "restart reprocessed already-seen files")
      // cache hygiene: each foreachBatch invocation sweeps the RDDs it
      // persisted, so only the two runs' corpus indexes (3 cached
      // frames each) may remain — the funnel's per-batch caches and CC
      // checkpoints must not survive the invocation
      val leftover = spark.sparkContext.getPersistentRDDs.size - rddsBefore
      assert(leftover <= 6,
        s"$leftover cached RDDs outlived the stream (expected <= 6 index frames)")
    } finally q.stop()
  }

  test("growing-index stream dedups later micro-batches against earlier admissions") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    // two files → two micro-batches (maxFilesPerTrigger = 1). File 2's
    // doc 20 is a near-dup of file 1's ADMITTED doc 10 — with a static
    // index it would be admitted twice; the grown index must reject it.
    val inc1 = Seq(
      (10L, "brand new content about distributed engines today"),
      (12L, "one two three four five six EIGHT"))          // near-dup of corpus 3
      .toDF("doc_id", "text")
    val inc2 = Seq(
      (20L, "brand new content about distributed engines TONIGHT"), // near-dup of admitted 10
      (22L, "and a completely fresh topic nobody wrote before"))
      .toDF("doc_id", "text")
    val landing = java.nio.file.Files.createTempDirectory("graft-grow-landing")
    inc1.coalesce(1).write.mode("overwrite").parquet(s"$landing/inc1")
    Thread.sleep(1100) // distinct modification times → deterministic batch order
    inc2.coalesce(1).write.mode("overwrite").parquet(s"$landing/inc2")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-grow-ckpt")
    val admitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val idx = graft.ops.Dedup.indexCorpus(corpus)
    val q = graft.streaming.DocsStream.incrementalDedupStream(
      graft.streaming.DocsStream.readDocs(spark, landing.toString, corpus,
        maxFilesPerTrigger = Some(1)),
      idx, ckpt.toString,
      sink = df => df.select("doc_id").collect().foreach(r => admitted.add(r.getLong(0))),
      shingleSize = 3, maxJaccardDist = 0.5, growIndex = true)
    try {
      q.awaitTermination(120000)
      val got = admitted.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      assert(got === Array(10L, 22L),
        s"expected 10 (batch 1) and 22 (batch 2; 12 near-dups corpus, 20 near-dups admitted 10), got ${got.mkString(",")}")
    } finally { q.stop(); idx.unpersistAll() }
  }
}
