package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.LoadPipeline
import graft.io.JdbcSink

/** LIVE JDBC round-trip for the load stage (reference
  * load/execute.py:25-97) against embedded Derby, which ships on
  * Spark's own classpath — no external database needed. Exercises the
  * real boundary end-to-end: driver-side DDL with a primary key,
  * executor JDBC writes in both reference modes (overwrite for staged
  * tables, append for master), per-table error continuation, and a
  * read-back comparison. */
class DerbyRoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private lazy val props = {
    // keep derby.log out of the repo root
    System.setProperty("derby.stream.error.file",
      java.nio.file.Files.createTempFile("derby", ".log").toString)
    val p = JdbcSink.connectionProps("", "", "org.apache.derby.jdbc.EmbeddedDriver")
    // Overwrite must TRUNCATE, not drop+recreate: the reference creates
    // the table out-of-band with the PK, and a drop would discard it
    p.setProperty("truncate", "true")
    p
  }

  private def stageFixtures(tmp: String, masterBatch: Seq[(Long, Double)]): Unit = {
    Seq((1L, "alpha", 1999), (2L, "beta", 2001))
      .toDF("id", "title", "release_year")
      .write.mode("overwrite").parquet(s"$tmp/stage1/movie_metadata")
    masterBatch.toDF("id", "score")
      .write.mode("overwrite").parquet(s"$tmp/stage3/master_table")
  }

  private def runLoad(stagesDir: String,
      tables: Seq[LoadPipeline.TableLoad]): Seq[LoadPipeline.Result] =
    LoadPipeline.run(spark, stagesDir, tables,
      typeFor = JdbcSink.derbyType, ifNotExists = false)(
      ddl => JdbcSink.ensureTable(url, props, ddl),
      (df: DataFrame, table: String, mode: SaveMode) =>
        JdbcSink.write(df, url, table, props, mode))

  test("streaming ingest appends micro-batches into live Derby, restart-safe") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("graft-sjdbc")
    val in = work.resolve("in"); val ckpt = work.resolve("ckpt")
    java.nio.file.Files.createDirectories(in)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    JdbcSink.ensureTable(url, props, JdbcSink.createTableDdl(
      "stream_events", schema, primaryKey = Some("event_id"),
      typeFor = JdbcSink.derbyType, ifNotExists = false))

    def runOnce(): Unit = {
      val q = graft.streaming.EventsStream.streamToJdbc(
        spark.readStream.schema(schema).parquet(s"$in/*"),
        url, "stream_events", props, ckpt.toString, numPartitions = Some(2))
      q.awaitTermination()
    }
    (0L until 100L).map(i => (i, i * 0.5)).toDF("event_id", "value")
      .write.mode("overwrite").parquet(s"$in/b1")
    runOnce()
    assert(spark.read.jdbc(url, "stream_events", props).count() === 100L)
    // restart with one NEW file: checkpoint must skip the committed
    // batch (no PK violation from a re-append) and add only new rows
    (100L until 150L).map(i => (i, i * 0.5)).toDF("event_id", "value")
      .write.mode("overwrite").parquet(s"$in/b2")
    runOnce()
    val after = spark.read.jdbc(url, "stream_events", props)
    assert(after.count() === 150L)
    assert(after.select(sum(col("event_id"))).collect().head.getLong(0)
      === (0L until 150L).sum)
  }

  test("DDL-first load round-trips through live Derby with reference modes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_load").toString
    stageFixtures(tmp, Seq((1L, 0.5), (2L, 0.7)))
    val tables = LoadPipeline.defaultTables :+
      LoadPipeline.TableLoad("stage9/missing", "missing_table", None)

    val r1 = runLoad(tmp, tables)
    // per-table error continuation: the bad table reports, others load
    assert(r1.count(_.error.isEmpty) === 2)
    assert(r1.find(_.table == "missing_table").get.error.isDefined)
    assert(r1.find(_.table == "movie_metadata").get.mode === SaveMode.Overwrite)
    assert(r1.find(_.table == "master_table").get.mode === SaveMode.Append)

    // second batch (fresh master ids, as a daily load would have):
    // overwrite table stays at 2 rows, append table accumulates to 4
    stageFixtures(tmp, Seq((3L, 0.9), (4L, 0.1)))
    val r2 = runLoad(tmp, tables)
    assert(r2.count(_.error.isEmpty) === 2)
    val meta = spark.read.jdbc(url, "movie_metadata", props)
    val master = spark.read.jdbc(url, "master_table", props)
    assert(meta.count() === 2L)
    assert(master.count() === 4L)

    // values survive the round-trip
    val got = meta.collect().map(r =>
      (r.getAs[Long]("ID"), r.getAs[String]("TITLE"), r.getAs[Int]("RELEASE_YEAR")))
      .toSet
    assert(got === Set((1L, "alpha", 1999), (2L, "beta", 2001)))

    // the out-of-band DDL's primary key survived the overwrite
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getPrimaryKeys(null, null, "MOVIE_METADATA")
      assert(rs.next() && rs.getString("COLUMN_NAME") === "ID")
    } finally conn.close()
  }
}
