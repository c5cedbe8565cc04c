package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.JdbcSink

class JdbcSinkSpec extends AnyFunSuite {

  test("DDL mirrors the reference's movie_metadata table") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("title", StringType),
      StructField("poster_path", StringType),
      StructField("release_year", IntegerType)))
    val ddl = JdbcSink.createTableDdl("movie_metadata", schema, Some("id"))
    assert(ddl === "CREATE TABLE IF NOT EXISTS movie_metadata " +
      "(id INTEGER PRIMARY KEY, title TEXT, poster_path TEXT, release_year INTEGER)")
  }

  test("DDL maps bigint, double, arrays and timestamps") {
    val schema = StructType(Seq(
      StructField("revenue", LongType),
      StructField("score", DoubleType),
      StructField("genres_list", ArrayType(StringType)),
      StructField("ts", TimestampType)))
    val ddl = JdbcSink.createTableDdl("t", schema, None)
    assert(ddl.contains("revenue BIGINT"))
    assert(ddl.contains("score DOUBLE PRECISION"))
    assert(ddl.contains("genres_list TEXT[]"))
    assert(ddl.contains("ts TIMESTAMP"))
  }

  test("mode rule: master appends, others overwrite") {
    assert(JdbcSink.modeFor("stage3/master_table") === SaveMode.Append)
    assert(JdbcSink.modeFor("stage1/movie_metadata") === SaveMode.Overwrite)
  }

  test("connection props carry the postgres driver") {
    val p = JdbcSink.connectionProps("u", "pw")
    assert(p.getProperty("driver") === "org.postgresql.Driver")
  }
}
