package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{LoadPipeline, MoviePipeline}
import graft.ml.Vectorize

class LoadAndFormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val stagesDir: String = {
    val tmp = Files.createTempDirectory("graft-load")
    val raw = MoviePipeline.readCsv(spark, MovieFixture.write(tmp))
    val result = MoviePipeline.run(spark, raw,
      vectorizeCfg = Vectorize.Config(minDF = 2.0, minDocFreq = 2))
    val out = tmp.resolve("stages").toString
    MoviePipeline.save(result, out)
    out
  }

  test("load pipeline issues DDL before writes with reference mode rules") {
    val ddls = Seq.newBuilder[String]
    val writes = Seq.newBuilder[(String, SaveMode, Long)]
    val results = LoadPipeline.run(spark, stagesDir)(
      ddl => ddls += ddl,
      (df: DataFrame, table: String, mode: SaveMode) =>
        writes += ((table, mode, df.count())))
    assert(results.forall(_.error.isEmpty))
    val d = ddls.result()
    assert(d.exists(_.startsWith("CREATE TABLE IF NOT EXISTS movie_metadata (id INTEGER PRIMARY KEY")))
    assert(d.exists(_.startsWith("CREATE TABLE IF NOT EXISTS master_table (id INTEGER PRIMARY KEY")))
    val w = writes.result().map { case (t, m, n) => t -> ((m, n)) }.toMap
    assert(w("movie_metadata")._1 === SaveMode.Overwrite)
    assert(w("master_table")._1 === SaveMode.Append)
    assert(w("movie_metadata")._2 === MovieFixture.expectedAfterFeaturize)
  }

  test("a failing table is isolated; the rest of the load continues") {
    val loaded = Seq.newBuilder[String]
    val tables = LoadPipeline.TableLoad("nope/missing", "broken", None) +:
      LoadPipeline.defaultTables
    val results = LoadPipeline.run(spark, stagesDir, tables)(
      _ => (), (_, table, _) => loaded += table)
    assert(results.head.table === "broken" && results.head.error.isDefined)
    assert(loaded.result() === Seq("movie_metadata", "master_table"))
  }

  test("json and orc sinks round-trip the documents table") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = Files.createTempDirectory("graft-fmt").toString
    docs.write.mode(SaveMode.Overwrite).json(s"$tmp/json")
    docs.write.mode(SaveMode.Overwrite).orc(s"$tmp/orc")
    val fromJson = spark.read.json(s"$tmp/json")
    val fromOrc = spark.read.orc(s"$tmp/orc")
    assert(fromJson.count() === docs.count())
    assert(fromOrc.count() === docs.count())
    assert(fromOrc.schema === docs.schema)
    // json loses int-width fidelity by design; values must survive
    val origIds = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(fromJson.select("doc_id").collect().map(_.getLong(0)).sorted === origIds)
  }
}
