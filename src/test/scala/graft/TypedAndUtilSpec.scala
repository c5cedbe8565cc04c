package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Typed
import graft.io.Extract
import graft.util.Timing

class TypedAndUtilSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("typed Dataset agg matches the untyped DataFrame result") {
    import spark.implicits._
    val typedCounts = Typed.lineitem(spark, dir)
      .filter(_.l_quantity > 25.0)
      .groupByKey(_.l_returnflag)
      .count()
      .collect().toMap
    val untyped = graft.engine.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 25.0)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typedCounts === untyped)
  }

  test("typed document view filters with compile-time fields") {
    val n = Typed.documents(spark, dir).filter(_.n_chars > 200).count()
    assert(n > 0)
  }

  test("extract: download(file url) + unzip round-trips contents, deletes archive") {
    val work = Files.createTempDirectory("graft-extract")
    // build a zip with a nested entry
    val zipPath = work.resolve("src.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("data/movies.csv"))
    zos.write("id,title\n1,Test Movie\n".getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    val outDir = work.resolve("out")
    val files = Extract.downloadAndExtract(zipPath.toUri.toString, outDir)
    assert(files.length === 1)
    assert(new String(Files.readAllBytes(files.head), "UTF-8").contains("Test Movie"))
    assert(!Files.exists(outDir.resolve("downloaded.zip")), "archive must be deleted")
  }

  test("unzip rejects zip-slip entries") {
    val work = Files.createTempDirectory("graft-slip")
    val zipPath = work.resolve("evil.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("../escape.txt"))
    zos.write("x".getBytes); zos.closeEntry(); zos.close()
    intercept[IllegalArgumentException] {
      Extract.unzip(zipPath, work.resolve("out"))
    }
  }

  test("format_time parity shapes") {
    assert(Timing.formatTime(7384.0) === "2 hr 3 min 4 sec")
    assert(Timing.formatTime(190.0) === "3 min 10 sec")
    assert(Timing.formatTime(2.5) === "2.50 sec")
    val (v, secs) = Timing.timed { 21 * 2 }
    assert(v === 42 && secs >= 0.0)
  }
}
