package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-SQL surface: register every harness table as a temp view so
  * arbitrary `spark.sql` text runs against the same data the
  * DataFrame batteries use (the reference exercised the SQL parser
  * only through string predicates — SURVEY.md §2.2 P11; this exposes
  * the complete parser path).
  */
object Sql {

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, sfDir)
        else Tables(spark, sfDir, name)
      df.createOrReplaceTempView(name)
    }

  def query(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(sql)
  }
}
