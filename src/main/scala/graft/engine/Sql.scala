package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-SQL surface: register every harness table as a temp view so
  * arbitrary `spark.sql` text runs against the same data the
  * DataFrame batteries use (the reference exercised the SQL parser
  * only through string predicates — SURVEY.md §2.2 P11; this exposes
  * the complete parser path).
  */
object Sql {

  // One registration per (session, sfDir): view setup re-reads every
  // table's parquet footer (and rebuilds the events nanos view), so
  // repeated query() calls should not pay it again. Weak keys on the
  // session so a stopped SparkSession doesn't pin its entry.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    if (registered.get(spark) != sfDir) {
      Tables.names.foreach { name =>
        val df =
          if (name == "events") Tables.events(spark, sfDir)
          else Tables(spark, sfDir, name)
        df.createOrReplaceTempView(name)
      }
      registered.put(spark, sfDir)
    }

  def query(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(sql)
  }
}
