package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Documents, Pipelines, QueryDef, Relational, Relational2, Relational3, Round4, Round8, Round10, Round11, Round12, Round13, Round14, Round14b, Round14c, Round15, Round16, Round17, Round18, Round19, Round20}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain batteries (each a
  * `Seq[QueryDef]` pairing the Spark DataFrame plan with its DuckDB
  * oracle SQL when the operator is ANSI-SQL-expressible).
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++
      Documents.defs ++ Pipelines.defs ++ Round4.defs ++ Round8.defs ++
      Round10.defs ++ Round11.defs ++ Round12.defs ++ Round13.defs ++
      Round14b.defs ++ Round14c.defs ++ Round15.defs ++ Round16.defs ++ Round17.defs ++
      Round18.defs ++ Round19.defs ++ Round20.defs ++ Round14.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's signature capability: TF-IDF + seeded LSH
    * document recommendation (SURVEY.md §3.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("q30_doc_recommend")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
