package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.io.JdbcSink

/** L-stage of the reference pipeline (reference load/execute.py:74-130;
  * SURVEY.md §3.3): per staged table, ensure the DDL out-of-band, then
  * JDBC-write with the reference's mode rule. Failures are caught and
  * logged per table and the load continues (load/execute.py:96-97) —
  * one bad table must not abort the rest of the warehouse load.
  *
  * The physical write and DDL execution are injectable so the
  * orchestration (order, modes, error isolation) is testable without a
  * live database; production callers pass [[JdbcSink.write]] /
  * [[JdbcSink.ensureTable]]-backed functions.
  */
object LoadPipeline {

  final case class TableLoad(
      stagePath: String, table: String, primaryKey: Option[String])

  /** The reference's two warehouse tables. */
  val defaultTables: Seq[TableLoad] = Seq(
    TableLoad("stage1/movie_metadata", "movie_metadata", Some("id")),
    TableLoad("stage3/master_table", "master_table", Some("id")))

  final case class Result(table: String, mode: SaveMode, error: Option[String])

  def run(spark: SparkSession, stagesDir: String,
      tables: Seq[TableLoad] = defaultTables,
      typeFor: org.apache.spark.sql.types.DataType => String = JdbcSink.pgType,
      ifNotExists: Boolean = true)(
      ensureTable: String => Unit,
      write: (DataFrame, String, SaveMode) => Unit): Seq[Result] =
    tables.map { t =>
      val mode = JdbcSink.modeFor(t.stagePath)
      try {
        val df = spark.read.parquet(s"$stagesDir/${t.stagePath}")
        ensureTable(JdbcSink.createTableDdl(t.table, df.schema, t.primaryKey,
          typeFor, ifNotExists))
        write(df, t.table, mode)
        Result(t.table, mode, None)
      } catch {
        case e: Exception =>
          // per-table isolation: log and continue (reference parity)
          System.err.println(s"[load] ${t.table} failed: ${e.getMessage}")
          Result(t.table, mode, Some(e.getMessage))
      }
    }
}
