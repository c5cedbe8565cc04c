package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types._

/** JDBC load stage (reference load/execute.py:25-97; SURVEY.md §2.1
  * S7/S8). No live Postgres exists in this environment (SURVEY.md
  * §7.4 risk 6), so the DDL generation and mode selection are pure
  * and unit-tested; the write itself is a thin passthrough to Spark's
  * JDBC writer, where each executor opens its own connection and
  * writes its partitions in parallel.
  */
object JdbcSink {

  /** Spark → Postgres type mapping for the DDL the reference creates
    * out-of-band before the JDBC write (load/execute.py:37-57). */
  def pgType(dt: DataType): String = dt match {
    case IntegerType              => "INTEGER"
    case LongType                 => "BIGINT"
    case DoubleType               => "DOUBLE PRECISION"
    case FloatType                => "REAL"
    case BooleanType              => "BOOLEAN"
    case TimestampType            => "TIMESTAMP"
    case DateType                 => "DATE"
    case ArrayType(StringType, _) => "TEXT[]"
    case _: DecimalType           => "NUMERIC"
    case _                        => "TEXT"
  }

  /** `CREATE TABLE IF NOT EXISTS` mirroring the reference's
    * psycopg2 DDL, so a JDBC overwrite inherits correct types + PK. */
  def createTableDdl(table: String, schema: StructType,
      primaryKey: Option[String] = None): String = {
    val cols = schema.fields.map { f =>
      val pk = if (primaryKey.contains(f.name)) " PRIMARY KEY" else ""
      s"${f.name} ${pgType(f.dataType)}$pk"
    }
    s"CREATE TABLE IF NOT EXISTS $table (${cols.mkString(", ")})"
  }

  /** Reference mode rule (load/execute.py:74-97): master tables are
    * appended, everything else overwritten. */
  def modeFor(tableOrPath: String): SaveMode =
    if (tableOrPath.contains("master")) SaveMode.Append else SaveMode.Overwrite

  def connectionProps(user: String, password: String): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", "org.postgresql.Driver")
    p
  }

  /** Executor-parallel JDBC write; `numPartitions` caps concurrent
    * connections against the database at cluster scale. */
  def write(df: DataFrame, url: String, table: String, props: Properties,
      mode: SaveMode, numPartitions: Option[Int] = None): Unit = {
    val capped = numPartitions.map(df.coalesce).getOrElse(df)
    capped.write.mode(mode).jdbc(url, table, props)
  }

  /** Driver-side DDL execution (boundary: driver → DB, no Spark). */
  def ensureTable(url: String, props: Properties, ddl: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try conn.createStatement().execute(ddl)
    finally conn.close()
  }
}
