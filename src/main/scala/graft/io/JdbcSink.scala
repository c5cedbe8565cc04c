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

  /** Spark → Derby type mapping (the live round-trip test target:
    * Derby ships on Spark's own classpath, so S7/S8 are verifiable
    * end-to-end without a Postgres). Derby has no TEXT or arrays;
    * strings become bounded VARCHARs. */
  def derbyType(dt: DataType): String = dt match {
    case IntegerType    => "INTEGER"
    case LongType       => "BIGINT"
    case DoubleType     => "DOUBLE"
    case FloatType      => "REAL"
    case BooleanType    => "BOOLEAN"
    case TimestampType  => "TIMESTAMP"
    case DateType       => "DATE"
    case _: DecimalType => "DECIMAL(31,6)"
    case _              => "VARCHAR(4000)"
  }

  /** `CREATE TABLE` mirroring the reference's psycopg2 DDL, so a JDBC
    * overwrite inherits correct types + PK. `typeFor` selects the
    * target dialect (default Postgres); `ifNotExists` is off for
    * engines without the clause (Derby) — pair with [[ensureTable]],
    * which treats already-exists as success. */
  def createTableDdl(table: String, schema: StructType,
      primaryKey: Option[String] = None,
      typeFor: DataType => String = pgType,
      ifNotExists: Boolean = true): String = {
    val cols = schema.fields.map { f =>
      val pk = if (primaryKey.contains(f.name)) " PRIMARY KEY" else ""
      s"${f.name} ${typeFor(f.dataType)}$pk"
    }
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine$table (${cols.mkString(", ")})"
  }

  /** Reference mode rule (load/execute.py:74-97): master tables are
    * appended, everything else overwritten. */
  def modeFor(tableOrPath: String): SaveMode =
    if (tableOrPath.contains("master")) SaveMode.Append else SaveMode.Overwrite

  def connectionProps(user: String, password: String,
      driver: String = "org.postgresql.Driver"): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", driver)
    p
  }

  /** Executor-parallel JDBC write; `numPartitions` caps concurrent
    * connections against the database at cluster scale. */
  def write(df: DataFrame, url: String, table: String, props: Properties,
      mode: SaveMode, numPartitions: Option[Int] = None): Unit = {
    val capped = numPartitions.map(df.coalesce).getOrElse(df)
    capped.write.mode(mode).jdbc(url, table, props)
  }

  /** Driver-side DDL execution (boundary: driver → DB, no Spark).
    * "Table already exists" counts as success, giving IF NOT EXISTS
    * semantics on engines without the clause (Derby SQLState X0Y32). */
  def ensureTable(url: String, props: Properties, ddl: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try conn.createStatement().execute(ddl)
    catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
    } finally conn.close()
  }
}
