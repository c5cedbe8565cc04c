package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query plus (when SQL-expressible) its DuckDB oracle.
  *
  * Contract (see `graft.SparkEntry` / `graft.Verify`): the driver runs
  * `fn(spark, sfDir)`, dumps the result to parquet, runs `oracle` in
  * DuckDB over the same parquet tables, sorts columns by name and
  * hash-compares values. Hence every query here:
  *   - aliases every computed column identically in both dialects;
  *   - ends in a deterministic total ORDER BY (unique tie-break key);
  *   - performs float aggregation in exact DECIMAL, casting to double
  *     only at the end, so parallel summation order cannot change bits.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
