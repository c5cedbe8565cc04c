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
  *
  * SEMI-oracles: a recall/seed-dependent query (LSH ANN) has no SQL
  * ground truth for WHICH rows it emits, but its metric columns are
  * exact. Such oracles may contain the literal `__GRAFT_OUT__`, which
  * `graft.Verify` rewrites to the absolute dump directory when writing
  * oracle_sql.json — the SQL then re-reads the emitted ids and
  * recomputes the metric from the source tables with the identical
  * IEEE operation sequence, so the driver's hash still covers every
  * number.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
