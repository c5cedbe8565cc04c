package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series resampling: align an event stream onto a fixed-period
  * grid per key, with gap rows at zero activity and forward-filled
  * carried values.
  *
  * Shape at scale: one aggregation shuffle (hourly rollup), a
  * broadcast of the (tiny) time bounds, a grid explode that is
  * map-only, and one window scan per key for the forward fill — the
  * same single-sort pattern as the as-of join.
  */
object TimeSeries {

  /** Batch sessionization: session boundaries where the gap to the
    * previous event exceeds `gapMinutes` (lag + running sum of
    * boundary flags — one window scan per key; the batch twin of
    * Structured Streaming's session_window). Emits per-session
    * (key, session_start, n_events, value_sum). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val flagged = events
      .withColumn("__new_session",
        when(lag(col(tsCol), 1).over(w).isNull ||
          col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long") >
            gapMinutes * 60L, lit(1L)).otherwise(lit(0L)))
      .withColumn("__session", sum(col("__new_session")).over(
        Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(keyCol), col("__session"))
      .agg(
        date_trunc("second", min(col(tsCol))).as("session_start"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast(DoubleType).as("value_sum"))
      .drop("__session")
  }

  /** Per-key hourly grid over the corpus time span:
    * (key, hour, n_events, last_value_sum) where `last_value_sum`
    * forward-fills the most recent active hour's value sum (null until
    * the key's first activity) — inactive hours report n_events = 0
    * plus the carried sum, which is the gap-fill contract. */
  def resampleHourly(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast(DoubleType).as("v"))
    val bounds = events.agg(
      date_trunc("hour", min(col(tsCol))).as("mn"),
      date_trunc("hour", max(col(tsCol))).as("mx"))
    val keys = events.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n_active"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("last_value_sum"))
  }
}
