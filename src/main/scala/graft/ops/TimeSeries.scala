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

  /** Ordered FUNNEL conversion: per user, greedy first-occurrence
    * chain matching over `stages` — a user reaches stage i+1 only
    * with an event of that type STRICTLY AFTER their stage-i match
    * time (the product-analytics funnel; an unordered "did all of
    * view∕click∕purchase" count silently overstates conversion).
    * Returns (stage, n_users), stages labeled `1_view`, `2_click`, …
    * so the output orders itself.
    *
    * Scale shape: one filtered min-aggregate per stage, each joined
    * forward on the user key — every shuffle is on the SAME key, so
    * consecutive stages are co-partitioned; no per-user event sort,
    * no corpus-sized window. Stage count is the (small) driver-side
    * fold bound. */
  def funnelCounts(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty)
    val reached = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, i)) =>
        val base = events.filter(col(typeCol) === stage)
        val gated = prev match {
          case None => base
          case Some(p) =>
            base.join(p.select(col(userCol), col("__t")
                .as("__tprev")), userCol)
              .filter(col(tsCol) > col("__tprev"))
        }
        Some(gated.groupBy(userCol).agg(min(col(tsCol)).as("__t")))
    }.flatten
    reached.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$name").as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** TOP event PATHS: the k most frequent 3-step event-type
    * sequences across users (consecutive by timestamp, ties broken by
    * `idCol` so the walk is total and replayable) — the path-analysis
    * table behind "what do users do right before purchasing?". Two
    * `lead`s over a per-user window (partitions bounded by per-user
    * activity, never table-sized), one map-side-combinable count,
    * top-k as orderBy().limit(k) bounded heaps with a full
    * deterministic tiebreak. */
  def topEventPaths(events: DataFrame, k: Int = 10,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(userCol), col(typeCol).as("e1"), col(tsCol), col(idCol))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** COHORT retention: users grouped by first-activity week (Monday-
    * truncated), distinct actives per (cohort_week, week_offset) —
    * the standard retention triangle. One min-aggregate for cohorts,
    * a distinct (user, week) projection, exact integer day arithmetic
    * for the offset. */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val cohorts = events.groupBy(userCol)
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    active.join(cohorts, userCol)
      .withColumn("week_offset", expr("datediff(week, cohort_week) div 7"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** FIRST/LAST-touch attribution: for every conversion event, the
    * earliest and latest `touchType` event by the same user in the
    * `[conv.ts − windowMinutes, conv.ts]` window — "which click gets
    * credit for this purchase", the two canonical single-touch
    * attribution models, emitted side by side so their disagreement
    * rate (a multi-touch journey) is one filter away. Conversions
    * with no touch in window are kept with `n_touches = 0` and null
    * touch ids (the un-attributable share is itself the metric that
    * decides whether a lookback window is too short).
    *
    * Determinism: first∕last are `min∕max(struct(ts, id))` — the
    * struct order makes same-timestamp touches break on event id, so
    * the result is partitioning-independent without assuming unique
    * timestamps. A touch at exactly `conv.ts` counts (the window is
    * closed on both ends).
    *
    * Shape at scale: a self-join equi-keyed on the user with the time
    * window as a post-join range predicate — both sides hash-exchange
    * on `userCol` once (co-partitioned, never a cross product), and
    * the per-conversion rollup reuses that same partitioning, so the
    * whole op is one user-keyed exchange end to end. Per-user row
    * traffic is conversions × in-window touches — bounded by the
    * window, not by history length.
    */
  def touchAttribution(events: DataFrame, convType: String = "purchase",
      touchType: String = "click", windowMinutes: Int = 30,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(windowMinutes > 0)
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("__cid"), col(tsCol).as("__cts"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("__tu"), col(idCol).as("__tid"), col(tsCol).as("__tts"))
    conv.join(touch,
        col("__u") === col("__tu") &&
          col("__tts") <= col("__cts") &&
          col("__tts") >= col("__cts") - expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .groupBy(col("__cid"), col("__u"), col("__cts"))
      .agg(
        count(col("__tid")).as("n_touches"),
        // the `when` wraps the unmatched left-join row in a true NULL
        // (a struct OF nulls would not be skipped by min/max)
        min(when(col("__tid").isNotNull, struct(col("__tts"), col("__tid"))))
          .getField("__tid").as("first_touch_id"),
        max(when(col("__tid").isNotNull, struct(col("__tts"), col("__tid"))))
          .getField("__tid").as("last_touch_id"))
      .select(col("__cid").as(idCol), col("__u").as(userCol),
        col("__cts").as(tsCol), col("n_touches"),
        col("first_touch_id"), col("last_touch_id"))
  }
}
