package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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

  /** BURST detection: hours where an event type's count exceeds
    * `factorPct`% of its own trailing mean — the volume-anomaly alarm
    * over an ingest stream (a crawler gone hot, a bot flood, a
    * telemetry regression). The baseline is the mean of the previous
    * `trailing` OBSERVED hours (a rows frame, not a range frame —
    * silent gap hours don't dilute the baseline, they simply aren't
    * observations), and the verdict is the integer cross-multiply
    * `n · w_n · 100 > factorPct · w_sum` — no division, so exact and
    * oracle-replayable. The first observed hour of a type has an
    * empty window (w_sum NULL) and can never flag — no baseline, no
    * verdict, identically in both engines' null semantics.
    *
    * Shape at scale: one (type, hour) aggregation with map-side
    * combine — the window then runs over HOURS, not events, so the
    * per-type sort is thousands of rows regardless of corpus size. */
  def burstHours(events: DataFrame, factorPct: Int = 200,
      trailing: Int = 24, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(factorPct >= 100 && trailing >= 1)
    val hourly = events
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("hour"))
      .rowsBetween(-trailing, -1)
    hourly
      .select(col(typeCol), col("hour"), col("n_events"),
        count(lit(1)).over(w).as("w_n"),
        sum(col("n_events")).over(w).as("w_sum"))
      .filter(col("n_events") * col("w_n") * 100 >
        lit(factorPct.toLong) * col("w_sum"))
  }

  /** INTER-EVENT GAP histogram: the distribution of per-user gaps
    * between consecutive events, bucketed by `floor(log2(gap_s))` —
    * the calibration read behind every sessionization timeout (the
    * histogram is bimodal: intra-session seconds on the left,
    * between-visit hours on the right; the valley is the timeout
    * [[sessionize]] should use). Same-second gaps land in bucket −1
    * (a timestamp→seconds floor can make any sub-second gap 0), the
    * log2 is the `length(bin(x)) − 1` bit trick — no floating point,
    * so the bucket edges are bit-identical in the oracle. Window
    * order is (ts, event_id): the id tiebreak makes lag
    * deterministic under same-timestamp bursts.
    *
    * Shape at scale: one user-keyed window sort (the sessionize
    * exchange), then a ~40-row aggregation — the histogram never
    * grows with the corpus. Returns
    * (gap_bucket, n_gaps, min_gap_s, max_gap_s). */
  def gapHistogram(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol))
      .withColumn("__gap",
        col(tsCol).cast(LongType) - lag(col(tsCol), 1).over(w).cast(LongType))
      .filter(col("__gap").isNotNull)
      .select(when(col("__gap") === 0, lit(-1L))
        .otherwise((length(bin(col("__gap"))) - 1).cast(LongType))
        .as("gap_bucket"), col("__gap"))
      .groupBy("gap_bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap_s"),
        max(col("__gap")).as("max_gap_s"))
  }

  /** Exponentially-DECAYED popularity: per event type, the recency-
    * weighted activity score `Σ n_h · 2^(depth − rank_h)` over its
    * `depth` most recent observed hours (rank 1 = newest, weight
    * 2^(depth−1); each hour back halves the weight) — the "trending
    * now" ranker that a hot-set cache or crawl scheduler reads,
    * where [[burstHours]] is the alarm. Weights are power-of-two
    * integers via `shiftleft`, so the score is an exact BIGINT the
    * oracle reproduces with `1::BIGINT << k` — no float decay
    * constant to drift on.
    *
    * Shape at scale: the hourly rollup collapses the event stream
    * with map-side combine; the window then ranks HOURS per type
    * (thousands of rows regardless of corpus size) and the final
    * aggregate is one row per type. Returns
    * (event_type, n_hours, latest_hour, decay_score). */
  def decayedPopularity(events: DataFrame, depth: Int = 16,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(depth >= 1 && depth <= 62)
    val hourly = events
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("__hour"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("__hour").desc)
    hourly
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= depth)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_hours"),
        max(col("__hour")).as("latest_hour"),
        sum(expr(s"__n * shiftleft(CAST(1 AS BIGINT), $depth - __r)"))
          .as("decay_score"))
  }
}
