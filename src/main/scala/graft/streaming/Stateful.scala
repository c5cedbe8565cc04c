package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user running totals with threshold
  * alerts via `flatMapGroupsWithState` — the arbitrary-state shape
  * (fraud counters, quota tracking, sessionization beyond
  * session_window) that windowed aggregation can't express.
  *
  * State is one small case class per key, partitioned by user across
  * the cluster and checkpointed by the state store; memory is bounded
  * by (active keys × state size), independent of stream length.
  */
object Stateful {

  final case class Event(user_id: Long, value: Double)
  final case class UserTotals(n_events: Long, total_value: Double)
  final case class Alert(user_id: Long, n_events: Long,
      total_value: Double, threshold_crossed: Double)

  /** Emit an alert each time a user's cumulative value crosses another
    * multiple of `step`. */
  def thresholdAlerts(spark: SparkSession, events: Dataset[Event],
      step: Double = 1000.0): Dataset[Alert] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserTotals]) =>
          val prior = state.getOption.getOrElse(UserTotals(0L, 0.0))
          var n = prior.n_events
          var total = prior.total_value
          val alerts = Seq.newBuilder[Alert]
          batch.foreach { e =>
            val before = (total / step).toLong
            n += 1
            total += e.value
            val after = (total / step).toLong
            if (after > before)
              alerts += Alert(userId, n, total, after * step)
          }
          state.update(UserTotals(n, total))
          alerts.result().iterator
      }
  }
}
