package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via flatMapGroupsWithState — the
  * arbitrary-state path the built-in windowed aggregates can't express
  * (SURVEY.md §2b streaming row). State per key is O(1); keys partition
  * across executors, so state scales horizontally with the cluster.
  */
object StatefulOps {

  case class Ev(user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-user running (count, sum) emitted on every update — an
    * incrementally-maintained aggregate with explicit state. */
  def runningPerUser(events: Dataset[Ev]): Dataset[UserRunning] = {
    implicit val enc: org.apache.spark.sql.Encoder[UserRunning] =
      Encoders.product[UserRunning]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Ev], state: GroupState[UserRunning]) => {
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          batch.foreach { e => n += 1; s += e.value }
          val next = UserRunning(userId, n, s)
          state.update(next)
          Iterator.single(next)
        })
  }
}
