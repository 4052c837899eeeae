package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom stateful streaming operators via flatMapGroupsWithState — the
  * arbitrary-state path the built-in windowed aggregates can't express
  * (SURVEY.md §2b streaming row). State per key is O(1); keys partition
  * across executors, so state scales horizontally with the cluster.
  */
object StatefulOps {

  case class Ev(user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  case class ScoredCandidate(query_id: Long, neighbor_id: Long, score: Double)
  case class TopKSnapshot(query_id: Long, neighbor_ids: List[Long], scores: List[Double])

  /** Streaming top-k similarity (SURVEY.md §7): as scored candidates stream
    * in, keep the best k per query in state and emit the updated snapshot
    * each micro-batch. State is the bounded [[graft.functions.TopKAggregator.TopKBuf]]
    * — O(k) per query regardless of stream length. */
  def streamingTopK(candidates: Dataset[ScoredCandidate], k: Int): Dataset[TopKSnapshot] = {
    import graft.functions.TopKAggregator.{Scored, TopKBuf}
    implicit val bufEnc: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    implicit val outEnc: Encoder[TopKSnapshot] = Encoders.product[TopKSnapshot]
    val agg = new graft.functions.TopKAggregator.TopK(k)
    candidates.groupByKey(_.query_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (queryId: Long, batch: Iterator[ScoredCandidate], state: GroupState[TopKBuf]) => {
          var buf = state.getOption.getOrElse(agg.zero)
          batch.foreach(c => buf = agg.reduce(buf, Scored(c.neighbor_id, c.score)))
          state.update(buf)
          val items = agg.finish(buf)
          Iterator.single(TopKSnapshot(queryId, items.map(_.id), items.map(_.score)))
        })
  }

  /** [[runningPerUser]] re-expressed on Spark 4's `transformWithState` —
    * the successor arbitrary-state API: typed named state handles
    * (`ValueState`/`ListState`/`MapState`) with per-state TTL, timers, and
    * the RocksDB state store underneath (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider`; required by this operator).
    * Same semantics as the flatMapGroupsWithState form — the spec asserts
    * both produce identical running aggregates on the same batches. */
  class RunningPerUserProcessor extends StatefulProcessor[Long, Ev, UserRunning] {
    @transient private var state: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "running", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[UserRunning] = {
      val (n0, s0) = if (state.exists()) state.get() else (0L, 0.0)
      var n = n0; var s = s0
      rows.foreach { e => n += 1; s += e.value }
      state.update((n, s))
      Iterator.single(UserRunning(userId, n, s))
    }
  }

  def runningPerUserTws(events: Dataset[Ev]): Dataset[UserRunning] = {
    implicit val enc: Encoder[UserRunning] = Encoders.product[UserRunning]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RunningPerUserProcessor,
        TimeMode.None(), OutputMode.Update())
  }

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
