package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.10):
  * true incremental sessionization — the stateful twin of the batch
  * window form in [[graft.operators.EventOps]] `sessionize_30m`.
  *
  * Per user the state is just (last event time, open-session aggregate):
  * O(1) per key, keyed state store sharded by user across executors —
  * the scale axis is user count, like the reference's per-file loop
  * state (`main.py:133-158`) generalized to keyed exactly-once state
  * with checkpointing.
  *
  * Emits a session row whenever a 30-min gap closes it; used in tests
  * with AvailableNow over the events parquet (batch-checkable against
  * the window form for all CLOSED sessions).
  */
object StatefulSessionize {

  case class Ev(user_id: Long, tsMicros: Long)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, session_start: Long, session_end: Long, n_events: Int)

  val GapMicros: Long = 1800L * 1000000L

  /** Sessionize a (possibly streaming) Dataset of events. */
  def sessions(spark: SparkSession, events: Dataset[Ev]): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          val out = scala.collection.mutable.ListBuffer[Session]()
          var st = state.getOption.orNull
          // within a micro-batch, events for a key arrive unordered:
          // sort this batch; cross-batch order is the stream's contract
          evs.toSeq.sortBy(_.tsMicros).foreach { e =>
            st match {
              case null => st = SessionState(e.tsMicros, e.tsMicros, 1)
              case s if e.tsMicros - s.last > GapMicros =>
                out += Session(userId, s.start, s.last, s.n)
                st = SessionState(e.tsMicros, e.tsMicros, 1)
              case s => st = SessionState(s.start, e.tsMicros, s.n + 1)
            }
          }
          if (st != null) state.update(st)
          out.iterator
        })
  }

  /** Batch-driven run over the events table (AvailableNow semantics in
    * tests); open sessions remain in state and are NOT emitted. */
  def closedSessionsBatch(spark: SparkSession, sfDir: String): Dataset[Session] = {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[Ev]
    sessions(spark, evs)
  }
}
