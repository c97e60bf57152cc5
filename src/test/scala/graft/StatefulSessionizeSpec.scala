package graft

import graft.streaming.StatefulSessionize
import org.apache.spark.sql.functions._

class StatefulSessionizeSpec extends SparkSpec {

  test("flatMapGroupsWithState sessions == batch window sessionization (closed sessions)") {
    import spark.implicits._
    val stateful = StatefulSessionize.closedSessionsBatch(spark, sf)
      .collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events.toLong)).toSet
    val windowed = graft.operators.EventOps.queries("sessionize_30m")(spark, sf)
      .select($"user_id", unix_micros($"session_start"), unix_micros($"session_end"), $"n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the stateful form withholds each user's LAST (still-open) session;
    // everything it does emit must match the window form exactly
    val windowedSet = windowed.toSet
    assert(stateful.nonEmpty)
    assert(stateful.subsetOf(windowedSet))
    // and it must emit exactly all-but-one session per user
    val perUserStateful = stateful.groupBy(_._1).view.mapValues(_.size).toMap
    val perUserWindowed = windowed.groupBy(_._1).view.mapValues(_.size).toMap
    perUserWindowed.foreach { case (u, n) =>
      assert(perUserStateful.getOrElse(u, 0) == n - 1)
    }
  }
}
