package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {

  test("tumbling windows partition all events exactly once") {
    val windows = EventOps.queries("t1_tumbling_window")(spark, sf)
    val total = windows.agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("sessionization: session count per user <= event count; gaps split sessions") {
    import spark.implicits._
    val sessions = EventOps.queries("sessionize_30m")(spark, sf)
    val perUser = sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    assert(perUser.filter($"n_sessions" > $"n_events").count() == 0)
    // every session respects the gap: start-to-end duration sanity
    val bad = sessions.filter(unix_micros($"session_end") < unix_micros($"session_start"))
    assert(bad.count() == 0)
  }

  test("t2 keyed dedup keeps exactly one row per user") {
    val d = EventOps.queries("t2_dedup_first")(spark, sf)
    assert(d.count() == d.select("user_id").distinct().count())
  }

  test("json extraction matches raw substring parse") {
    import spark.implicits._
    val viaJson = Tables.events(spark, sf)
      .select(get_json_object($"props", "$.k").cast("int").as("k"))
    val viaRegex = Tables.events(spark, sf)
      .select(regexp_extract($"props", "\\\"k\\\": (\\d+)", 1).cast("int").as("k"))
    assert(viaJson.exceptAll(viaRegex).count() == 0)
  }

  test("as-of join (union-sort form) == brute-force range join") {
    import spark.implicits._
    val fast = EventOps.queries("asof_join_events")(spark, sf)
    val e = Tables.events(spark, sf)
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value".as("p_value"))
    // reference semantics: most recent purchase at-or-before each click
    val brute = clicks.join(purchases,
        $"user_id" === $"p_user" && $"p_ts" <= $"ts", "left")
      .groupBy($"event_id", $"user_id", $"ts")
      .agg(max($"p_ts").as("last_purchase_ts"),
           coalesce(max_by($"p_value", $"p_ts"), lit(-1.0)).as("last_purchase_value"))
    assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0)
    assert(fast.count() == clicks.count()) // left semantics: every click kept
  }

  test("islands-per-user count never exceeds events-per-user (W1 property)") {
    import spark.implicits._
    val runs = graft.operators.TranscriptOps.queries("w1_islands_events")(spark, sf)
    val events = Tables.events(spark, sf).groupBy($"user_id").count()
    val joined = runs.join(events, "user_id")
    assert(joined.filter($"n_runs" > $"count").count() == 0)
  }

  test("retention: retained <= active, rate in [0,1], retained users are next-day actives") {
    import spark.implicits._
    val rows = operators.EventOps.queries("retention_daily")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // cross-check one day against a direct set intersection
    val daily = Tables.events(spark, sf)
      .select(to_date($"ts").as("day"), $"user_id").distinct().collect()
      .groupBy(_.getDate(0).toString).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    val mid = rows(rows.length / 2)
    val d = mid.getDate(0).toLocalDate
    val expect = (daily(d.toString) intersect daily.getOrElse(d.plusDays(1).toString, Set.empty)).size
    assert(mid.getLong(2) == expect)
  }

  test("funnel: stage counts are monotone non-increasing") {
    val r = operators.EventOps.queries("funnel_signup_view_purchase")(spark, sf).head()
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2))
    assert(r.getLong(2) > 0, "fixture should have at least one full conversion")
  }

  test("scd2 incremental merge == full batch rebuild, and the delta actually split keys") {
    import spark.implicits._
    val inc = operators.EventOps.queries("scd2_incremental_merge")(spark, sf)
    val ev = Tables.events(spark, sf).filter($"user_id" < 20)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val full = graft.api.Graft.scd2(ev, "user_id", "ts", "event_id", "event_type")
      .withColumnRenamed("change_id", "change_event_id")
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0)
    // the fixture must exercise the interesting path: at least one key with
    // rows on BOTH sides of the cutoff (else the merge degenerates to union)
    val cut = ev.agg(expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2")).head.getLong(0)
    val both = ev.groupBy($"user_id")
      .agg(sum(when(unix_micros($"ts") <= cut, 1).otherwise(0)).as("pre"),
           sum(when(unix_micros($"ts") > cut, 1).otherwise(0)).as("post"))
      .filter($"pre" > 0 && $"post" > 0).count()
    assert(both > 0, "cutoff should split at least one user's history")
  }

  test("mv incremental merge == full rebuild, and every key genuinely merges two partials") {
    import spark.implicits._
    val inc = operators.EventOps.queries("mv_incremental_agg")(spark, sf)
    val full = Tables.events(spark, sf)
      .withColumn("cents", floor($"value" * 100 + 0.5).cast("long"))
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0)
    // parity split must put rows on BOTH sides for most keys, else the
    // merge degenerates to a relabeled union
    val mixed = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(when($"event_id" % 2 === 0, 1).otherwise(0)).as("even"),
           sum(when($"event_id" % 2 =!= 0, 1).otherwise(0)).as("odd"))
      .filter($"even" > 0 && $"odd" > 0).count()
    assert(mixed > 0, "no key merges two partials — fixture degenerate")
  }

  test("multi-touch attribution conserves purchase value across touched users") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id", $"ts".as("pts"), $"value")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("cts"))
    // total attributed value == total value of purchases that HAVE at
    // least one in-window click (each purchase's weights sum to value)
    val touched = p.join(c, Seq("user_id"))
      .filter($"cts" >= $"pts" - expr("interval 1 hour") && $"cts" < $"pts")
      .select($"pid", $"value").distinct()
    val want = touched.agg(sum($"value")).head.getDouble(0)
    val got = operators.EventOps.queries("j_multitouch_attribution")(spark, sf)
      .agg(sum($"attributed_value")).head.getDouble(0)
    assert(math.abs(got - want) < 0.05, s"attributed $got != purchase mass $want")
  }
}
