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

  test("a_heavy_hitters_cms: CMS estimates upper-bound truth; result equals the exact HAVING") {
    import spark.implicits._
    val (width, depth) = (1024, 4)
    val ev = Tables.events(spark, sf).select($"user_id")
    val exact = ev.groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cms = ev
      .select(graft.functions.CmsFns.keyHashes($"user_id", depth)
        .zipWithIndex.map { case (h, i) => h.as(s"h$i") }: _*)
      .as[(Long, Long, Long, Long)]
      .select(new graft.functions.CmsAgg(width, depth).toColumn.name("cms"))
    // upper-bound property: no estimate may undercount (this is what
    // makes the prefilter lossless)
    val est = ev.distinct().crossJoin(broadcast(cms))
      .select($"user_id",
        graft.functions.CmsFns.estimate("cms", "user_id", width, depth).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (u, n) =>
      assert(est(u) >= n, s"user $u: CMS estimate ${est(u)} undercounts true $n")
    }
    // end-to-end: the prefiltered pipeline equals the plain exact filter
    val total = exact.values.sum; val nUsers = exact.size.toLong
    val want = exact.filter { case (_, n) => 5 * n * nUsers >= 6 * total }
    val got = operators.EventOps.queries("a_heavy_hitters_cms")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got, exact says $want")
  }

  test("j_asof_tolerance: matched gaps are within 2h and agree with the unbounded as-of") {
    import spark.implicits._
    val rows = operators.EventOps.queries("j_asof_tolerance")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (matched, gap) = (r.getBoolean(2), r.getLong(3))
      if (matched) assert(gap >= 0 && gap <= 7200000000L, s"matched gap $gap out of tolerance")
      else assert(gap == -1L)
    }
    // consistency vs the unbounded as-of: tolerance only REJECTS matches
    val unbounded = operators.EventOps.queries("asof_join_events")(spark, sf)
      .select($"event_id", $"last_purchase_ts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    rows.foreach { r =>
      val eid = r.getLong(0)
      if (r.getBoolean(2))
        assert(unbounded(eid).nonEmpty, s"click $eid matched under tolerance but not unbounded")
    }
  }

  test("w_interval_coverage: matches a driver-side interval-union sweep per user") {
    import spark.implicits._
    val got = operators.EventOps.queries("w_interval_coverage")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute-force merge on the driver (sf0.001 is small enough)
    val evs = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sorted }
    evs.foreach { case (u, starts) =>
      var (islands, covered) = (0L, 0L)
      var (curS, curE) = (Long.MinValue, Long.MinValue)
      starts.foreach { st =>
        val en = st + 1800000000L
        if (st > curE) {
          if (islands > 0) covered += curE - curS
          islands += 1; curS = st; curE = en
        } else if (en > curE) curE = en
      }
      covered += curE - curS
      assert(got(u) == ((islands, covered)),
        s"user $u: got ${got(u)}, sweep says ($islands, $covered)")
    }
  }

  test("anomaly_mad_outliers: matches a driver-side median/MAD replay") {
    import spark.implicits._
    val got = operators.EventOps.queries("anomaly_mad_outliers")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def med2(xs: Seq[Long]): Double = { // 2x the exact-interpolation median
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) 2.0 * s(n / 2) else (s(n / 2 - 1) + s(n / 2)).toDouble
    }
    val rows = Tables.events(spark, sf)
      .select($"event_type", (round($"value" * 100) * 2).cast("long").as("v2"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    rows.foreach { case (t, vs) =>
      val v2 = vs.map(_._2).toSeq
      val m4 = med2(v2)
      val dev2 = v2.map(v => math.abs(2 * v - m4).toLong)
      val mad4 = med2(dev2)
      val nOut = dev2.count(d => 2 * d > 3 * mad4)
      assert(got(t) == ((v2.size.toLong, m4.toLong, mad4.toLong, nOut.toLong)),
        s"$t: got ${got(t)}, replay says (${v2.size}, ${m4.toLong}, ${mad4.toLong}, $nOut)")
    }
  }

  test("w_ewma_trailing8: bit-exact — every EWMA is an integer number of 256ths of a cent") {
    import spark.implicits._
    val rows = operators.EventOps.queries("w_ewma_trailing8")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scaled = r.getDouble(2) * 256.0
      assert(scaled == math.rint(scaled),
        s"event ${r.getLong(1)}: ewma ${r.getDouble(2)} not exact in 2^-8 steps — the fold lost exactness")
    }
    // driver replay for one user: the fold IS the trailing-8 recursive EWMA
    val u0 = Tables.events(spark, sf)
      .filter($"user_id" === 0L)
      .select($"event_id", round($"value" * 100).as("vc"), $"ts")
      .orderBy($"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val got0 = rows.filter(_.getLong(0) == 0L).map(r => r.getLong(1) -> r.getDouble(2)).toMap
    u0.zipWithIndex.foreach { case ((eid, _), i) =>
      val frame = u0.slice(math.max(0, i - 7), i + 1).map(_._2)
      val want = frame.foldLeft(0.0)((a, x) => (a + x) * 0.5)
      // 8dp round is lossless on multiples of 2^-8, so compare exactly
      assert(got0(eid) == want, s"event $eid: ${got0(eid)} != $want")
    }
  }
}
