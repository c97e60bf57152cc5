package graft

import org.apache.spark.sql.functions._

/** Properties for the time-series family (each query also runs under the
  * DuckDB oracle gate; these pin the math, not just engine agreement). */
class TimeSeriesOpsSpec extends SparkSpec {

  test("ts_autocorr_lag1: r in [-1,1] and n_pairs = hours-1 per type") {
    import spark.implicits._
    val rows = operators.TimeSeriesOps.queries("ts_autocorr_lag1")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hoursPerType = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("HOUR", $"ts")).count()
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ac = r.getAs[Double]("autocorr")
      assert(ac >= -1.0 - 1e-9 && ac <= 1.0 + 1e-9, s"$r out of range")
      assert(r.getAs[Long]("n_pairs") == hoursPerType(r.getString(0)) - 1)
    }
  }

  test("ts_changepoint_meanshift: matches a driver-side argmax replay") {
    import spark.implicits._
    val got = operators.TimeSeriesOps.queries("ts_changepoint_meanshift")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val series = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("HOUR", $"ts").as("hour")).count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.sortBy(_.getTimestamp(1).getTime).map(_.getLong(2))
      }
    series.foreach { case (t, cnts) =>
      val n = cnts.length.toLong
      val tot = cnts.sum
      var cum = 0L
      val scored = cnts.zipWithIndex.dropRight(1).map { case (c, i) =>
        cum += c
        val k = (i + 1).toLong
        val mb = cum.toDouble / k
        val ma = (tot - cum).toDouble / (n - k)
        (math.abs(mb - ma) * math.sqrt((k * (n - k)).toDouble / n), k)
      }
      val best = scored.maxBy { case (s, k) => (s, -k) } // ties → smallest t
      assert(math.abs(got(t).getAs[Double]("score") - best._1) < 5e-7,
        s"$t: score ${got(t).getAs[Double]("score")} vs replay ${best._1}")
    }
  }

  test("w_time_weighted_avg: bounded by the user's min/max value") {
    import spark.implicits._
    val twa = operators.TimeSeriesOps.queries("w_time_weighted_avg")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("twa_value")).toMap
    val bounds = Tables.events(spark, sf).groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(twa.nonEmpty)
    twa.foreach { case (u, v) =>
      val (lo, hi) = bounds(u)
      assert(v >= lo - 0.01 && v <= hi + 0.01, s"user $u: twa $v outside [$lo,$hi]")
    }
  }

  test("ts_seasonality_hod: count-weighted mean index is 1 (conservation)") {
    import spark.implicits._
    // Σ hod_cnt · (1/idx-weighting) — conservation: Σ over hods of
    // hod_hours·idx = total_hours, i.e. hours-weighted mean idx == 1.
    val rows = operators.TimeSeriesOps.queries("ts_seasonality_hod")(spark, sf)
      .collect().groupBy(_.getString(0))
    val hourCounts = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("HOUR", $"ts").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"event_type", hour($"hour").as("hod"))
      .agg(count(lit(1)).as("hod_hours")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.foreach { case (t, rs) =>
      val totalHours = rs.map(r => hourCounts((t, r.getInt(1)))).sum
      val weighted = rs.map { r =>
        hourCounts((t, r.getInt(1))) * r.getAs[Double]("seasonal_idx")
      }.sum
      assert(math.abs(weighted / totalHours - 1.0) < 1e-4,
        s"$t: hours-weighted mean idx ${weighted / totalHours} != 1")
      rs.foreach(r => assert(r.getAs[Double]("seasonal_idx") > 0))
    }
  }

  test("ts_seasonal_anomaly: flags replay from the exact-integer 3-sigma rule") {
    import org.apache.spark.sql.functions._
    val got = operators.TimeSeriesOps.queries("ts_seasonal_anomaly")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_anomalies"))).toMap
    assert(got.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).cast("long"),
              floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(x => (x._1, x._2)).foreach { case (key, rows) =>
      val n = BigInt(rows.length)
      val s = rows.map(x => BigInt(x._3)).sum
      val ss = rows.map(x => BigInt(x._3) * x._3).sum
      val rhs = 9 * (n * ss - s * s)
      val flags = rows.count { x =>
        val d = BigInt(x._3) * n - s; d * d > rhs
      }
      assert(got(key) == (rows.length.toLong, flags.toLong),
        s"$key: anomaly census mismatch")
    }
  }
}
