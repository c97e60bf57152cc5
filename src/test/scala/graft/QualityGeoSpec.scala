package graft

import org.apache.spark.sql.functions._

/** Invariants for the data-quality gate family and the spatial grid
  * family beyond the DuckDB oracle: the suite passes on the clean
  * fixture, profiles account for every row, and the grid operators
  * agree with a brute-force recomputation of their own declared
  * semantics (grid-kNN within the 3×3 neighborhood; 3×3 kernel mass). */
class QualityGeoSpec extends SparkSpec {

  test("dq_expectation_suite: clean fixture passes every rule") {
    val out = SparkEntry.queries("dq_expectation_suite")(spark, sf).collect()
    assert(out.length == 11)
    assert(out.forall(_.getAs[Int]("ok") == 1),
      "driver fixture must violate no expectation")
    assert(out.forall(_.getAs[Long]("violations") == 0L))
    assert(out.forall(_.getAs[Long]("checked") > 0L))
    // every declared table contributes
    assert(out.map(_.getAs[String]("tbl")).toSet ==
      Set("orders", "lineitem", "documents", "customer"))
  }

  test("dq_null_profile: one row per orders column, rates bounded") {
    val out = SparkEntry.queries("dq_null_profile")(spark, sf).collect()
    val cols = Tables.orders(spark, sf).columns.toSet
    assert(out.map(_.getAs[String]("col_name")).toSet == cols)
    assert(out.forall(r => r.getAs[Long]("null_rate_e6") >= 0 &&
                           r.getAs[Long]("null_rate_e6") <= 1000000L))
  }

  test("dq_freshness_lag: exactly one type is fresh (lag 0)") {
    val out = SparkEntry.queries("dq_freshness_lag")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("lag_min") >= 0L))
    assert(out.count(_.getAs[Long]("lag_min") == 0L) >= 1,
      "the type carrying the corpus max has zero lag")
  }

  test("dq_reconcile_orders_items: monthly books balance") {
    val out = SparkEntry.queries("dq_reconcile_orders_items")(spark, sf)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_orphan") ==
             r.getAs[Long]("n_orders"))
    }
    val itemMass = out.map(_.getAs[Long]("n_item_rows")).sum
    assert(itemMass == Tables.lineitem(spark, sf).count(),
      "every lineitem row must be attributed to exactly one month")
  }

  test("dq_quarantine_rules: violated list is consistent and non-empty") {
    val out = SparkEntry.queries("dq_quarantine_rules")(spark, sf).collect()
    assert(out.nonEmpty, "the md5-dirtied feed must route some rows out")
    out.foreach { r =>
      val rules = r.getAs[String]("violated").split(",")
      assert(rules.nonEmpty && rules.forall(Set("not_null_o_custkey",
        "range_o_totalprice_nonneg", "not_blank_o_orderpriority")))
      assert(rules.length.toLong == r.getAs[Long]("n_violations"))
    }
  }

  test("dq_schema_drift: footer census yields the constructed drift") {
    val out = SparkEntry.queries("dq_schema_drift")(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Int]("in_v1"), r.getAs[Int]("in_v2"),
          r.getAs[String]("status")))).toMap
    assert(out == Map(
      "o_orderkey"      -> ((1, 1, "type_changed")),
      "o_orderpriority" -> ((0, 1, "added")),
      "o_orderstatus"   -> ((1, 0, "dropped")),
      "o_totalprice"    -> ((1, 1, "same"))))
  }

  test("dq_volume_anomaly: integer z-gate replays from the daily counts") {
    val out = SparkEntry.queries("dq_volume_anomaly")(spark, sf).collect()
    out.foreach { r =>
      val (n, s7, sq7) = (r.getAs[Long]("n"), r.getAs[Long]("sum7"),
        r.getAs[Long]("sumsq7"))
      val lhs = BigInt(3) * BigInt(7 * n - s7) * BigInt(7 * n - s7)
      val rhs = BigInt(14) * (BigInt(7) * sq7 - BigInt(s7) * s7)
      assert((lhs > rhs) == (r.getAs[Int]("anomaly") == 1))
    }
    // daily grain accounting: trailing sums must come from real rows
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val byType = daily.keys.groupBy(_._1).map { case (t, ks) =>
      t -> ks.map(_._2).toSeq.sorted
    }
    out.foreach { r =>
      val (t, d) = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      val days = byType(t)
      val i = days.indexOf(d)
      assert(i >= 7, "gated rows must have a full 7-day trailing window")
      val win = days.slice(i - 7, i).map(dd => daily((t, dd)))
      assert(r.getAs[Long]("sum7") == win.sum)
      assert(r.getAs[Long]("sumsq7") == win.map(x => x * x).sum)
    }
  }

  test("link_em_weights: EM posteriors and weights are coherent") {
    val out = SparkEntry.queries("link_em_weights")(spark, sf).collect()
    // sf0.001 has no (name-agrees, bucket-differs) pair — 3 patterns
    // there, all 4 at the gate SFs
    assert(out.length >= 3 && out.length <= 4)
    val byPat = out.map(r => (r.getAs[Int]("ag_name"), r.getAs[Int]("ag_bucket"))
      -> r.getAs[Double]("g2_r6")).toMap
    // full agreement must carry the highest match posterior, full
    // disagreement the lowest
    assert(byPat((1, 1)) == out.map(_.getAs[Double]("g2_r6")).max)
    assert(byPat((0, 0)) == out.map(_.getAs[Double]("g2_r6")).min)
    val r0 = out.head
    assert(r0.getAs[Double]("p_r6") > 0 && r0.getAs[Double]("p_r6") < 1)
    // each field must be MORE likely to agree under match than non-match
    assert(r0.getAs[Double]("m_name_r6") > r0.getAs[Double]("u_name_r6"))
    assert(r0.getAs[Double]("m_bucket_r6") > r0.getAs[Double]("u_bucket_r6"))
  }

  test("geo_grid_knn_capped: replay honors the 9-cell x K=4 cap") {
    val out = SparkEntry.queries("geo_grid_knn_capped")(spark, sf).collect()
    assert(out.forall(_.getAs[Long]("n_candidates") <= 36),
      "candidate volume must be bounded by 9 cells x cap 4")
    def h(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val pts = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0)).map { u =>
        val hx = h(u.toString)
        (u, java.lang.Long.parseLong(hx.substring(0, 4), 16),
            java.lang.Long.parseLong(hx.substring(4, 8), 16))
      }
    val capped = pts.groupBy { case (_, x, y) => (x / 4096, y / 4096) }
      .flatMap { case (_, members) =>
        members.toSeq.sortBy { case (u, _, _) => (h(s"$u:cap"), u) }.take(4)
      }.toSeq
    val got = out.map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[Long]("nn_user_id"), r.getAs[Long]("dist2"),
        r.getAs[Long]("n_candidates")))).toMap
    pts.foreach { case (u, xi, yi) =>
      val (cx, cy) = (xi / 4096, yi / 4096)
      val cands = capped.filter { case (v, bx, by) =>
        v != u && math.abs(bx / 4096 - cx) <= 1 && math.abs(by / 4096 - cy) <= 1
      }.map { case (v, bx, by) =>
        (v, (xi - bx) * (xi - bx) + (yi - by) * (yi - by))
      }
      if (cands.isEmpty) assert(!got.contains(u))
      else assert(got(u) ==
        ((cands.minBy { case (v, d) => (d, v) }._1,
          cands.map(_._2).min, cands.length.toLong)), s"user $u mismatch")
    }
  }

  test("geo_grid_knn matches a brute-force replay of its grid semantics") {
    val rows = SparkEntry.queries("geo_grid_knn")(spark, sf).collect()
    val out = rows.map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("nn_user_id"), r.getAs[Long]("dist2"),
          r.getAs[Long]("n_candidates")))).toMap
    // brute-force: same md5-derived points, same 3×3 candidate rule,
    // pitch derived from the same occupancy ladder the query uses
    val pts = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0)).map { u =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (u, java.lang.Long.parseLong(h.substring(0, 4), 16),
            java.lang.Long.parseLong(h.substring(4, 8), 16))
      }
    val n = pts.length.toLong
    val pitch = Iterator.iterate(16384L)(_ / 2).takeWhile(_ >= 1L)
      .filter(p => n * p * p <= 8L * 65536L * 65536L)
      .nextOption().getOrElse(1L)
    assert(rows.forall(_.getAs[Long]("pitch") == pitch),
      "query must report the occupancy-derived pitch")
    pts.foreach { case (u, xi, yi) =>
      val (cx, cy) = (xi / pitch, yi / pitch)
      val cands = pts.filter { case (v, bx, by) =>
        v != u && math.abs(bx / pitch - cx) <= 1 && math.abs(by / pitch - cy) <= 1
      }.map { case (v, bx, by) =>
        (v, (xi - bx) * (xi - bx) + (yi - by) * (yi - by))
      }
      if (cands.isEmpty) assert(!out.contains(u))
      else {
        val best = cands.minBy { case (v, d) => (d, v) }
        assert(out(u) == ((best._1, best._2, cands.length.toLong)),
          s"user $u grid-kNN mismatch")
      }
    }
  }

  test("geo_trajectory_l1 matches a brute-force per-user path replay") {
    val out = SparkEntry.queries("geo_trajectory_l1")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("path_len_l1"),
          r.getAs[Long]("net_disp_l1"), r.getAs[Long]("tortuosity_e6"))))
      .toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsl"), col("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tsl"),
                 r.getAs[Long]("event_id")))
    val byUser = ev.groupBy(_._1)
    assert(out.keySet == byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val path = rows.sortBy { case (_, t, e) => (t, e) }.map { case (_, _, e) =>
        val h = md5hex(e.toString)
        (java.lang.Long.parseLong(h.substring(0, 4), 16),
         java.lang.Long.parseLong(h.substring(4, 8), 16))
      }
      val len = path.sliding(2).collect { case Array((x1, y1), (x2, y2)) =>
        math.abs(x2 - x1) + math.abs(y2 - y1) }.sum
      val net = math.abs(path.last._1 - path.head._1) +
                math.abs(path.last._2 - path.head._2)
      val tort = len * 1000000L / math.max(net, 1L)
      assert(out(u) == ((path.length.toLong, len, net, tort)),
        s"user $u trajectory mismatch")
    }
  }

  test("geo_heatmap_smooth: kernel mass and self-count agree with replay") {
    val out = SparkEntry.queries("geo_heatmap_smooth")(spark, sf).collect()
    val cells = out.map(r => (r.getAs[Long]("gx"), r.getAs[Long]("gy")) ->
      ((r.getAs[Long]("n"), r.getAs[Long]("smoothed")))).toMap
    // replay the convolution from the per-cell counts the query reports
    val counts = cells.collect { case (k, (n, _)) if n > 0 => k -> n }
    for (((gx, gy), (_, smoothed)) <- cells) {
      val expect = (for {
        dx <- -1 to 1; dy <- -1 to 1
        n <- counts.get((gx - dx, gy - dy))
      } yield n * (if (dx == 0 && dy == 0) 4
                   else if (math.abs(dx) + math.abs(dy) == 1) 2
                   else 1)).sum
      assert(smoothed == expect, s"cell ($gx,$gy) kernel mismatch")
    }
    // zero-count cells appear only via a nonzero neighbor
    assert(cells.values.forall { case (n, sm) => sm > 0 || n > 0 })
  }
}
