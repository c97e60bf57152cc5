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

  test("geo_grid_knn matches a brute-force replay of its grid semantics") {
    val out = SparkEntry.queries("geo_grid_knn")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("nn_user_id"), r.getAs[Long]("dist2"),
          r.getAs[Long]("n_candidates")))).toMap
    // brute-force: same md5-derived points, same 3×3 candidate rule
    val pts = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0)).map { u =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (u, java.lang.Long.parseLong(h.substring(0, 4), 16),
            java.lang.Long.parseLong(h.substring(4, 8), 16))
      }
    pts.foreach { case (u, xi, yi) =>
      val (cx, cy) = (xi / 16384, yi / 16384)
      val cands = pts.filter { case (v, bx, by) =>
        v != u && math.abs(bx / 16384 - cx) <= 1 && math.abs(by / 16384 - cy) <= 1
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
