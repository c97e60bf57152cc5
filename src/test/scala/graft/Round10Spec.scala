package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: the weak-keyed exchange memo contract, the
  * session-shared IVF model, and the wave-A analytics (DP quantile
  * grid, capture-recapture, watermark SLA, graph-ANN beam search). */
class Round10Spec extends SparkSpec {

  // ---- shared exchanges --------------------------------------------

  test("beam curve: grid complete, visited bounded, hits consistent") {
    val out = SparkEntry.queries("ann_beam_search_graph")(spark, sf).collect()
    // 5 queries × 3 beam widths
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    out.foreach { r =>
      val (vis, hits) = (r.getAs[Long]("n_visited"), r.getAs[Long]("n_hits"))
      assert(Seq(2L, 4L, 8L).contains(r.getAs[Long]("beam_b")))
      assert(hits >= 0 && hits <= 3)
      assert(vis >= r.getAs[Long]("beam_b"),
        "must visit at least one beam's worth of nodes")
      assert(r.getAs[Long]("recall_e6") == hits * 1000000L / 3)
      // the audit's whole point: the walk touches a small corpus
      // fraction (otherwise it degenerates to brute force)
      assert(r.getAs[Long]("visited_e6") < 500000L,
        "visited over half the corpus — not a beam search any more")
    }
  }

  // ---- memo lifecycle (r9 advice) ------------------------------------

  test("memoizedExchange keys on session identity and survives re-entry") {
    val a = api.Graft.memoizedExchange("r10_spec_probe", spark, sf) {
      Tables.documents(spark, sf).limit(3)
    }
    val b = api.Graft.memoizedExchange("r10_spec_probe", spark, sf) {
      fail("build must not re-run on memo hit"); ???
    }
    assert(a eq b)
    // a DIFFERENT dir key builds fresh
    val c = api.Graft.memoizedExchange("r10_spec_probe", spark, sf + "/.") {
      Tables.documents(spark, sf).limit(2)
    }
    assert(!(c eq a))
  }

  // ---- wave-A analytics ----------------------------------------------

  test("privacy_dp_quantiles: grid complete, q50 row matches dp_median machinery") {
    val out = SparkEntry.queries("privacy_dp_quantiles")(spark, sf).collect()
    val types = out.map(_.getAs[String]("event_type")).distinct
    assert(out.length == types.length * 3, "one row per (type, quantile)")
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val q = r.getAs[Long]("q_pct")
      // true quantile rank error is 0..99 by construction of min-c pick;
      // the DP pick's error is bounded by the whole domain but must be
      // a legal |100·cum − q·n| value
      assert(r.getAs[Long]("rank_err100") >= 0 &&
             r.getAs[Long]("rank_err100") <= 100L * n)
      assert(Seq(25L, 50L, 75L).contains(q))
    }
  }

  test("stat_capture_recapture: Chapman dominates overlap and bounds coverage") {
    val out = SparkEntry.queries("stat_capture_recapture")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("m"))
      val chapman = r.getAs[Long]("chapman_n")
      val observed = r.getAs[Long]("observed_n")
      assert(m >= 1 && m <= math.min(n1, n2))
      assert(observed == n1 + n2 - m)
      // Chapman's estimate can never fall below either capture
      assert(chapman >= math.max(n1, n2) - 1)
      assert(r.getAs[Long]("coverage_e6") >= 0)
    }
  }

  test("e_watermark_sla: retention monotone in D and d_star meets the SLA") {
    val out = SparkEntry.queries("e_watermark_sla")(spark, sf).collect()
    val byDay = out.groupBy(_.getAs[java.sql.Date]("day"))
    byDay.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("d_us"))
      val ret = sorted.map(_.getAs[Long]("retained_e6"))
      assert(ret.zip(ret.tail).forall { case (a, b) => a <= b },
        "retention must be monotone non-decreasing in the delay")
      // replay the SLA definition against the published d_star: drops
      // at D = d_star must be within the 0.1% budget
      val n = sorted.head.getAs[Long]("n_events")
      val dStar = sorted.head.getAs[Long]("d_star_us")
      sorted.filter(_.getAs[Long]("d_us") >= dStar).foreach { r =>
        assert(r.getAs[Long]("n_dropped") <= n / 1000,
          "a grid delay >= d_star must meet the drop budget")
      }
    }
  }
}
