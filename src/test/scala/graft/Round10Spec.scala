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

  // ---- wave-B shared exchanges ---------------------------------------

  test("resampling tests agree with their pre-memoization draw semantics") {
    // the memoized replica digest must carry the EXACT md5(event_id:b)
    // prefixes the pre-memo queries computed inline: replay replica 7's
    // draws independently and compare against a fresh Spark rebuild of
    // the same expression (the single-sourced recipe both engines use)
    val fresh = Tables.events(spark, sf)
      .select(col("event_id"),
        substring(org.apache.spark.sql.functions.md5(
          concat(col("event_id").cast("string"), lit(":7"))), 1, 12).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fresh.take(5).foreach { case (id, h) =>
      val ref = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:7".getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
      assert(h == ref, s"seeded draw drifted for event $id")
    }
    // and both memo consumers still produce type-complete results
    val boot = SparkEntry.queries("stat_poisson_bootstrap_ci")(spark, sf).collect()
    val rand = SparkEntry.queries("stat_randomization_test")(spark, sf).collect()
    assert(boot.nonEmpty && rand.nonEmpty)
    boot.foreach { r =>
      assert(r.getAs[Long]("ci_lo_c") <= r.getAs[Long]("ci_hi_c"))
      assert(r.getAs[Long]("mean_c") >= r.getAs[Long]("ci_lo_c") - 1000 &&
             r.getAs[Long]("mean_c") <= r.getAs[Long]("ci_hi_c") + 1000,
        "full-sample mean far outside the bootstrap CI")
    }
    rand.foreach { r =>
      val p = r.getAs[Long]("p_e6")
      assert(p >= 0 && p <= 1000000L)
    }
  }

  // ---- wave-C analytics ----------------------------------------------

  test("graph_adamic_adar: predicted links are non-edges with sane weights") {
    val out = SparkEntry.queries("graph_adamic_adar")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 30)
    val edges = api.Graft.coPurchaseEdges(spark, sf, minSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val (a, c) = (r.getAs[Long]("a"), r.getAs[Long]("c"))
      assert(a < c, "pairs must be id-oriented")
      assert(!edges.contains((a, c)), "predicted link already exists")
      // each common neighbor contributes at most 1/ln(2) ≈ 1.4427e9
      assert(r.getAs[Long]("aa_e9") <= r.getAs[Long]("cn") * 1442695041L + 1)
      assert(r.getAs[Long]("aa_e9") > 0)
    }
  }

  test("anomaly_iqr_fences: quartiles ordered, outliers bounded") {
    val out = SparkEntry.queries("anomaly_iqr_fences")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("q1_c") <= r.getAs[Long]("q3_c"))
      assert(r.getAs[Long]("iqr_c") ==
        r.getAs[Long]("q3_c") - r.getAs[Long]("q1_c"))
      // Tukey fences at 1.5 IQR can mark at most a quarter on each side
      assert(r.getAs[Long]("n_lo") <= r.getAs[Long]("n") / 4 + 1)
      assert(r.getAs[Long]("n_hi") <= r.getAs[Long]("n") / 4 + 1)
    }
  }

  test("v_ivf_silhouette: bounded scores and full cell cover") {
    val out = SparkEntry.queries("v_ivf_silhouette")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("g")).toSet.size == out.length)
    val totalVecs = out.map(_.getAs[Long]("n_vectors")).sum
    assert(totalVecs == Tables.embeddings(spark, sf).count())
    out.foreach { r =>
      val n = r.getAs[Long]("n_vectors")
      val sum = r.getAs[Long]("sum_sil_e6")
      assert(sum >= -1000000L * n && sum <= 1000000L * n,
        "silhouette must stay within [-1, 1] per vector")
      assert(r.getAs[Long]("n_negative") <= n)
    }
  }

  test("bpe_compression_eval: merges only shrink, totals conserve") {
    val out = SparkEntry.queries("bpe_compression_eval")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("tokens_bpe") <= r.getAs[Long]("tokens_ws"),
        "a merge can never increase the token count")
      assert(r.getAs[Long]("ratio_e6") <= 1000000L)
      assert(r.getAs[Long]("chars_per_tok_e6") >= 1000000L,
        "a token is at least one char")
    }
  }

  test("curate_epoch_schedule: budget conserved within rounding, flags honest") {
    val out = SparkEntry.queries("curate_epoch_schedule")(spark, sf).collect()
    assert(out.nonEmpty)
    val totalTokens = out.map(_.getAs[Long]("n_tokens")).sum
    val totalAlloc = out.map(_.getAs[Long]("alloc_tokens")).sum
    // T = 4x corpus; floor-div loses at most 1 token per source
    assert(totalAlloc <= 4 * totalTokens)
    assert(totalAlloc >= 4 * totalTokens - out.length)
    out.foreach { r =>
      val e = r.getAs[Long]("epochs_e2")
      assert(e == r.getAs[Long]("alloc_tokens") * 100 / r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("flag_overfit") == (if (e > 400) 1L else 0L))
    }
  }

  test("prep_quantile_bins: 4 ordered bins per type, population conserved") {
    val out = SparkEntry.queries("prep_quantile_bins")(spark, sf).collect()
    val byT = out.groupBy(_.getAs[String]("event_type"))
    val nTotal = Tables.events(spark, sf).count()
    assert(byT.values.map(_.map(_.getAs[Long]("n")).sum).sum == nTotal,
      "every event must land in exactly one bin")
    byT.foreach { case (_, rows) =>
      val bins = rows.sortBy(_.getAs[Long]("bin"))
      assert(bins.map(_.getAs[Long]("bin")).forall(b => b >= 1 && b <= 4))
      // bins are value-ordered and non-overlapping
      bins.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("hi_c") <= b.getAs[Long]("lo_c"))
        case _ =>
      }
      // sampled edges keep bins near 25% (audit tolerance: within
      // [10%, 45%] — a violation means the sample drifted wildly)
      rows.foreach { r =>
        val s = r.getAs[Long]("share_e6")
        assert(s > 100000L && s < 450000L, s"bin share off: $s")
      }
    }
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
