package graft

import org.apache.spark.sql.functions._

/** Targeted invariants for the round-8 operators (each also runs under
  * the DuckDB oracle gate via SparkEntry). */
class RoundEightOpsSpec extends SparkSpec {

  test("cumHistW merge law: weighted histogram of a union == vector sum of shard histograms") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"source", $"n_chars", size(split($"text", " ")).cast("long").as("w"))
    // shard on doc parity via n_chars; merge = groupBy(g,v).sum — the
    // additive law that makes the sketch distributable
    val shardA = docs.filter($"n_chars" % 2 === 0)
    val shardB = docs.filter($"n_chars" % 2 =!= 0)
    def hist(df: org.apache.spark.sql.DataFrame) =
      operators.StatSketchOps.cumHistW(df, $"source", $"n_chars", $"w")
        .select($"g", $"v", $"n")
    val merged = hist(shardA).union(hist(shardB))
      .groupBy($"g", $"v").agg(sum($"n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = hist(docs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct, "shard-merged weighted histogram must equal the direct one")
  }

  test("a_weighted_hist_quantile: quantiles are monotone and bracket the per-source extremes") {
    val rows = operators.StatSketchOps.queries("a_weighted_hist_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    val mm = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .groupBy(col("source")).agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val qs = Seq("p25_chars", "p50_chars", "p75_chars", "p90_chars").map(r.getAs[Long])
      assert(qs == qs.sorted, s"quantiles not monotone: $qs")
      val (mn, mx) = mm(r.getAs[String]("source"))
      assert(qs.head >= mn && qs.last <= mx)
      assert(r.getAs[Long]("total_tokens") > 0)
    }
  }

  test("a_weighted_quantile: matches a driver-side weighted-quantile replay") {
    import spark.implicits._
    val out = operators.StatSketchOps.queries("a_weighted_quantile")(spark, sf).collect().head
    val rows = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"doc_id", $"n_chars", size(split($"text", " ")).cast("long").as("w"))
      .as[(Long, Long, Long)].collect().sortBy(t => (t._2, t._1))
    val total = rows.map(_._3).sum
    def q(num: Long, den: Long): Long = {
      var cum = 0L
      rows.find { t => cum += t._3; cum * den >= total * num }.get._2
    }
    assert(out.getAs[Long]("total_w") == total)
    assert(out.getAs[Long]("n_docs") == rows.length)
    assert(out.getAs[Long]("p25") == q(1, 4))
    assert(out.getAs[Long]("p50") == q(1, 2))
    assert(out.getAs[Long]("p75") == q(3, 4))
    assert(out.getAs[Long]("p90") == q(9, 10))
  }

  test("stat_welch_t_drift: t matches a driver-side Welch computation per source") {
    import spark.implicits._
    val out = operators.StatSketchOps.queries("stat_welch_t_drift")(spark, sf)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Double]("t_stat"))).toMap
    assert(out.nonEmpty)
    val data = Tables.documents(spark, sf).select($"source", $"n_chars")
      .as[(String, Long)].collect()
    val bySrc = data.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    bySrc.foreach { case (src, xs) =>
      val rest = data.filter(_._1 != src).map(_._2.toDouble)
      if (xs.length >= 2 && rest.length >= 2) {
        def meanVar(a: Array[Double]) = {
          val m = a.sum / a.length
          (m, a.map(x => (x - m) * (x - m)).sum / (a.length - 1))
        }
        val (m1, v1) = meanVar(xs); val (m2, v2) = meanVar(rest)
        val t = (m1 - m2) / math.sqrt(v1 / xs.length + v2 / rest.length)
        val (n, got) = out(src)
        assert(n == xs.length)
        assert(math.abs(got - t) < 1e-4, s"$src: t $got vs replay $t")
      }
    }
  }

  test("w_rolling_active_28d: sweep equals the naive per-day distinct count") {
    import spark.implicits._
    val got = operators.EventOps.queries("w_rolling_active_28d")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getAs[Long]("n_active_28d")).toMap
    assert(got.nonEmpty)
    val ud = Tables.events(spark, sf)
      .select($"user_id", date_trunc("DAY", $"ts").cast("date").as("day"))
      .distinct().as[(Long, java.sql.Date)].collect()
    val days = ud.map(_._2.toLocalDate).distinct.sorted
    var d = days.head
    while (!d.isAfter(days.last)) {
      val n = ud.filter { case (_, ad) =>
        val a = ad.toLocalDate
        !a.isAfter(d) && !a.isBefore(d.minusDays(27))
      }.map(_._1).distinct.length
      assert(got(d.toString) == n.toLong, s"day $d: ${got(d.toString)} vs naive $n")
      d = d.plusDays(1)
    }
  }

  test("e_session_path_trigrams: mass bound and rank order hold") {
    val rows = operators.EventOps.queries("e_session_path_trigrams")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sortBy(-_)), "not ordered by count desc")
    // total trigram mass = Σ over sessions of max(0, len-2)
    val sessions = operators.EventOps.queries("sessionize_30m")(spark, sf)
      .collect().map(_.getAs[Long]("n_events"))
    val mass = sessions.map(l => math.max(0L, l - 2)).sum
    assert(ns.sum <= mass, "top-20 trigram mass exceeds the session-length bound")
  }

  test("a_markov_entropy_rate: entropies bounded by ln(k) and match a replay") {
    import spark.implicits._
    val out = operators.EventOps.queries("a_markov_entropy_rate")(spark, sf).collect()
    assert(out.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.events(spark, sf)
      .withColumn("nx", lead($"event_type", 1).over(w))
      .filter($"nx".isNotNull)
      .select($"event_type", $"nx").as[(String, String)].collect()
    out.foreach { r =>
      val k = r.getAs[Long]("k_next")
      val h = r.getAs[Double]("h_next")
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6)
      val from = r.getAs[String]("event_type")
      val counts = trans.filter(_._1 == from).groupBy(_._2).map(_._2.length.toDouble)
      val n = counts.sum
      val replay = math.log(n) - counts.map(c => c * math.log(c)).sum / n
      assert(math.abs(h - replay) < 1e-4, s"$from: $h vs replay $replay")
    }
  }

  test("retrieval_prf_expansion: valid ranking whose expansion shifts or preserves bm25") {
    val prf = operators.LexicalOps.queries("retrieval_prf_expansion")(spark, sf).collect()
    assert(prf.nonEmpty)
    prf.groupBy(_.getAs[Int]("qid")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to rows.length).toSeq, "ranks must be 1..k dense")
      val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score_e12"))
      assert(scores.sameElements(scores.sortBy(-_)), "scores must be non-increasing in rank")
    }
    // expanded scores dominate: every doc that BM25 alone retrieved at
    // top-5 keeps a positive score under the expanded query too (the
    // original terms are a subset of the expanded terms)
    val bm25 = operators.LexicalOps.queries("retrieval_bm25_topk")(spark, sf).collect()
    val prfDocs = prf.map(r => (r.getAs[Int]("qid"), r.getAs[Long]("doc_id"))).toSet
    val overlap = bm25.count(r => prfDocs.contains((r.getAs[Int]("qid"), r.getAs[Long]("doc_id"))))
    assert(overlap > 0, "PRF must retain at least one original top-5 doc")
  }

  test("stat_psi_value_drift: PSI >= 0 up to quantization, and identical halves give ~0") {
    val rows = operators.StatSketchOps.queries("stat_psi_value_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // PSI is a sum of (p-q)ln(p/q) terms, each >= 0 exactly; the e9
      // per-term quantization can shave at most 5e-10 per term
      assert(r.getAs[Double]("psi") >= -1e-8, s"PSI negative: $r")
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
  }

  test("a_jackknife_ci: interval brackets the mean and se matches a replay") {
    import spark.implicits._
    val out = operators.StatSketchOps.queries("a_jackknife_ci")(spark, sf).collect().head
    val mean = out.getAs[Double]("mean")
    assert(out.getAs[Double]("ci_lo") <= mean && mean <= out.getAs[Double]("ci_hi"))
    // replay the delete-one-bucket estimate driver-side
    val p = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select(floor($"value" * 100 + 0.5).cast("long").as("c"),
        (conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long") % 10).as("b"))
      .as[(Long, Long)].collect()
    val byB = p.groupBy(_._2).view.mapValues(xs => (xs.length.toLong, xs.map(_._1).sum)).toMap
    val (nt, st) = (p.length.toLong, p.map(_._1).sum)
    val g = byB.size
    val loo = byB.values.map { case (n, s) => (st - s) * 1000000L / (nt - n) }.toSeq
    val mbar = loo.sum / g
    val ssq = loo.map(m => (m - mbar) * (m - mbar)).sum
    val se = math.sqrt((g - 1).toDouble / g * (ssq / 1e12)) / 100.0
    assert(math.abs(out.getAs[Double]("se_jack") - se) < 1e-4)
    assert(out.getAs[Long]("n") == nt)
  }

  test("layout_partition_skew_advisor: skew >= 1e6 and salt covers the hottest partition") {
    val rows = operators.LayoutOps.queries("layout_partition_skew_advisor")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (parts, total, mx) = (r.getAs[Long]("n_parts"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("max_rows"))
      assert(r.getAs[Long]("skew_e6") >= 1000000L - parts, "skew below even floor")
      assert(mx <= total && parts >= 1)
      val salt = r.getAs[Long]("salt_factor")
      // salting the hot key by `salt` brings its share under ~1/parts
      assert(salt >= 1 && mx <= salt * ((total + parts - 1) / parts))
    }
  }

  test("v_label_drift: cosines in [-1,1], and a self-centroid corpus scores ~1") {
    val rows = operators.RetrievalOps.queries("v_label_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_to_corpus")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_vecs") > 0)
    }
    // identity check: the global centroid is the n-weighted mean of the
    // label centroids, so Σ_l n_l·(a_l·b) = N·||b||² > 0 — at least one
    // label must be positively aligned with the corpus center
    assert(rows.map(_.getAs[Double]("cos_to_corpus")).max > 0.0,
      "some label must align positively with the corpus centroid")
  }

  test("dedup_minhash_band_tuning: S-thresholds rise with band width, (12,1) dominates candidates") {
    val rows = operators.DedupOps.queries("dedup_minhash_band_tuning")(spark, sf).collect()
    assert(rows.length == 5)
    val byBands = rows.map(r => r.getAs[Int]("n_bands") ->
      (r.getAs[Long]("n_candidates"), r.getAs[Long]("s_threshold_e6"))).toMap
    // wider bands (fewer of them) demand higher similarity to collide
    val ths = Seq(12, 6, 4, 3, 2).map(byBands(_)._2)
    assert(ths == ths.sorted, s"thresholds must rise as bands widen: $ths")
    // every (b, r>1) collision implies an r=1 collision, so (12,1) is
    // the candidate-volume ceiling
    val c121 = byBands(12)._1
    byBands.values.foreach { case (c, _) => assert(c <= c121) }
    assert(byBands.values.forall(_._1 >= 0))
  }

  test("ts_stl_decompose: components reassemble exactly and seasonal mass cancels") {
    val rows = operators.TimeSeriesOps.queries("ts_stl_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact remainder algebra by construction — assert it anyway as a
      // schema/typing tripwire
      assert(r.getAs[Long]("cnt") * 1000000L ==
        r.getAs[Long]("trend_e6") + r.getAs[Long]("seasonal_e6") + r.getAs[Long]("resid_e6"))
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val mass = rs.map(_.getAs[Long]("seasonal_e6")).sum
      // hod means and the series mean each carry <1e-6 floor-div error
      assert(math.abs(mass) <= 2L * rs.length, s"$et: seasonal mass $mass exceeds quantization bound")
      val cnts = rs.map(_.getAs[Long]("cnt"))
      rs.foreach { r =>
        val t = r.getAs[Long]("trend_e6")
        assert(t >= cnts.min * 1000000L && t <= cnts.max * 1000000L)
      }
    }
  }

  test("a_topk_heavy_changers: deltas consistent and totals reconcile with raw counts") {
    import spark.implicits._
    val rows = operators.EventOps.queries("a_topk_heavy_changers")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val deltas = rows.map(_.getAs[Long]("delta"))
    assert(deltas.sameElements(deltas.sortBy(-_)))
    val totals = Tables.events(spark, sf).groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("delta") ==
        math.abs(r.getAs[Long]("n_second") - r.getAs[Long]("n_first")))
      assert(r.getAs[Long]("n_first") + r.getAs[Long]("n_second") ==
        totals(r.getAs[Long]("user_id")))
    }
  }

  test("streaming_sliding_window: every event lands in exactly 2 overlapping windows") {
    val rows = graft.streaming.StreamingOps.queries("streaming_sliding_window")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val totalEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == 2 * totalEvents,
      "6h/3h sliding windows must double-count every event exactly once")
    // window starts are aligned to the 3-hour slide grid
    rows.foreach { r =>
      val ms = r.getTimestamp(0).getTime
      assert(ms % (3L * 3600 * 1000) == 0, s"unaligned window start: $r")
    }
  }

  test("curate_pack_fragmentation: split counts match a driver replay of concat-cut packing") {
    import spark.implicits._
    val out = operators.CurationOps.queries("curate_pack_fragmentation")(spark, sf)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_split_docs"), r.getAs[Long]("n_seqs"))).toMap
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"source", $"doc_id", size(split($"text", " ")).cast("long").as("w"))
      .filter($"w" >= 1).as[(String, Long, Long)].collect()
    docs.groupBy(_._1).foreach { case (src, ds) =>
      var cum = 0L; var splits = 0L
      ds.sortBy(_._2).foreach { case (_, _, w) =>
        if (cum / 2048 != (cum + w - 1) / 2048) splits += 1
        cum += w
      }
      val (tok, sp, seqs) = out(src)
      assert(tok == cum && sp == splits, s"$src: ($tok,$sp) vs replay ($cum,$splits)")
      assert(seqs == (cum + 2047) / 2048)
    }
  }

  test("e_bot_score_census: conservation laws hold and at least one flag fires") {
    val rows = operators.EventOps.queries("e_bot_score_census")(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users, "census must cover every user")
    rows.foreach { r =>
      val flags = r.getAs[Long]("n_high_rate") + r.getAs[Long]("n_concentrated") +
        r.getAs[Long]("n_regular")
      // within a score bucket, flag counts sum to score × users
      assert(flags == r.getAs[Long]("bot_score") * r.getAs[Long]("n_users"),
        s"flag conservation broken: $r")
    }
    // thresholds are tuned to where this corpus has mass — a census
    // with zero firing flags would mean vacuous branches
    assert(rows.exists(_.getAs[Long]("bot_score") > 0), "no flag ever fired")
  }

  test("e_bounce_rate_by_entry: session totals reconcile with sessionize_30m") {
    val rows = operators.EventOps.queries("e_bounce_rate_by_entry")(spark, sf).collect()
    assert(rows.nonEmpty)
    val sessions = operators.EventOps.queries("sessionize_30m")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == sessions.length)
    val bounces = sessions.count(_.getAs[Long]("n_events") == 1)
    assert(rows.map(_.getAs[Long]("n_bounce")).sum == bounces)
    rows.foreach { r =>
      assert(r.getAs[Long]("bounce_e6") ==
        r.getAs[Long]("n_bounce") * 1000000L / r.getAs[Long]("n_sessions"))
    }
  }

  test("a_kmv_set_ops: bottom-k merge law holds and estimates bracket the truth") {
    import spark.implicits._
    val out = operators.StatSketchOps.queries("a_kmv_set_ops")(spark, sf).collect()
    assert(out.nonEmpty)
    val hashes = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"source",
        conv(substring(md5($"text"), 1, 8), 16, 10).cast("long").as("h"))
      .distinct().as[(String, Long)].collect()
    val bySrc = hashes.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val (sa, sb) = (bySrc(a), bySrc(b))
      val trueUnion = (sa ++ sb).size
      // merge law: bottom-k of (bottomK(A) ∪ bottomK(B)) == bottom-k of (A ∪ B)
      val k = 24
      val fromSketches = (sa.toSeq.sorted.take(k) ++ sb.toSeq.sorted.take(k))
        .distinct.sorted.take(k)
      val direct = (sa ++ sb).toSeq.sorted.take(k)
      assert(fromSketches == direct, s"($a,$b): bottom-k merge law broken")
      val est = r.getAs[Long]("est_union")
      if (trueUnion < k) assert(est == trueUnion, s"small-set regime must be exact")
      else assert(est > trueUnion / 3 && est < trueUnion * 3,
        s"($a,$b): union est $est vs true $trueUnion outside 3x")
      val inter = r.getAs[Long]("est_intersection")
      assert(inter >= 0 && inter <= est)
    }
  }

  test("ts_backtest_naive: MAEs match a driver replay per type") {
    import spark.implicits._
    val out = operators.TimeSeriesOps.queries("ts_backtest_naive")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_eval_days"), r.getAs[Long]("mae_last_e6"),
         r.getAs[Long]("mae_ma7_e6"))).toMap
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("DAY", $"ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, java.sql.Date, Long)].collect()
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val series = rows.sortBy(_._2.toString).map(_._3)
      val evals = (7 until series.length).map { i =>
        val aeLast = math.abs(series(i) - series(i - 1))
        val ae7 = math.abs(series(i) * 7 - series.slice(i - 7, i).sum)
        (aeLast, ae7)
      }
      if (evals.nonEmpty) {
        val (n, maeL, mae7) = out(et)
        assert(n == evals.length)
        assert(maeL == evals.map(_._1).sum * 1000000L / n)
        assert(mae7 == evals.map(_._2).sum * 1000000L / (n * 7))
      }
    }
  }

  test("graph_assortativity: r is a valid correlation matching a driver replay") {
    import spark.implicits._
    val row = operators.GraphOps.queries("graph_assortativity")(spark, sf).collect().head
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val edges = li.alias("x")
      .join(li.alias("y"), $"x.l_orderkey" === $"y.l_orderkey" &&
        $"x.l_partkey" < $"y.l_partkey")
      .groupBy($"x.l_partkey".as("a"), $"y.l_partkey".as("b")).count()
      .filter($"count" >= 2).select($"a", $"b").as[(Long, Long)].collect()
    assert(row.getAs[Long]("n_edges") == edges.length)
    val adj = edges ++ edges.map(e => (e._2, e._1))
    val deg = adj.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val (m, xs) = (adj.length.toLong, adj.map { case (u, v) => (deg(u), deg(v)) })
    val sx = xs.map(_._1).sum; val sxy = xs.map(t => t._1 * t._2).sum
    val sxx = xs.map(t => t._1 * t._1).sum
    val replay = (m * sxy - sx * sx).toDouble / (m * sxx - sx * sx).toDouble
    assert(math.abs(r - replay) < 1e-5, s"$r vs replay $replay")
  }

  test("mv_incremental_join: the delta rule reproduces the full join exactly") {
    import spark.implicits._
    val inc = operators.EventOps.queries("mv_incremental_join")(spark, sf)
      .collect().map(r => r.getDate(0).toString ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_clicks_joined"),
         r.getAs[Long]("n_users"))).toMap
    val ev = Tables.events(spark, sf).withColumn("day", to_date($"ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"day", $"event_id".as("cid"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"day", $"event_id".as("pid"))
    val full = c.join(p, Seq("user_id", "day"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n"), countDistinct($"cid").as("nc"),
           countDistinct($"user_id").as("nu"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getAs[Long]("n"), r.getAs[Long]("nc"), r.getAs[Long]("nu"))).toMap
    assert(inc == full, "incremental join view must equal the full rebuild")
  }

  test("ta_stopword_discovery: returned tokens clear the df threshold, verified by replay") {
    import spark.implicits._
    val out = operators.TextAnalysisOps.queries("ta_stopword_discovery")(spark, sf)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
    val docs = Tables.documents(spark, sf).filter($"text".isNotNull)
    val n = docs.count()
    val dfMap = docs.select($"doc_id", explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "").distinct()
      .groupBy($"t").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    val expected = dfMap.filter { case (_, df) => df * 10 >= n * 6 }
    assert(out == expected, "discovered stoplist must match the replayed df filter")
    assert(out.nonEmpty, "the synthetic corpus's common words should clear 60% df")
  }

  test("graph_connected_components: census EQUALS the union-find true components") {
    import spark.implicits._
    val census = operators.GraphOps.queries("graph_connected_components")(spark, sf)
      .collect().map(r => r.getAs[Long]("component") -> r.getAs[Long]("n_nodes")).toMap
    assert(census.nonEmpty)
    // rebuild the support-2 edge set and run union-find to the TRUE
    // components: since the r14 fixpoint rework the census must match
    // them EXACTLY — min-id labels, exact per-component sizes (the
    // r8-r13 fixed-depth unroll under-merged 21× at sf0.01)
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val edges = li.alias("x")
      .join(li.alias("y"), $"x.l_orderkey" === $"y.l_orderkey" &&
        $"x.l_partkey" < $"y.l_partkey")
      .groupBy($"x.l_partkey".as("a"), $"y.l_partkey".as("b")).count()
      .filter($"count" >= 2).select($"a", $"b")
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val verts = edges.flatMap(t => Seq(t._1, t._2)).distinct
    val expected = verts.groupBy(find).map { case (_, vs) =>
      vs.min -> vs.length.toLong }
    assert(census == expected,
      "fixpoint census must equal the true min-id component sizes")
  }
}
