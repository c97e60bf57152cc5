package graft

import org.apache.spark.sql.functions._

/** Targeted invariants + driver-side replays for the round-8 wave-2
  * operators (each also runs under the DuckDB oracle gate via
  * SparkEntry). */
class RoundEightWave2Spec extends SparkSpec {

  test("retrieval_ndcg_eval: metrics are bounded, consistent, and saturate at full relevance") {
    val rows = operators.RetrievalOps.queries("retrieval_ndcg_eval")(spark, sf).collect()
    assert(rows.length == 50, "one row per probe")
    rows.foreach { r =>
      val nRel = r.getAs[Long]("n_rel")
      val rr = r.getAs[Long]("rr_e6")
      val ndcg = r.getAs[Long]("ndcg_e6")
      assert(nRel >= 0 && nRel <= 10)
      assert(ndcg >= 0 && ndcg <= 1000000)
      assert((rr == 0) == (nRel == 0), "RR is zero exactly when nothing relevant retrieved")
      if (rr != 0) assert(rr >= 100000 && rr <= 1000000, "RR@10 lives in [1e5, 1e6]")
      // all-relevant prefix ⇒ retrieved order IS the ideal order
      if (nRel == 10) assert(ndcg == 1000000)
      if (nRel > 0) assert(ndcg > 0)
    }
  }

  test("graph_hits_bipartite: a1/a2 match a driver-side two-iteration replay") {
    import spark.implicits._
    val e = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as[Long], $"l_partkey".as[Long])
      .distinct().collect()
    val a1 = e.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val h1 = e.groupBy(_._1).map { case (c, xs) => c -> xs.map(x => a1(x._2)).sum }
    val a2 = e.groupBy(_._2).map { case (p, xs) => p -> xs.map(x => h1(x._1)).sum }
    val rows = operators.GraphOps.queries("graph_hits_bipartite")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val p = r.getAs[Long]("partkey")
      assert(r.getAs[Long]("a1") == a1(p), s"a1 mismatch at part $p")
      assert(r.getAs[Long]("a2") == a2(p), s"a2 mismatch at part $p")
    }
    // the query's top-20 is the true top-20 of the replay
    val expectTop = a2.toSeq.sortBy { case (p, s) => (-s, p) }.take(20).map(_._1)
    assert(rows.map(_.getAs[Long]("partkey")).toSeq == expectTop)
  }

  test("layout_bloom_advisor: integer formulas replay and behave monotonically") {
    val rows = operators.LayoutOps.queries("layout_bloom_advisor")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length % 2 == 0, "two fpp rows per candidate")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_keys")
      val bpk = if (r.getAs[Long]("fpp_e6") == 10000L) 9585058L else 14377588L
      val m = (n * bpk + 999999L) / 1000000L
      assert(r.getAs[Long]("m_bits") == m, "m = ceil(n*ln(1/p)/ln^2 2)")
      assert(r.getAs[Long]("k_hashes") == (m * 693147L + n * 500000L) / (n * 1000000L))
      assert(r.getAs[Long]("m_bytes") == (m + 7L) / 8L)
      // optimal k for 1% fpp is ~6.64 → 7; for 0.1% ~9.97 → 10
      if (r.getAs[Long]("fpp_e6") == 10000L) assert(r.getAs[Long]("k_hashes") == 7L)
      else assert(r.getAs[Long]("k_hashes") == 10L)
    }
    rows.groupBy(_.getAs[String]("event_type")).values.foreach { g =>
      val byFpp = g.map(r => r.getAs[Long]("fpp_e6") -> r.getAs[Long]("m_bits")).toMap
      assert(byFpp(1000L) > byFpp(10000L), "tighter fpp needs more bits")
    }
  }

  test("stat_spearman_bylang: nested floor-div rational matches a driver-side replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"lang".as[String], $"doc_id".as[Long], $"n_chars".as[Long],
              size(split($"text", " ")).cast("long").as[Long]).collect()
    val expect = docs.groupBy(_._1).flatMap { case (lang, xs) =>
      val n = xs.length.toLong
      if (n <= 1) None else {
        val rx = xs.sortBy(t => (t._3, t._2)).zipWithIndex.map { case (t, i) => t._2 -> (i + 1L) }.toMap
        val ry = xs.sortBy(t => (t._4, t._2)).zipWithIndex.map { case (t, i) => t._2 -> (i + 1L) }.toMap
        val sumD2 = xs.map(t => { val d = rx(t._2) - ry(t._2); d * d }).sum
        Some(lang -> (n, sumD2,
          1000000L - ((6L * sumD2 * 1000L) / (n * (n + 1L))) * 1000L / (n - 1L)))
      }
    }
    val rows = operators.StatSketchOps.queries("stat_spearman_bylang")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sumD2, rho) = expect(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("sum_d2") == sumD2)
      assert(r.getAs[Long]("rho_e6") == rho)
      assert(rho <= 1000000L && rho >= -1100000L, "rho_e6 in [-1, 1] up to floor slack")
    }
  }

  test("a_gini_by_type: exact rank-sum Gini replays and is bounded") {
    import spark.implicits._
    val spend = Tables.events(spark, sf)
      .select($"event_type".as[String], $"user_id".as[Long],
              floor($"value" * 100 + 0.5).cast("long").as[Long]).collect()
      .groupBy(t => (t._1, t._2)).map { case (k, xs) => k -> xs.map(_._3).sum }
    val rows = operators.EventOps.queries("a_gini_by_type")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = spend.collect { case ((t, u), x) if t == et => (x, u) }.toSeq.sorted
      val n = xs.length.toLong
      val s = xs.map(_._1).sum
      val sumIx = xs.zipWithIndex.map { case ((x, _), i) => (i + 1L) * x }.sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("total_cents") == s)
      val gini = ((2L * sumIx - (n + 1L) * s) * 1000000L) / (n * s)
      assert(r.getAs[Long]("gini_e6") == gini)
      assert(gini >= 0L && gini < 1000000L)
    }
  }

  test("retrieval_ql_dirichlet: top-5 matches a driver-side query-likelihood replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }
    val lens = toks.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val cTot = lens.values.sum
    val queries = Seq(1 -> "spark hash join", 2 -> "table scan fast", 3 -> "sort merge batch")
    val cf = toks.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val expect = queries.flatMap { case (qid, qtext) =>
      val qts = qtext.split(" ").toSeq
      val scored = toks.flatMap { case (id, ts) =>
        val tf = ts.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
        val matched = qts.filter(tf.contains)
        if (matched.isEmpty) None else {
          val s1 = matched.map(t =>
            math.floor(math.log(1.0 + (tf(t) * cTot).toDouble / (100L * cf(t)).toDouble) * 1e6 + 0.5).toLong).sum
          val s2 = qts.length *
            math.floor(math.log(100.0 / (lens(id) + 100L).toDouble) * 1e6 + 0.5).toLong
          Some((id, s1 + s2))
        }
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, s) }
    }
    val rows = operators.LexicalOps.queries("retrieval_ql_dirichlet")(spark, sf).collect()
      .map(r => (r.getAs[Int]("qid"), r.getAs[Int]("rank"),
                 r.getAs[Long]("doc_id"), r.getAs[Long]("score_e6"))).toSeq
    assert(rows == expect, s"QL replay mismatch:\n got    $rows\n expect $expect")
  }

  test("ml_decision_stump: per-dim best stump matches a brute-force replay") {
    import spark.implicits._
    val data = Tables.embeddings(spark, sf)
      .select($"vec_id".as[Long], $"label".as[Int],
              $"embedding".as[Array[Float]]).collect()
    val rows = operators.RetrievalOps.queries("ml_decision_stump")(spark, sf).collect()
    assert(rows.length == 8)
    (1 to 8).zip(rows).foreach { case (dim, r) =>
      assert(r.getAs[Long]("dim") == dim.toLong)
      val xs = data.map(t => (t._3(dim - 1).toDouble, t._1, if (t._2 >= 5) 1L else 0L))
        .sortBy(t => (t._1, t._2))
      val n = xs.length.toLong
      val pos = xs.map(_._3).sum
      // brute force every realizable cut, both polarities
      var cum = 0L
      val cands = xs.zipWithIndex.flatMap { case ((x, _, y), i0) =>
        cum += y
        val i = i0 + 1L
        if (i0 + 1 < xs.length && xs(i0 + 1)._1 == x) None
        else {
          val errA = 2L * cum - i + (n - pos)
          val err = math.min(errA, n - errA)
          val pol = if (errA <= n - errA) 1L else 0L
          Some((err, math.floor(x * 1e6 + 0.5).toLong, pol))
        }
      }
      val best = cands.min
      assert(r.getAs[Long]("n_errors") == best._1, s"err mismatch at dim $dim")
      assert(r.getAs[Long]("thr_e6") == best._2, s"thr mismatch at dim $dim")
      assert(r.getAs[Long]("polarity") == best._3, s"pol mismatch at dim $dim")
      assert(r.getAs[Long]("acc_e6") == (n - best._1) * 1000000L / n)
      // a stump can always do no worse than the majority class
      assert(best._1 <= math.min(pos, n - pos))
    }
  }

  test("ts_max_drawdown: drawdown matches a driver-side running-peak replay") {
    import spark.implicits._
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("HOUR", $"ts").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .select($"event_type".as[String], $"hour".as[java.sql.Timestamp], $"cnt".as[Long])
      .collect()
    val rows = operators.TimeSeriesOps.queries("ts_max_drawdown")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = hourly.filter(_._1 == et).sortBy(_._2.getTime)
      var peak = Long.MinValue
      var best = (Long.MinValue, 0L, 0L) // (dd, hourMs, peak) — first max wins
      series.foreach { case (_, h, c) =>
        peak = math.max(peak, c)
        val dd = peak - c
        if (dd > best._1) best = (dd, h.getTime, peak)
      }
      assert(r.getAs[Long]("n_hours") == series.length.toLong)
      assert(r.getAs[Long]("max_drawdown") == best._1, s"dd mismatch for $et")
      assert(r.getAs[java.sql.Timestamp]("at_hour").getTime == best._2)
      assert(r.getAs[Long]("peak_before") == best._3)
      assert(best._1 >= 0)
    }
  }

  test("ta_term_burstiness: Fano factors replay and content terms out-burst function terms") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val n = texts.length.toLong
    val tf = texts.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (tok, xs) => (tok, id, xs.length.toLong) } }
    val stats = tf.groupBy(_._1).map { case (tok, xs) =>
      tok -> (xs.length.toLong, xs.map(_._3).sum, xs.map(x => x._3 * x._3).sum) }
    val rows = operators.TextAnalysisOps.queries("ta_term_burstiness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (df, cf, ss) = stats(r.getAs[String]("tok"))
      assert(r.getAs[Long]("df") == df && r.getAs[Long]("cf") == cf)
      assert(r.getAs[Long]("fano_e6") ==
        ((n * ss - cf * cf) * 1000000L) / ((n - 1L) * cf))
    }
    // the ranking is the true Fano descent
    val expect = stats.toSeq.map { case (tok, (_, cf, ss)) =>
      tok -> ((n * ss - cf * cf) * 1000000L) / ((n - 1L) * cf) }
      .sortBy { case (tok, f) => (-f, tok) }.take(20)
    assert(rows.map(_.getAs[String]("tok")).toSeq == expect.map(_._1))
  }

  test("stat_runs_test: run counts and moments match a driver-side scan") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"event_type".as[String], $"ts".as[java.sql.Timestamp],
              $"event_id".as[Long], floor($"value" * 100 + 0.5).cast("long").as[Long])
      .collect()
    val rows = operators.StatSketchOps.queries("stat_runs_test")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = ev.filter(_._1 == et).sortBy(t => (t._2.getTime, t._3))
      val n = xs.length.toLong
      val s = xs.map(_._4).sum
      val signs = xs.map(t => if (t._4 * n > s) 1L else 0L)
      val runs = 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      val n1 = signs.sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("runs") == runs, s"runs mismatch for $et")
      assert(r.getAs[Long]("n_above") == n1)
      assert(r.getAs[Long]("mu_e6") == (2L * n1 * (n - n1) * 1000000L) / n + 1000000L)
      // z² sanity: a random stream shouldn't produce |z| > 6
      assert(math.abs(r.getAs[Long]("z2_signed_e6")) <= 36L * 1000000L)
    }
  }

  test("ta_keyword_rake: phrases are stopword-free and the top score replays") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"text".as[String]).collect()
    val tf = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val stop = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(5).map(_._1).toSet
    assert(stop.size == 5, "top-5 frequency stoplist")
    // driver-side RAKE replay
    val phrases = texts.flatMap { tx =>
      val toks = tx.split(" ").filter(_.nonEmpty)
      val out = scala.collection.mutable.Buffer[Vector[String]]()
      var cur = Vector.empty[String]
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) out += cur; cur = Vector.empty }
        else cur :+= t
      }
      if (cur.nonEmpty) out += cur
      out
    }
    val freq = phrases.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val deg = phrases.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val wsE6 = freq.map { case (t, f) => t -> deg(t) * 1000000L / f }
    val scored = phrases.map(p => p.mkString(" ") -> p.map(wsE6).sum)
    val byPhrase = scored.groupBy(_._1).map { case (p, xs) => p -> (xs.head._2, xs.length.toLong) }
    val expectTop = byPhrase.toSeq.sortBy { case (p, (s, _)) => (-s, p) }.take(20)
    val rows = operators.TextAnalysisOps.queries("ta_keyword_rake")(spark, sf).collect()
    assert(rows.length == expectTop.length)
    rows.zip(expectTop).foreach { case (r, (p, (s, nOcc))) =>
      assert(r.getAs[String]("phrase") == p)
      assert(r.getAs[Long]("score_e6") == s)
      assert(r.getAs[Long]("n_occ") == nOcc)
      assert(r.getAs[String]("phrase").split(" ").forall(t => !stop(t)))
    }
  }
}
