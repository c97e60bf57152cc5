package graft

import graft.operators.StatSketchOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 3: mergeable-histogram quantile sketch (merge law +
  * rebuild equivalence), winsorize/diversity/streak brute-force
  * oracles, and AQE skew-join plan evidence (VERDICT r6 #7). */
class StatSketchOpsSpec extends SparkSpec {

  private def histQuantiles(hist: DataFrame): DataFrame = {
    // same integer cumulative walk as the operator (kept in sync by the
    // rebuild-equivalence assertion below)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(col("g"))))
    def p(pct: Int) =
      min(when(col("cum") * 100 >= col("total") * pct, col("v"))).cast("long")
    cum.groupBy(col("g").as("event_type"))
      .agg(max(col("total")).as("n_rows"),
           p(25).as("p25_cents"), p(50).as("p50_cents"),
           p(75).as("p75_cents"), p(90).as("p90_cents"))
  }

  test("a_quantile_hist_merge: sketch merge law — quantiles from part-A ⊎ part-B equal the full rebuild") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type").as("g"),
              floor(col("value") * 100 + 0.5).cast("long").as("v"))
    def sketch(df: DataFrame): DataFrame =
      df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("n"))
    // disjoint split on event_id parity — the incremental-ingest shape
    val a = sketch(ev.filter(col("event_id") % 2 === 0))
    val b = sketch(ev.filter(col("event_id") % 2 === 1))
    // MERGE = union + re-sum: the only operation an incremental
    // maintainer needs (counts are additive; nothing is approximate)
    val merged = a.union(b).groupBy(col("g"), col("v"))
      .agg(sum(col("n")).as("n"))
    val fromMerged = histQuantiles(merged).orderBy("event_type").collect()
    val fromFull = StatSketchOps.queries("a_quantile_hist_merge")(spark, sf)
      .collect()
    assert(fromFull.nonEmpty)
    assert(fromMerged.map(_.toSeq).toSeq == fromFull.map(_.toSeq).toSeq,
      "merged-sketch quantiles diverge from full rebuild — merge law broken")
  }

  test("a_quantile_hist_merge: percentiles bracket correctly and agree with percentile() on the cents domain") {
    val rows = StatSketchOps.queries("a_quantile_hist_merge")(spark, sf).collect()
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(expr("percentile(CAST(floor(value*100+0.5) AS LONG), 0.5)").as("p50x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (p25, p50, p75, p90) =
        (r.getAs[Long]("p25_cents"), r.getAs[Long]("p50_cents"),
         r.getAs[Long]("p75_cents"), r.getAs[Long]("p90_cents"))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90, s"quantiles out of order: $r")
      // lower-disc p50 is within one discrete step of the interpolated median
      val interp = exact(r.getAs[String]("event_type"))
      assert(p50 <= interp + 1e-9 && p50 >= interp - 100.0,
        s"${r.getString(0)}: disc p50 $p50 vs interpolated $interp")
    }
  }

  test("prep_winsorize: clipped sums match an in-memory winsorization of the same docs") {
    val docs = Tables.documents(spark, sf)
      .filter(col("n_chars").isNotNull)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byLang = docs.groupBy(_._1)
    val expected = byLang.map { case (lang, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.length.toLong
      // min v with 100*cum >= n*pct — identical integer definition
      def pct(p: Int): Long =
        vs.find(v => 100L * vs.count(_ <= v) >= n * p).get
      val (p05, p95) = (pct(5), pct(95))
      val w = vs.map(v => math.min(math.max(v, p05), p95))
      lang -> (n, vs.sum, w.sum, w.max)
    }
    val got = StatSketchOps.queries("prep_winsorize")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, raw, wsum, wmax) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("sum_raw") == raw)
      assert(r.getAs[Long]("sum_winsorized") == wsum,
        s"${r.getString(0)}: winsorized sum ${r.getAs[Long]("sum_winsorized")} != $wsum")
      assert(r.getAs[Long]("max_winsorized") == wmax)
    }
  }

  test("a_simpson_diversity: matches exact rational computation per user") {
    val counts = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).count().collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val expected = counts.groupBy(_._1).collect {
      case (u, rs) if rs.map(_._2).sum > 1 =>
        val nis = rs.map(_._2)
        val n = nis.sum
        val same = nis.map(x => x * (x - 1)).sum
        u -> BigDecimal(1.0 - same.toDouble / (n * (n - 1)).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = StatSketchOps.queries("a_simpson_diversity")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val s = r.getAs[Double]("simpson")
      assert(s >= 0.0 && s < 1.0)
      assert(math.abs(s - expected(r.getAs[Long]("user_id"))) < 1e-9)
    }
    assert(got.length == expected.size)
  }

  test("w_streak_longest: census matches a per-user scan of distinct active days") {
    val days = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val longest = days.groupBy(_._1).map { case (_, rs) =>
      val ds = rs.map(_._2).sorted
      var (best, cur) = (1L, 1L)
      ds.sliding(2).foreach {
        case Array(a, b) => cur = if (b == a + 1) cur + 1 else 1; best = math.max(best, cur)
        case _ =>
      }
      best
    }
    val expected = longest.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val got = StatSketchOps.queries("w_streak_longest")(spark, sf).collect()
      .map(r => r.getAs[Long]("streak_len") -> r.getAs[Long]("n_users")).toMap
    assert(got == expected, s"streak census $got != $expected")
  }

  test("w_rolling_median: matches a driver-side trailing-9 median replay") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("c")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (_, rs) =>
      val sortedRs = rs.sortBy(r => (r._2, r._3))
      sortedRs.indices.map { i =>
        val frame = sortedRs.slice(math.max(0, i - 8), i + 1).map(_._4).sorted
        val n = frame.length
        val med =
          if (n % 2 == 1) frame(n / 2).toDouble
          else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        sortedRs(i)._3 -> med
      }
    }.toMap
    val got = StatSketchOps.queries("w_rolling_median")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("med_cents") == expected(r.getAs[Long]("event_id")),
        s"event ${r.getAs[Long]("event_id")}: median diverges")
    }
  }

  test("a_key_skew_profile: Gini and top-share match an exact driver-side computation") {
    val counts = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id")).count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val expected = counts.groupBy(_._1).map { case (t, rs) =>
      val xs = rs.map(_._2).sorted
      val (n, s) = (xs.length.toLong, xs.sum)
      val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val gini = BigDecimal(2.0 * s1.toDouble / (n * s).toDouble -
          (n + 1).toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> (n, s, math.floor(1000000.0 * xs.max / s + 0.5).toLong, gini)
    }
    val got = StatSketchOps.queries("a_key_skew_profile")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, s, top1, gini) = expected(r.getString(0))
      assert(r.getAs[Long]("n_keys") == n && r.getAs[Long]("n_rows") == s)
      assert(r.getAs[Long]("top1_share_e6") == top1)
      assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-9,
        s"${r.getString(0)}: gini ${r.getAs[Double]("gini")} != $gini")
      assert(gini >= 0.0 && gini < 1.0)
    }
  }

  test("a_rfm_scores: quintiles match an exact ntile replay and digits compose") {
    val per = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n"),
           sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    def ntileOf(ordered: Seq[Long]): Map[Long, Long] = {
      // SQL ntile: first (n mod 5) buckets have ceil(n/5) rows
      val n = ordered.length
      require(n >= 5, "fixture too small for a meaningful quintile test")
      val (big, base) = (n % 5, n / 5)
      ordered.zipWithIndex.map { case (u, i) =>
        val cut = big * (base + 1)
        u -> (if (i < cut) (i / (base + 1) + 1).toLong else ((i - cut) / base + big + 1).toLong)
      }.toMap
    }
    val rExp = ntileOf(per.sortBy(p => (-p._2, p._1)).map(_._1).toSeq)
    val fExp = ntileOf(per.sortBy(p => (-p._3, p._1)).map(_._1).toSeq)
    val mExp = ntileOf(per.sortBy(p => (-p._4, p._1)).map(_._1).toSeq)
    val got = StatSketchOps.queries("a_rfm_scores")(spark, sf).collect()
    assert(got.length == per.length)
    got.foreach { row =>
      val u = row.getAs[Long]("user_id")
      val (r, f, m) = (row.getAs[Long]("r"), row.getAs[Long]("f"), row.getAs[Long]("m"))
      assert(r == rExp(u) && f == fExp(u) && m == mExp(u), s"user $u: ntile replay diverges")
      assert(row.getAs[Long]("rfm") == r * 100 + f * 10 + m)
    }
  }

  test("AQE skew-join: OptimizeSkewedJoin splits the hot partition (plan evidence, result unchanged)") {
    import spark.implicits._
    val confKeys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confKeys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confKeys.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of fact rows share key 0 — one shuffle partition dwarfs the rest
      val fact = spark.range(0, 120000)
        .select((when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000))
          .as("k"), col("id").as(("payload")))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      // NOTE: aggregate on a key OTHER than the join key — if the next
      // operator required the join's hash partitioning, AQE would skip
      // the skew split to avoid an extra exchange (observed; that is
      // the correct trade). With a re-shuffle downstream anyway, the
      // hot partition is free to split.
      val joined = fact.join(dim, "k")
        .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val rows = joined.collect() // materialize → AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition skewed; plan:\n${plan.take(2000)}")
      // semantics unchanged: hot key count is exactly 108000
      val hot = rows.find(_.getAs[String]("name") == "d0").get
      assert(hot.getAs[Long]("n") == 108000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a_hll_cardinality: register sketch merge law — max-merge of disjoint halves equals full rebuild") {
    val ev = Tables.events(spark, sf)
    def regs(df: DataFrame): DataFrame =
      StatSketchOps.hllRegisters(df, col("event_type"), col("user_id"))
    // disjoint split on event_id parity — the per-partition/day shape a
    // 100 TB pipeline persists; MERGE = union + re-max (registers are
    // max-mergeable, nothing is approximate about the merge itself)
    val a = regs(ev.filter(col("event_id") % 2 === 0))
    val b = regs(ev.filter(col("event_id") % 2 === 1))
    val merged = a.union(b).groupBy(col("__k"), col("r"))
      .agg(max(col("m")).as("m"))
      .orderBy(col("__k"), col("r")).collect()
    val full = regs(ev).orderBy(col("__k"), col("r")).collect()
    assert(full.nonEmpty)
    assert(merged.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq,
      "max-merged registers diverge from full rebuild — merge law broken")
  }

  test("a_regr_plane: coefficients replay from exact BigInt Cramer determinants") {
    val got = StatSketchOps.queries("a_regr_plane")(spark, sf).collect()
    assert(got.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).cast("long"),
              dayofweek(col("ts")).cast("long"),
              floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { r =>
      val g = raw.filter(_._1 == r.getString(0))
      val n = BigInt(g.length)
      def S(f: ((String, Long, Long, Long)) => BigInt) = g.map(f).sum
      val (s1, s2, sy) = (S(x => BigInt(x._2)), S(x => BigInt(x._3)), S(x => BigInt(x._4)))
      val s11 = S(x => BigInt(x._2) * x._2); val s12 = S(x => BigInt(x._2) * x._3)
      val s22 = S(x => BigInt(x._3) * x._3); val s1y = S(x => BigInt(x._2) * x._4)
      val s2y = S(x => BigInt(x._3) * x._4)
      def det3(a: BigInt, b: BigInt, c: BigInt, d: BigInt, e: BigInt,
               f: BigInt, gg: BigInt, h: BigInt, i: BigInt) =
        a * (e * i - f * h) - b * (d * i - f * gg) + c * (d * h - e * gg)
      val dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
      val d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
      assert(r.getAs[Long]("n") == g.length)
      assert(math.abs(r.getAs[Double]("b1_per_hour") -
        (BigDecimal(d1) / BigDecimal(dd)).toDouble) < 2e-6,
        s"${r.getString(0)}: b1 diverges from exact Cramer replay")
    }
  }

  test("a_hll_cardinality: estimate is within 20% of exact at this SF") {
    val rows = StatSketchOps.queries("a_hll_cardinality")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) =
        (r.getAs[Double]("hll_est"), r.getAs[Long]("exact_distinct"))
      assert(exact > 0)
      assert(math.abs(est - exact) / exact < 0.20,
        s"${r.getString(0)}: HLL est $est vs exact $exact out of tolerance")
      assert(r.getAs[Long]("v_regs") <= 64)
    }
  }
}
