package graft

import org.apache.spark.sql.functions._

/** Round-12 invariants: the late-arrival monitor's balanced books and
  * dropped-row accounting, the tail-sort rewrite's order/plan contract,
  * and the packed-draw helpers' lockstep with the legacy fragments. */
class Round12Spec extends SparkSpec {

  test("late-arrival monitor: books balance and late rows are dropped") {
    val out = SparkEntry.queries("streaming_late_arrival")(spark, sf)
      .collect().sortBy(_.getAs[Long]("batch_seq"))
    assert(out.length == 5, "4 data batches + the finalize sweep")
    var prevTotal = 0L
    out.foreach { r =>
      val (nin, dropped, nk, ev, tot) = (r.getAs[Long]("n_in"),
        r.getAs[Long]("dropped_late"), r.getAs[Long]("new_keys"),
        r.getAs[Long]("evicted"), r.getAs[Long]("state_rows_total"))
      assert(dropped >= 0 && dropped <= nin)
      assert(nk <= nin - dropped, "a dropped row can never admit")
      assert(tot == prevTotal + nk - ev, "state books must balance per batch")
      assert(tot <= 97L, "key domain bounds the live state")
      prevTotal = tot
    }
    // the fixture plants one lagged row per 89 ids — at every SF at
    // least the epoch row is genuinely late
    assert(out.map(_.getAs[Long]("dropped_late")).sum > 0)
    assert(out.last.getAs[Long]("state_rows_total") == 0L)
    assert(out.map(_.getAs[Long]("evicted")).sum ==
           out.map(_.getAs[Long]("new_keys")).sum)
  }

  test("tail-sort rewrite: no range exchange, identical rows in order") {
    // the session runs with spark.graft.tailSortSinglePartition=true
    // (SparkSpec) — a root orderBy must plan as RoundRobin(1) + local
    // sort, and produce exactly the rows the range sort produced
    val df = SparkEntry.queries("a1_count_by_year")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "root sort must not range-partition under the rewrite")
    val got = df.collect().toSeq
    // flag off: the classic range-sorted plan — rows AND order must be
    // identical (the order-sensitive-consumer safety claim)
    spark.conf.set("spark.graft.tailSortSinglePartition", "false")
    val (exp, expPlan) = try {
      val d = SparkEntry.queries("a1_count_by_year")(spark, sf)
      (d.collect().toSeq, d.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.graft.tailSortSinglePartition", "true")
    assert(expPlan.contains("rangepartitioning"),
      "control plan must still range-partition with the flag off")
    assert(got == exp, "rewrite must preserve rows and their order")
  }

  test("tail-sort rewrite skips tails that already collapse to one partition") {
    // privacy_dp_topk's root sort sits over a filter on an
    // empty-partition window: SinglePartition already satisfies the
    // sort's distribution, so the rule must NOT add a repartition —
    // flag on and off must produce the same physical plan shape
    val on = SparkEntry.queries("privacy_dp_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    spark.conf.set("spark.graft.tailSortSinglePartition", "false")
    val off = try SparkEntry.queries("privacy_dp_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.graft.tailSortSinglePartition", "true")
    def shape(p: String) = (p.sliding("Exchange".length).count(_ == "Exchange"),
      p.contains("rangepartitioning"))
    assert(shape(on) == shape(off),
      "guard must leave already-single-partition tails untouched")
    // while a plain groupBy tail (a1) IS rewritten — pinned by the
    // "tail-sort rewrite" test above
  }

  test("cuped readout: books balance and the adjustment is coherent") {
    val r = SparkEntry.queries("stat_cuped_ab_effect")(spark, sf).collect().head
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == r.getAs[Long]("n"))
    val rho2 = r.getAs[Double]("var_reduction_r6")
    assert(rho2 >= 0.0 && rho2 <= 1.0, "rho^2 must be a valid proportion")
    assert(r.getAs[Long]("srm_chi2_e6") >= 0L)
    // the flag must be exactly the e6-quantized chi-square inequality
    // (at sf0.001's ~15 users the md5 split legitimately trips it;
    // at the gate SFs it reads 0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert((r.getAs[Int]("srm_flag") == 1) ==
      ((na - nb) * (na - nb) * 1000000L > 3841459L * (na + nb)))
  }

  test("packed-draw helpers reproduce the legacy fragments verbatim") {
    // the resampling family's oracles replay these strings in DuckDB —
    // byte-identity is the lockstep contract
    assert(api.Graft.packedDrawHexAt(0, 4, 8) == "substring(h0, 1, 4)")
    assert(api.Graft.packedDrawHexAt(7, 4, 8) == "substring(h0, 29, 4)")
    assert(api.Graft.packedDrawHexAt(8, 4, 8) == "substring(h1, 1, 4)")
    assert(api.Graft.packedDrawHexAt(15, 3, 8) == "substring(h1, 22, 3)")
    assert(api.Graft.packedDrawHexRuntimeB(4, 8) ==
      "substring(CASE WHEN b < 8 THEN h0 ELSE h1 END, (b % 8) * 4 + 1, 4)")
    intercept[IllegalArgumentException] {
      api.Graft.packedDrawHexAt(0, 5, 8) // 40 hex chars > one md5
    }
  }

  test("kll two-key grain claims the contract only at sketchable sizes") {
    val out = SparkEntry.queries("stat_kll_by_type_day")(spark, sf).collect()
    // sf0.001 groups are all below the n >= 32 floor — empty is the
    // CORRECT answer there (the gate exercises the populated grain at
    // sf0.01/sf0.1); whatever rows appear must honor the contract
    assert(out.forall(_.getAs[Long]("n") >= 32L))
    assert(out.forall(_.getAs[Int]("within_rank_5pct") == 1))
  }

  test("t-digest query upholds its tighter 2% contract") {
    val out = SparkEntry.queries("stat_tdigest_quantiles")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("within_rank_2pct") == 1))
  }
}
