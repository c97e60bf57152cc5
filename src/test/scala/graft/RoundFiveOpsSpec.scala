package graft

import org.apache.spark.sql.functions._

/** Targeted properties for the round-5 operators (each also runs under
  * the CountSweep/PlanInvariants sweeps and the DuckDB oracle gate). */
class RoundFiveOpsSpec extends SparkSpec {

  test("curate_nb_langid: census covers exactly the test split; signal-free corpus collapses to the prior") {
    import spark.implicits._
    val cm = operators.CurationOps.queries("curate_nb_langid")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).filter($"text".isNotNull)
    val nTest = docs.filter(functions.TextMetrics.hashBps($"doc_id") >= 8000).count()
    assert(cm.map(_.getLong(2)).sum == nTest, "every test doc is classified exactly once")
    // the synthetic corpus draws all languages from one vocabulary, so a
    // correctly-trained NB must predict the majority training class for
    // every doc — the honest no-signal outcome, asserted not hoped
    val majority = docs
      .filter(functions.TextMetrics.hashBps($"doc_id") < 8000)
      .groupBy($"lang").count().orderBy(desc("count"), $"lang")
      .head.getString(0)
    assert(cm.forall(_.getString(1) == majority),
      s"expected all predictions = training-majority class '$majority'")
  }

  test("retrieval_knn_label_eval: probe census is complete and bounded") {
    import spark.implicits._
    val rows = operators.RetrievalOps.queries("retrieval_knn_label_eval")(spark, sf).collect()
    val nProbes = Tables.embeddings(spark, sf).filter($"vec_id" < 50).count()
    assert(rows.map(_.getLong(1)).sum == nProbes, "every probe voted exactly once")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("a_cooccurrence_types: pair support <= each type's own user support") {
    import spark.implicits._
    val pairs = operators.EventOps.queries("a_cooccurrence_types")(spark, sf).collect()
    assert(pairs.nonEmpty)
    val perType = Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct()
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    pairs.foreach { r =>
      assert(r.getString(0) < r.getString(1), "unordered pairs, canonical order")
      assert(r.getLong(2) <= math.min(perType(r.getString(0)), perType(r.getString(1))))
    }
  }

  test("ta_zipf_slope: slope is negative and matches a driver-side replay") {
    import spark.implicits._
    val row = operators.TextAnalysisOps.queries("ta_zipf_slope")(spark, sf).head
    val (n, slope) = (row.getLong(0), row.getDouble(1))
    assert(n > 10 && slope < 0.0, s"n=$n slope=$slope")
    // replay: exact integer regression sums over the same e6 logs
    val freqs = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select(explode(split($"text", " ")).as("w")).filter($"w" =!= "")
      .groupBy($"w").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, f) => (-f, w) }.take(1000)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.floor(math.log(i + 1.0) * 1e6 + 0.5).toLong,
       math.floor(math.log(f.toDouble) * 1e6 + 0.5).toLong)
    }
    val nn = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val expect = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(math.abs(slope - expect) < 1e-6, s"$slope vs $expect")
  }

  test("BloomAgg: zero false negatives; false-positive rate near theory; bloom semi join == plain semi join") {
    import spark.implicits._
    val numBits = 1 << 14; val numHashes = 5
    val keys = spark.range(0, 1000).select($"id")
    val (h1, h2) = functions.BloomFns.keyHashes($"id")
    val bloom = keys.select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
      .select(new functions.BloomAgg(numBits, numHashes).toColumn.name("bloom"))
    val probes = spark.range(0, 100000)
      .crossJoin(broadcast(bloom))
      .filter(functions.BloomFns.mightContain("bloom", "id", numBits, numHashes))
    // all 1000 real keys must pass (bloom filters never false-negative)
    assert(probes.filter($"id" < 1000).count() == 1000)
    // fp rate at 16.4 bits/key, k=5: theory ~0.6%; allow generous slack
    val fp = probes.filter($"id" >= 1000).count().toDouble / 99000.0
    assert(fp < 0.03, s"false-positive rate $fp")
    // the registered query is plan-only sugar over the exact semi join
    val bloomQ = operators.CatalogOps.queries("j_bloom_prefilter_semi")(spark, sf).collect()
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).filter($"c_mktsegment" === "BUILDING"),
            $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"o_orderpriority").collect()
    assert(bloomQ.toSeq == plain.toSeq)
  }

  test("streaming_stream_stream_join: drained pair rollup equals the batch interval join") {
    import spark.implicits._
    val got = streaming.StreamingOps.queries("streaming_stream_stream_join")(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("cts"), $"event_id".as("cid"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"), $"value")
    val want = c.join(p, $"user_id" === $"pu" &&
        $"pts" >= $"cts" && $"pts" <= $"cts" + expr("interval 1 hour"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"), countDistinct($"cid").as("n_clicks_attributed"),
           round(sum($"value"), 2).as("attributed_value"))
      .orderBy($"user_id").collect()
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("j_skew_salted_join: equals the unsalted join; salts genuinely spread a hot key") {
    import spark.implicits._
    val got = operators.EventOps.queries("j_skew_salted_join")(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val su = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val want = ev.join(su, "user_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(when($"ts" >= $"signup_ts", 1).otherwise(0)).as("n_after_signup"))
      .orderBy($"event_type").collect()
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // the hottest user's rows must land under >1 salt (the whole point)
    val hot = ev.groupBy($"user_id").count().orderBy(desc("count")).head.getLong(0)
    val nSalts = ev.filter($"user_id" === hot)
      .select(pmod(xxhash64($"event_id"), lit(8))).distinct().count()
    assert(nSalts > 1, s"hot user $hot hit only $nSalts salt(s)")
  }

  test("a_regr_slope_by_lang: slope/intercept match a driver-side closed-form fit") {
    import spark.implicits._
    val got = operators.TextAnalysisOps.queries("a_regr_slope_by_lang")(spark, sf).collect()
    assert(got.nonEmpty)
    val pts = Tables.documents(spark, sf).filter($"text".isNotNull)
      .select($"lang", $"n_chars", size(split($"text", " ")).cast("long").as("y"))
      .collect().groupBy(_.getString(0))
    got.foreach { r =>
      val g = pts(r.getString(0))
      val n = g.length.toDouble
      val (sx, sy) = (g.map(_.getLong(1)).sum.toDouble, g.map(_.getLong(2)).sum.toDouble)
      val sxy = g.map(x => x.getLong(1) * x.getLong(2)).sum.toDouble
      val sxx = g.map(x => x.getLong(1) * x.getLong(1)).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getLong(1) == g.length)
      assert(math.abs(r.getDouble(2) - slope) < 1e-5, s"${r.getString(0)}: ${r.getDouble(2)} vs $slope")
    }
  }

  test("s_partitioned_sink_prune: the lang predicate prunes partitions in the plan") {
    val df = sources.FileSources.queries("s_partitioned_sink_prune")(spark, sf)
    assert(df.count() == 2)
    // re-read the sink and check the filter lands in PartitionFilters,
    // not as a post-scan row filter
    val plan = spark.read.parquet("target/graft_file_fixtures/out_docs_partitioned")
      .filter(col("lang").isin("en", "fr"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [lang"), plan.take(600))
  }
}
