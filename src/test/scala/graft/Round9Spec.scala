package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: shared cross-query exchanges (co-purchase /
  * dedup memoization), the streaming minhash dedup's eviction state
  * machine, the IVF nprobe recall curve, and the wave-B analytics
  * (waterfill, Kneser-Ney, phrase query, DP histogram, Kaplan-Meier,
  * CUSUM). */
class Round9Spec extends SparkSpec {

  // ---- shared exchanges --------------------------------------------

  test("coPurchasePairs is memoized per (session, dir) and edges derive") {
    val p1 = api.Graft.coPurchasePairs(spark, sf)
    val p2 = api.Graft.coPurchasePairs(spark, sf)
    assert(p1 eq p2, "second call must return the cached checkpoint")
    val pairs = p1.count()
    val e2 = api.Graft.coPurchaseEdges(spark, sf, minSupport = 2).count()
    assert(e2 <= pairs, "support filter can only shrink the edge set")
    // support-1 edges == distinct pair keys (the triangle contract)
    assert(p1.select(col("a"), col("b")).distinct().count() == pairs)
  }

  test("graph queries agree with their pre-memoization edge semantics") {
    // independent rebuild of the support-2 edge set, bypassing the memo
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    val fresh = li.alias("x")
      .join(li.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("a"), col("b"))
    val memo = api.Graft.coPurchaseEdges(spark, sf, minSupport = 2)
    assert(fresh.exceptAll(memo).isEmpty && memo.exceptAll(fresh).isEmpty)
  }

  // ---- streaming minhash dedup -------------------------------------

  test("streaming_minhash_dedup links are a subset of the batch LSH pairs") {
    val stream = SparkEntry.queries("streaming_minhash_dedup")(spark, sf)
      .select(col("a_id"), col("b_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("a_id"), col("b_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the stream emits canon-star links within the retention window,
    // each of which is a band-sharing verified pair — batch LSH finds
    // every band-sharing verified pair
    assert(stream.subsetOf(batch), s"stream-only pairs: ${stream -- batch}")
  }

  test("streaming minhash eviction: an idle band re-seeds, a live band links") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_stream").toString
    val ta = "alpha beta gamma delta epsilon zeta"
    val tb = "omega psi chi phi upsilon tau"
    val docs = Seq(
      (0L, ta), (1L, "one two three four"),
      (200L, "five six seven eight"), (201L, "nine ten eleven twelve"),
      (400L, tb), (401L, "red green blue yellow"),
      (600L, tb), (601L, ta))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("streaming_minhash_dedup")(spark, dir)
      .select(col("a_id"), col("b_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batches (ntile 4 by id): {0,1} {200,201} {400,401} {600,601}.
    // family A (ids 0, 601): gap spans batches 1→4; watermark at batch
    // 3 is max_id(batch 2) − 1 = 200 > 0 + 150 → band evicted, 601
    // re-seeds, NO link. family B (ids 400, 600): batches 3→4, no
    // interior batch → state alive → link (400, 600).
    assert(out.contains((400L, 600L)), s"expected live-band link, got $out")
    assert(!out.exists(p => p._1 == 0L), s"family-A link survived eviction: $out")
  }

  // ---- IVF recall curve --------------------------------------------

  test("ann_nprobe_recall_curve: recall and scanned fraction are monotone") {
    val rows = SparkEntry.queries("ann_nprobe_recall_curve")(spark, sf)
      .orderBy(col("nprobe")).collect()
    assert(rows.length == 4)
    val recalls = rows.map(_.getAs[Long]("recall_e6"))
    val scanned = rows.map(_.getAs[Long]("scanned_e6"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as nprobe grows: ${recalls.toSeq}")
    assert(scanned.zip(scanned.tail).forall { case (a, b) => a < b },
      s"scanned fraction must strictly grow: ${scanned.toSeq}")
    assert(scanned.last <= 1000000L)
  }

  // ---- wave-B analytics --------------------------------------------

  test("curate_mix_waterfill: allocations respect stock, level, and budget") {
    val rows = SparkEntry.queries("curate_mix_waterfill")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("allocated_tokens")).sum
    assert(total <= 100000L, s"allocated $total > budget")
    rows.foreach { r =>
      val (avail, alloc, capped) = (r.getAs[Long]("avail_tokens"),
        r.getAs[Long]("allocated_tokens"), r.getAs[Long]("capped"))
      assert(alloc <= avail)
      if (capped == 1L) assert(alloc == avail, "capped source contributes all")
    }
    val uncapped = rows.filter(_.getAs[Long]("capped") == 0L)
      .map(_.getAs[Long]("allocated_tokens")).distinct
    assert(uncapped.length <= 1, "uncapped sources share one level")
  }

  test("ta_kneser_ney_bigram: probabilities are valid e6 and ranked by count") {
    val rows = SparkEntry.queries("ta_kneser_ney_bigram")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      val p = r.getAs[Long]("pkn_e6")
      assert(p >= 0 && p <= 1000000L, s"pkn_e6 out of range: $p")
    }
    val counts = rows.map(_.getAs[Long]("c2"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("retrieval_phrase_query: every hit contains the phrase verbatim") {
    val hits = SparkEntry.queries("retrieval_phrase_query")(spark, sf).collect()
    assert(hits.forall(_.getAs[Long]("n_occurrences") >= 1))
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val phrases = Map(1 -> "spark hash join", 2 -> "table scan fast",
                      3 -> "sort merge batch")
    hits.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      assert(t.contains(phrases(r.getAs[Int]("qid"))),
        s"doc ${r.getAs[Long]("doc_id")} lacks phrase ${r.getAs[Int]("qid")}")
    }
  }

  test("privacy_dp_histogram: noise bounded by the 48-bit uniform's tails") {
    val rows = SparkEntry.queries("privacy_dp_histogram")(spark, sf).collect()
    rows.foreach { r =>
      val noise = r.getAs[Long]("noise_e2")
      // |ln(2u)| <= ln(2^49) ~ 33.96 -> 3396 centi-units
      assert(math.abs(noise) <= 3500, s"noise out of Laplace range: $noise")
      assert(r.getAs[Long]("noisy_n_e2") ==
        r.getAs[Long]("true_n") * 100 + noise)
    }
  }

  test("a_kaplan_meier: at-risk counts telescope and hazards are valid") {
    val rows = SparkEntry.queries("a_kaplan_meier")(spark, sf)
      .orderBy(col("t")).collect()
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.head.getAs[Long]("n_risk") == nUsers, "everyone at risk at t=0")
    val leaving = rows.map(r =>
      r.getAs[Long]("d_events") + r.getAs[Long]("c_censored"))
    assert(leaving.sum == nUsers)
    // n_risk(t_next) = n_risk(t) - leaving(t) across the grid
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getAs[Long]("n_risk") == a.getAs[Long]("n_risk") -
        a.getAs[Long]("d_events") - a.getAs[Long]("c_censored"))
    }
    rows.foreach { r =>
      val h = r.getAs[Long]("hazard_e6")
      assert(h >= 0 && h <= 1000000L)
    }
  }

  test("stat_cusum_shift: excursions are nonnegative and sum to zero drift") {
    val rows = SparkEntry.queries("stat_cusum_shift")(spark, sf)
      .orderBy(col("day")).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("cusum_pos_scaled") >= 0)
      assert(r.getAs[Long]("cusum_neg_scaled") >= 0)
    }
    // sum of scaled deviations is identically 0, so the last cum is 0
    // and the final positive excursion equals -min(0, prior min) >= 0
    val d = rows.length.toLong
    val t = rows.map(_.getAs[Long]("n")).sum
    assert(rows.map(r => r.getAs[Long]("n") * d - t).sum == 0L)
  }

  test("graph_copurchase_pagerank: ranks are positive and k-bounded") {
    val rows = SparkEntry.queries("graph_copurchase_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall(_.getAs[Double]("rank") > 0))
  }
}
