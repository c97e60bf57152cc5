package graft

import org.apache.spark.sql.functions._

/** Targeted properties for round-7 operators (each also runs under the
  * DuckDB oracle gate; the batch-A/B/C families have their own suites in
  * RelationalExtOpsSpec / EventOpsSpec / DedupOpsSpec). */
class RoundSevenOpsSpec extends SparkSpec {

  test("ta_readability: counts are conserved and the score is the closed form of the sums") {
    import spark.implicits._
    val rows = operators.TextAnalysisOps.queries("ta_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nNonEmpty = Tables.documents(spark, sf)
      .filter($"text".isNotNull && length(trim($"text")) > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nNonEmpty,
      "every non-empty doc scores in exactly one language group")
    rows.foreach { r =>
      val (w, sen, syl) = (r.getAs[Long]("total_words"),
        r.getAs[Long]("total_sentences"), r.getAs[Long]("total_syllables"))
      assert(w > 0 && sen > 0 && syl > 0)
      val want = 206.835 - 1.015 * (w.toDouble / sen) - 84.6 * (syl.toDouble / w)
      assert(math.abs(r.getAs[Double]("flesch") - want) < 5e-5,
        s"${r.getString(0)}: flesch is not the closed form of the aggregated counts")
      assert(r.getAs[Double]("min_doc_score") <= r.getAs[Double]("max_doc_score"))
    }
  }

  test("retrieval_mmr_rerank: matches a driver-side greedy MMR replay") {
    import spark.implicits._
    val got = operators.RetrievalOps.queries("retrieval_mmr_rerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dotE6(a: Array[Double], b: Array[Double]): Long = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      math.floor(s * 1e6 + 0.5).toLong
    }
    (0L until 5L).foreach { qid =>
      val qv = vecs(qid)
      val cand = vecs.filter(_._1 != qid).toSeq
        .map { case (id, v) => (id, dotE6(qv, v)) }
        .sortBy { case (id, rel) => (-rel, id) }.take(8)
      var selected = List.empty[(Long, Long)] // (id, mmr10)
      (1 to 3).foreach { pos =>
        val rest = cand.filterNot { case (id, _) => selected.exists(_._1 == id) }
        val scoredRest = rest.map { case (id, rel) =>
          val maxSim = if (selected.isEmpty) 0L
            else selected.map(s => dotE6(vecs(id), vecs(s._1))).max
          val mmr = if (selected.isEmpty) rel * 10 else rel * 7 - maxSim * 3
          (id, mmr)
        }
        val pick = scoredRest.minBy { case (id, m) => (-m, id) }
        assert(got((qid, pos.toLong)) == pick,
          s"q$qid pos $pos: got ${got((qid, pos.toLong))}, replay says $pick")
        selected = selected :+ pick
      }
    }
  }

  test("dedup_containment: prefix filtering is complete vs brute force, and asymmetric") {
    import spark.implicits._
    val got = operators.DedupOps.queries("dedup_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force on the driver over every ordered pair (sf0.001 is small)
    val toks = Tables.documents(spark, sf)
      .filter(size(split($"text", " ")) >= 2)
      .select($"doc_id", functions.TextSignatures.wordBigramHashes($"text").as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val want = (for {
      (a, sa) <- toks; (b, sb) <- toks if a != b
      c = (sa & sb).size.toDouble / sa.size if c >= 0.8
    } yield (a, b) -> c).toMap
    assert(got.keySet == want.keySet,
      s"prefix filter missed ${want.keySet -- got.keySet}, extra ${got.keySet -- want.keySet}")
    want.foreach { case (k, c) =>
      assert(math.abs(got(k) - c) < 1e-6, s"$k: ${got(k)} != $c")
    }
    // containment is directional: at least one pair must NOT have its mirror
    if (got.nonEmpty)
      assert(got.keys.exists { case (a, b) => !got.contains((b, a)) } ||
             got.keys.forall { case (a, b) => got.contains((b, a)) })
  }

  test("w_cumulative_share: deciles balance, cents conserve, shares are monotone to 1.0") {
    import spark.implicits._
    val rows = operators.EventOps.queries("w_cumulative_share")(spark, sf)
      .orderBy($"decile").collect()
    assert(rows.length == 10)
    val sizes = rows.map(_.getAs[Long]("n_users"))
    assert(sizes.max - sizes.min <= 1, "ntile must balance group sizes within 1")
    val total = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select(sum(round($"value" * 100).cast("long"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("decile_cents")).sum == total, "value mass conserved")
    val shares = rows.map(_.getAs[Double]("cum_share"))
    shares.sliding(2).foreach { case Array(a, b) => assert(a <= b, "cum share monotone") }
    assert(math.abs(shares.last - 1.0) < 1e-9, "full curve ends at 1.0")
    // ranked descending: the first decile's mean must be >= the last's
    assert(rows.head.getAs[Long]("decile_cents") * sizes.last >=
           rows.last.getAs[Long]("decile_cents") * sizes.head)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("mm_image_phash: census matches a driver-side dHash replay of every doc") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def phash(text: String): Long = {
      val h = md5hex(text)
      val px = (0 until 16).map(i => Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16))
      (for { r <- 0 until 4; c <- 0 until 3 } yield
        if (px(4 * r + c) > px(4 * r + c + 1)) 1L << (3 * r + c) else 0L).sum
    }
    val expected = docs.map { case (id, t) => (phash(t), id) }
      .groupBy(_._1).collect { case (h, rs) if rs.length >= 2 =>
        h -> (rs.length.toLong, rs.map(_._2).min, rs.map(_._2).max)
      }
    val got = operators.MultimodalOps.queries("mm_image_phash")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, "phash census diverges from dHash replay")
    got.keys.foreach(h => assert(h >= 0 && h < 4096, s"phash $h outside 12-bit space"))
  }

  test("mm_scene_cut: cut counts match a driver-side replay of the frame-feature walk") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(docs.nonEmpty)
    val expected = docs.map { case (id, nChars) =>
      val nFrames = nChars / 100 + 1
      val fs = (0L until nFrames).map(fi =>
        java.lang.Long.parseLong(md5hex(s"$id:$fi").substring(0, 4), 16))
      val cuts = fs.sliding(2).zipWithIndex.collect {
        case (Seq(a, b), i) if math.abs(b - a) > 40000 => i + 1L
      }.toSeq
      id -> (nFrames, cuts.length.toLong, cuts.headOption.getOrElse(-1L))
    }.toMap
    val got = operators.MultimodalOps.queries("mm_scene_cut")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, "scene-cut walk diverges from replay")
  }

  test("ta_type_token_ratio: integer sums match a driver-side tokenization; ratio is their quotient") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, rs) =>
      val toks = rs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      lang -> (toks.length.toLong, toks.distinct.length.toLong)
    }
    val got = operators.TextAnalysisOps.queries("ta_type_token_ratio")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, types) = expected(r.getString(0))
      assert(r.getAs[Long]("n_tokens") == n && r.getAs[Long]("n_types") == types,
        s"${r.getString(0)}: token sums diverge")
      assert(math.abs(r.getAs[Double]("ttr") - types.toDouble / n) < 1e-6)
    }
  }

  test("curate_top_p_nucleus: keeps exactly the minimal top-score head covering 90% of chars") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        java.lang.Long.parseLong(md5hex(r.getString(3)).substring(0, 8), 16)))
    val expected = docs.groupBy(_._1).map { case (lang, rs) =>
      val sorted = rs.sortBy(r => (-r._4, r._2))
      val total = sorted.map(_._3).sum
      var cum = 0L
      val kept = sorted.takeWhile { r => val before = cum; cum += r._3; before * 10 < total * 9 }
      lang -> (kept.length.toLong, kept.map(_._3).sum, total)
    }
    val got = operators.CurationOps.queries("curate_top_p_nucleus")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nk, ck, tot) = expected(r.getString(0))
      assert(r.getAs[Long]("n_kept") == nk && r.getAs[Long]("chars_kept") == ck &&
        r.getAs[Long]("total_chars") == tot, s"${r.getString(0)}: nucleus cut diverges")
      // the head covers >= 90% and removing its last doc would drop below
      assert(ck * 10 >= tot * 9)
    }
  }

  test("ta_ngram_novelty: per-lang novel counts sum to the global distinct-trigram count") {
    val got = operators.TextAnalysisOps.queries("ta_ngram_novelty")(spark, sf).collect()
    assert(got.nonEmpty)
    val totalNovel = got.map(_.getAs[Long]("sum_novel")).sum
    val globalDistinct = {
      val docs = Tables.documents(spark, sf)
        .filter(col("text").isNotNull).select(col("text")).collect().map(_.getString(0))
      docs.flatMap { t =>
        val w = t.split(" ", -1)
        if (w.length < 3) Nil
        else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").distinct
      }.distinct.length.toLong
    }
    // every distinct trigram is novel in exactly one doc (its first)
    assert(totalNovel == globalDistinct,
      s"sum(n_novel)=$totalNovel != global distinct trigrams $globalDistinct")
    got.foreach { r =>
      val nv = r.getAs[Double]("novelty")
      assert(nv > 0.0 && nv <= 1.0)
      assert(r.getAs[Long]("sum_novel") <= r.getAs[Long]("sum_tri"))
    }
  }

  test("mm_tile_crops: grid counts and area factorization match per-image geometry") {
    val metas = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), length(col("text")).as("len")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
      .sortBy(_._1).take(200)
    val expected = metas.map { case (id, len) =>
      val (w, h) = (len % 640 + 1, (len * 7) % 480 + 1)
      val xs = 0L.to(w - 1, 48).map(x0 => math.min(x0 + 64, w) - x0)
      val ys = 0L.to(h - 1, 48).map(y0 => math.min(y0 + 64, h) - y0)
      id -> (xs.length.toLong * ys.length, xs.sum * ys.sum,
        (xs.length - 1L) * 48, (ys.length - 1L) * 48)
    }.toMap
    val got = operators.MultimodalOps.queries("mm_tile_crops")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, area, lx, ly) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tiles") == n)
      assert(r.getAs[Long]("sum_area") == area,
        s"doc ${r.getAs[Long]("doc_id")}: Σtile areas must factor as (Σx-spans)·(Σy-spans)")
      assert(r.getAs[Long]("last_x0") == lx && r.getAs[Long]("last_y0") == ly)
    }
  }

  test("mm_audio_chunk_plan: chunks tile [0, dur) with 2s overlaps, no gap, no overrun") {
    import spark.implicits._
    val byDoc = operators.MultimodalOps.queries("mm_audio_chunk_plan")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(byDoc.nonEmpty)
    val durs = Tables.documents(spark, sf)
      .filter($"text".isNotNull && $"n_chars" > 0)
      .select($"doc_id", ($"n_chars" * 50).as("dur")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == durs.keySet, "every nonempty doc gets a plan")
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._3 == 0L, s"doc $doc: first chunk starts at 0")
      sorted.sliding(2).foreach {
        case Array((_, _, s1, e1), (_, _, s2, _)) =>
          assert(s2 == s1 + 28000L, s"doc $doc: stride broken")
          assert(e1 - s2 == 2000L || e1 == durs(doc),
            s"doc $doc: overlap must be 2s (or the tail clamp)")
        case _ =>
      }
      assert(sorted.last._4 == durs(doc), s"doc $doc: last chunk must end at dur")
      sorted.foreach { case (_, _, st, en) =>
        assert(en > st && en - st <= 30000L, s"doc $doc: window bounds")
      }
    }
  }

  test("ta_collocations_pmi: scores replay from independent bigram counts; top-20 is totally ordered") {
    import spark.implicits._
    val got = operators.TextAnalysisOps.queries("ta_collocations_pmi")(spark, sf).collect()
    assert(got.length == 20)
    // independent count replay (driver-side, no Spark expressions shared
    // with the operator)
    val bigrams = Tables.documents(spark, sf)
      .filter($"text".isNotNull).select($"text").collect()
      .map(_.getString(0).split(" ", -1)).filter(_.length >= 2)
      .flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
    val c2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cl = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cr = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = bigrams.length.toLong
    got.foreach { r =>
      val (w1, w2, cnt, pmi) = (r.getString(0), r.getString(1),
        r.getAs[Long]("c2"), r.getAs[Long]("pmi_e6"))
      assert(cnt == c2((w1, w2)), s"count mismatch for ($w1,$w2)")
      assert(cnt >= 5)
      val want = math.floor(math.log(
        cnt.toDouble * n / (cl(w1).toDouble * cr(w2).toDouble)) * 1e6 + 0.5).toLong
      assert(pmi == want, s"pmi mismatch for ($w1,$w2): $pmi vs $want")
    }
    // the emitted order is the total order (desc pmi, w1, w2)
    val keys = got.map(r => (-r.getAs[Long]("pmi_e6"), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted), "top-20 not in the claimed total order")
  }

  test("j_point_in_time: every fact matches exactly one SCD2 version — mass and cents conserved") {
    import spark.implicits._
    val got = operators.EventOps.queries("j_point_in_time")(spark, sf).collect()
    assert(got.nonEmpty)
    val facts = Tables.events(spark, sf)
      .filter($"user_id" < 20 && $"event_type" === "purchase")
      .select($"user_id", floor($"value" * 100 + 0.5).cast("long").as("cents"))
      .collect()
    // exactly-one-match: if any purchase matched 0 or 2+ versions the
    // group sums could not reproduce the raw fact mass
    assert(got.map(_.getAs[Long]("n_purchases")).sum == facts.length,
      "PIT join must match each purchase exactly once")
    assert(got.map(_.getAs[Long]("cents")).sum ==
      facts.map(_.getAs[Long]("cents")).sum, "cents not conserved")
  }

  test("a_chi2_independence: statistic replays from driver-side contingency counts") {
    import spark.implicits._
    val r = operators.StatSketchOps.queries("a_chi2_independence")(spark, sf)
      .collect().head
    val raw = Tables.events(spark, sf)
      .select($"event_type", dayofweek($"ts").cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val cells = raw.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rm = raw.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cm = raw.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = raw.length.toLong
    val chi2e6 = cells.map { case ((t, d), o) =>
      val diff = (o * n - rm(t) * cm(d)).toDouble
      math.floor(diff * diff / (n.toDouble * rm(t) * cm(d)) * 1e6 + 0.5).toLong
    }.sum
    assert(r.getAs[Long]("n_rows") == n)
    assert(r.getAs[Long]("df") == (rm.size - 1L) * (cm.size - 1L))
    assert(math.abs(r.getAs[Double]("chi2") - chi2e6 / 1e6) < 1e-3,
      s"chi2 ${r.getAs[Double]("chi2")} vs replay ${chi2e6 / 1e6}")
  }

  test("w_pct_change_wow: deltas replay from weekly integer totals") {
    import spark.implicits._
    val got = operators.TimeSeriesOps.queries("w_pct_change_wow")(spark, sf).collect()
    assert(got.nonEmpty)
    val weekly = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("week", $"ts").cast("date").as("w"))
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getAs[Long]("c"))
      .toMap
    got.foreach { r =>
      val (t, w) = (r.getString(0), r.getDate(1).toString)
      assert(weekly((t, w)) == r.getAs[Long]("cents"))
      val expect = (r.getAs[Long]("cents") - r.getAs[Long]("prev_cents")).toDouble /
        r.getAs[Long]("prev_cents")
      assert(math.abs(r.getAs[Double]("wow_change") - expect) < 1e-6)
    }
  }

  test("shard_rendezvous: HRW minimal disruption — every moved key moves TO the new shard, ~1/9 move") {
    import spark.implicits._
    // per-doc assignment replay plus the structural property the
    // census can't see: growing 8→9 shards moves keys ONLY onto the
    // new shard (any other move would break HRW's independence)
    def md5w(id: Long, s: Int): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:$s".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val ids = Tables.documents(spark, sf).select($"doc_id").collect().map(_.getLong(0))
    def assign(id: Long, n: Int): Int =
      (0 until n).map(s => (md5w(id, s), -s)).max match { case (_, ns) => -ns }
    val moved = ids.filter(id => assign(id, 9) != assign(id, 8))
    moved.foreach(id => assert(assign(id, 9) == 8,
      s"doc $id moved to shard ${assign(id, 9)} — HRW allows moves only onto the NEW shard"))
    val frac = moved.length.toDouble / ids.length
    assert(frac > 0.02 && frac < 0.25, s"move fraction $frac implausible for 1/9")
    // census agrees with the replay
    val got = operators.LayoutOps.queries("shard_rendezvous")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_moved"))).toMap
    val want = ids.groupBy(id => assign(id, 8).toLong).map { case (s, g) =>
      s -> (g.length.toLong, g.count(id => assign(id, 9) != assign(id, 8)).toLong) }
    assert(got == want, "census diverges from driver HRW replay")
  }

  test("ann_truncated_recall: overlap replays from exact double dots; recall bounded") {
    import spark.implicits._
    val got = operators.RetrievalOps.queries("ann_truncated_recall")(spark, sf).collect()
    assert(got.length == 5)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dotE6(a: Array[Double], b: Array[Double], d: Int): Long = {
      var s = 0.0; var i = 0
      while (i < d) { s += a(i) * b(i); i += 1 }
      math.floor(s * 1e6 + 0.5).toLong
    }
    got.foreach { r =>
      val qid = r.getLong(0)
      val cand = vecs.keys.filter(_ != qid).toSeq
      def top10(d: Int) = cand.map(id => (id, dotE6(vecs(qid), vecs(id), d)))
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val overlap = (top10(64) & top10(32)).size.toLong
      assert(r.getAs[Long]("n_overlap") == overlap, s"q$qid overlap mismatch")
      assert(r.getAs[Double]("recall10") == overlap / 10.0)
    }
  }

  test("graph_label_prop: node mass conserved per round; label set consolidates") {
    val got = operators.GraphOps.queries("graph_label_prop")(spark, sf).collect()
    assert(got.nonEmpty)
    val (n0, n1, n2) = (got.map(_.getAs[Long]("n0")).sum,
      got.map(_.getAs[Long]("n1")).sum, got.map(_.getAs[Long]("n2")).sum)
    assert(n0 == n1 && n1 == n2, s"node mass not conserved: $n0/$n1/$n2")
    val live = (c: String) => got.count(_.getAs[Long](c) > 0)
    assert(live("n1") <= live("n0") && live("n2") <= live("n1"),
      "label propagation must never grow the live label set")
  }

  test("privacy_t_closeness: matches a driver-side exact-integer EMD replay") {
    import spark.implicits._
    val got = operators.LayoutOps.queries("privacy_t_closeness")(spark, sf).collect()
    assert(got.nonEmpty)
    // independent replay from raw rows
    val raw = Tables.documents(spark, sf)
      .select($"lang", $"source", ($"n_chars" / 100).cast("long").as("band"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bands = raw.map(_._3).distinct.sorted
    val m = bands.length.toLong
    val nTotal = raw.length.toLong
    val cumAll = bands.map(b => b -> raw.count(_._3 <= b).toLong).toMap
    got.foreach { r =>
      val (lang, source) = (r.getString(0), r.getString(1))
      val grp = raw.filter(x => x._1 == lang && x._2 == source)
      val nG = grp.length.toLong
      assert(r.getAs[Long]("n") == nG)
      val tNum = bands.map { b =>
        math.abs(grp.count(_._3 <= b).toLong * nTotal - cumAll(b) * nG)
      }.sum
      assert(r.getAs[Long]("t_num") == tNum, s"$lang/$source: t_num mismatch")
      val denom = nG * nTotal * (m - 1)
      val emd = r.getAs[Double]("emd")
      assert(emd >= 0.0 && emd <= 1.0, s"EMD out of range: $r")
      assert(math.abs(emd - tNum.toDouble / denom) < 1e-6)
      // the release gate is the exact integer comparison, not the
      // rounded double
      assert(r.getAs[Int]("close_02") == (if (tNum * 5 <= denom) 1 else 0))
    }
  }
}
