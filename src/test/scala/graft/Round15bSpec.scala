package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Round-15 session-2 pins: the dense cap-binding fixture (geometry,
  * mining invariants, deterministic demotion, gate-data audit), the
  * two new iterative convergence books (exact driver replays of the
  * logreg GD and PCA power rounds), and the gap-bounded skip-gram
  * sequential miner (brute-force replay on real gate data). */
class Round15bSpec extends SparkSpec {

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private case class Pt(id: Long, x: Long, y: Long)

  private def fixture: Seq[Pt] =
    operators.GeoOps.denseFixtureRows.map { case (i, x, y) => Pt(i, x, y) }

  private def inEps(a: Pt, b: Pt): Boolean = {
    val (dx, dy) = (a.x - b.x, a.y - b.y)
    dx * dx + dy * dy <= 9000000L
  }

  // ---------------------------------------------------------------
  // dense fixture
  // ---------------------------------------------------------------

  test("dense fixture: geometry and mining invariants hold") {
    val pts = fixture
    assert(pts.size == 75)
    assert(pts.map(_.id).distinct.size == 75)
    assert(pts.forall(_.id >= 90000000L)) // disjoint from every SF's users
    val sites = pts.take(3)
    val fillers = pts.drop(3)
    // the three site points are mutually within ε (exact cores)
    for (a <- sites; b <- sites if a.id != b.id) assert(inEps(a, b))
    // every filler is OUT of ε of every site point
    for (f <- fillers; s <- sites) assert(!inEps(f, s))
    // mined rank keys: fillers own the cap's rep slots, sites never do
    assert(fillers.forall(f => md5hex(f.id.toString + ":cap") < "0008"))
    assert(sites.forall(s => md5hex(s.id.toString + ":cap") > "fff8"))
    // 8 fillers in each cell of the site's 3×3 neighborhood at pitch ε
    val byCell = fillers.groupBy(p => (p.x / 3000, p.y / 3000))
    val cells = for (cx <- 10L to 12L; cy <- 10L to 12L) yield (cx, cy)
    assert(byCell.keySet == cells.toSet)
    assert(byCell.values.forall(_.size == 8))
    // all sites live in the center cell
    assert(sites.forall(s => s.x / 3000 == 11 && s.y / 3000 == 11))
  }

  /** Brute-force capped/uncapped census over an arbitrary point set —
    * per-cell md5-ranked reps, 3×3 probe, exact ε filter. */
  private def censusReplay(pts: Seq[Pt], pitch: Long, cap: Option[Int])
      : Map[Long, (Long, String)] = {
    val byCell = pts.groupBy(p => (p.x / pitch, p.y / pitch))
    val reps = cap.fold(byCell) { k =>
      byCell.view.mapValues(_.sortBy(p =>
        (md5hex(p.id.toString + ":cap"), p.id)).take(k)).toMap
    }
    val cand: Map[Long, Seq[Long]] = pts.map { p =>
      val (cx, cy) = (p.x / pitch, p.y / pitch)
      val cs = for {
        dx <- -1 to 1; dy <- -1 to 1
        q <- reps.getOrElse((cx + dx, cy + dy), Seq.empty)
        if q.id != p.id && inEps(p, q)
      } yield q.id
      p.id -> cs
    }.toMap
    val counts = cand.view.mapValues(_.size.toLong).toMap
    val cores = pts.map(_.id).filter(counts(_) >= 2).toSet
    pts.map { p =>
      val cls =
        if (cores(p.id)) "core"
        else if (cand(p.id).exists(cores)) "border"
        else "noise"
      p.id -> ((counts(p.id), cls))
    }.toMap
  }

  private def fixtureDf: DataFrame = {
    import spark.implicits._
    operators.GeoOps.denseFixtureRows.toDF("user_id", "xi", "yi")
  }

  test("dense fixture alone: cap demotes exactly the 3 site cores, " +
       "Spark census == brute-force replay both ways") {
    val pts = fixture
    for ((pitch, cap) <- Seq((4096L, None), (3000L, Option(8)))) {
      val want = censusReplay(pts, pitch, cap)
      val got = operators.GeoOps.censusFromPoints(fixtureDf, pitch, cap)
        .collect().map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_within_r"), r.getAs[String]("cls")))).toMap
      assert(got == want, s"pitch=$pitch cap=$cap")
    }
    val ex = censusReplay(pts, 4096L, None)
    val cp = censusReplay(pts, 3000L, Some(8))
    val sites = pts.take(3).map(_.id)
    // exact: sites are cores (mutual ε-neighbors)
    assert(sites.forall(ex(_)._2 == "core"))
    // capped: every rep in range is an out-of-ε filler → count 0, noise
    assert(sites.forall(s => cp(s) == ((0L, "noise"))))
    // nothing else moves: fillers stay cores in both forms
    val others = pts.drop(3).map(_.id)
    assert(others.forall(i => ex(i)._2 == cp(i)._2))
  }

  test("dense fixture labels: capped clusters are contained in exact " +
       "clusters; demoted sites carry -1") {
    val lex = operators.GeoOps.labelFromPoints(fixtureDf, 4096L, None)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("cls"), r.getAs[Long]("cluster")))).toMap
    val lcp = operators.GeoOps.labelFromPoints(fixtureDf, 3000L, Some(8))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("cls"), r.getAs[Long]("cluster")))).toMap
    val sites = fixture.take(3).map(_.id)
    // exact: the site is its own cluster labeled by its min id
    assert(sites.forall(s => lex(s) == (("core", sites.min))))
    // capped: demoted to noise with the typed sentinel
    assert(sites.forall(s => lcp(s) == (("noise", -1L))))
    // containment: each capped non-noise cluster maps into exactly one
    // exact cluster (capped cores ⊆ exact cores, capped edges ⊆ exact)
    val byCapCluster = lcp.toSeq.filter(_._2._2 >= 0).groupBy(_._2._2)
    for ((_, members) <- byCapCluster) {
      val exactClusters = members.map { case (id, _) => lex(id)._2 }.toSet
      assert(exactClusters.size == 1)
    }
  }

  test("dense agreement audits at sf0.001: demotion count and " +
       "demote-only direction are gate-visible") {
    val cen = SparkEntry.queries("geo_dbscan_census_agreement_dense")(spark, sf)
      .collect().head
    assert(cen.getAs[Long]("n_core_to_noise") == 3L)
    assert(cen.getAs[Long]("n_upgraded") == 0L)
    assert(cen.getAs[Long]("agreement_e6") < 1000000L)
    val lbl = SparkEntry.queries("geo_dbscan_label_agreement_dense")(spark, sf)
      .collect().head
    assert(lbl.getAs[Long]("cls_agreement_e6") < 1000000L)
    assert(lbl.getAs[Long]("n_core_exact") - lbl.getAs[Long]("n_core_capped") == 3L)
  }

  // ---------------------------------------------------------------
  // iterative convergence books
  // ---------------------------------------------------------------

  test("logisticGdBooks: exact driver replay of all three rounds") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1, Seq(0.5, -1.25, 2.0)),
      (2L, 0, Seq(-0.75, 0.5, -1.0)),
      (3L, 1, Seq(1.5, 0.25, 0.125)),
      (4L, 0, Seq(-2.0, 1.0, 0.5)),
      (5L, 1, Seq(0.25, -0.5, 1.75)),
      (6L, 0, Seq(-1.0, -0.25, -0.375)))
    val df = rows.toDF("vec_id", "y", "embedding")
    val got = graft.api.Graft
      .logisticGdBooks(df, "vec_id", "y", "embedding", steps = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("l1_dw_e6"),
                 r.getAs[Long]("max_dw_e6"), r.getAs[Long]("n_correct"),
                 r.getAs[Long]("n_rows"), r.getAs[Long]("acc_e6")))

    // driver replay with the identical arithmetic
    val n = rows.size
    val xe = rows.map { case (_, y, v) =>
      (y, v.map(x => math.floor(x * 1e6 + 0.5).toLong))
    }
    val d = 3
    var w = Vector.fill(d)(0L)
    val want = (1 to 3).map { t =>
      val rr = xe.map { case (y, v) =>
        val mq = v.zip(w).map { case (a, b) => a * b }.sum
        1.0 / (1.0 + math.exp(-(mq / 1e12))) - y
      }
      val wNext = (0 until d).map { j =>
        val gq = xe.zip(rr).map { case ((_, v), r) =>
          math.floor(r * v(j) + 0.5).toLong
        }.sum
        w(j) - math.floor(gq.toDouble / n + 0.5).toLong
      }.toVector
      val l1 = wNext.zip(w).map { case (a, b) => math.abs(a - b) }.sum
      val mx = wNext.zip(w).map { case (a, b) => math.abs(a - b) }.max
      val nCorrect = xe.count { case (y, v) =>
        val mq = v.zip(wNext).map { case (a, b) => a * b }.sum
        (mq > 0) == (y == 1)
      }
      w = wNext
      (t.toLong, l1, mx, nCorrect.toLong, n.toLong,
       nCorrect.toLong * 1000000L / n)
    }
    assert(got.toSeq == want)
  }

  test("pcaPowerBooks: exact driver replay of all three rounds") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0, 0.5, -0.25)),
      (2L, Seq(0.75, -0.5, 0.5)),
      (3L, Seq(-0.5, 1.25, 0.125)),
      (4L, Seq(0.25, 0.75, -1.0)),
      (5L, Seq(-1.25, 0.25, 0.625)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.api.Graft
      .pcaPowerBooks(df, "vec_id", "embedding", iters = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("l1_dv_e6"),
                 r.getAs[Long]("max_dv_e6"), r.getAs[Long]("ws2")))

    val n = vecs.size
    val d = 3
    // the identical quantization ladder, in driver Scala
    val x = vecs.map(_._2.map(v => math.floor(v * 1e6 + 0.5) / 1e6))
    val m = (0 until d).map { i =>
      x.map(r => math.floor(r(i) * 1e6 + 0.5).toLong).sum / 1e6 / n
    }
    val c = x.map(r => (0 until d).map(i => r(i) - m(i)))
    val cov = Array.tabulate(d, d) { (i, j) =>
      val cq = c.map(r => math.floor(r(i) * r(j) * 1e9 + 0.5).toLong).sum
      math.floor(cq.toDouble / n).toLong
    }
    var v = Vector.fill(d)(math.floor(1e6 / math.sqrt(d.toDouble)).toLong)
    val want = (1 to 3).map { t =>
      val w = (0 until d).map(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum).toVector
      val ws2 = w.map(wi => math.floor(wi.toDouble / 1e8).toLong)
        .map(q => q * q).sum
      val vNext = w.map(wi =>
        math.floor(wi / (math.sqrt(ws2.toDouble) * 1e8) * 1e6 + 0.5).toLong)
      val l1 = vNext.zip(v).map { case (a, b) => math.abs(a - b) }.sum
      val mx = vNext.zip(v).map { case (a, b) => math.abs(a - b) }.max
      v = vNext
      (t.toLong, l1, mx, ws2)
    }
    assert(got.toSeq == want)
  }

  test("graph_label_prop_churn: brute-force replay of both rounds " +
       "on sf0.001") {
    // support-2 co-purchase edges + brand seeds, collected once
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.toSeq.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val brand = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val verts = adj.keySet
    var lbl: Map[Long, String] = verts.map(v => v -> brand(v)).toMap
    val books = (1 to 2).map { t =>
      val next = verts.map { v =>
        val cnt = adj(v).map(lbl).groupBy(identity)
          .view.mapValues(_.size).toMap
        v -> cnt.toSeq.map { case (l, c) => (-c, l) }.min._2
      }.toMap
      val changed = verts.count(v => next(v) != lbl(v))
      val row = (t.toLong, verts.size.toLong, changed.toLong,
                 next.values.toSet.size.toLong)
      lbl = next
      row
    }
    val got = SparkEntry.queries("graph_label_prop_churn")(spark, sf)
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_nodes"),
                 r.getAs[Long]("n_changed"), r.getAs[Long]("n_labels")))
    assert(got.toSeq == books)
  }

  test("v_ivf_lloyd_churn: pinned chain == unpinned chain row-for-row, " +
       "final generation == the shipped quantizer's lists") {
    val c = operators.RetrievalOps.corpusMat(spark, sf)
    val pinnedA = operators.RetrievalOps.ivfLloydChain(c, pinned = true)._1
    val plainA = operators.RetrievalOps.ivfLloydChain(c, pinned = false)._1
    def rows(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("g"))).toSet
    for (t <- 0 to 3)
      assert(rows(pinnedA(t)) == rows(plainA(t)), s"generation $t")
    // the final generation the books grade IS the shipped quantizer's
    // inverted-list census (the one-authoring-path claim, on data)
    val a3census = pinnedA(3).groupBy(col("g")).count().collect()
      .map(r => r.getAs[Long]("g") -> r.getAs[Long]("count")).toMap
    val listsCensus = SparkEntry.queries("v_ivf_balance_audit")(spark, sf)
      .collect().map(r => r.getAs[Long]("g") -> r.getAs[Long]("n_vectors")).toMap
    assert(a3census == listsCensus)
    // registered books: 3 rounds, full corpus, K = 8 lists per round
    val churn = SparkEntry.queries("v_ivf_lloyd_churn")(spark, sf)
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_vecs"),
                 r.getAs[Long]("n_reassigned"), r.getAs[Long]("n_lists")))
    val nCorpus = Tables.embeddings(spark, sf).count()
    assert(churn.length == 3)
    assert(churn.forall(b => b._2 == nCorpus && b._4 == 8L))
  }

  // ---------------------------------------------------------------
  // skip-gram sequential patterns
  // ---------------------------------------------------------------

  test("e_seq_skipgram: brute-force replay on sf0.001 events") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
                 r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    // sessionize: 30-min gap cut on the (ts, event_id) order per user
    val occ = mutable.ArrayBuffer[((String, String), (Long, Long), Int)]()
    for ((_, evs) <- events.groupBy(_._1)) {
      val sorted = evs.sortBy(e => (e._2, e._3))
      var sid = 0L
      var prev = Long.MinValue
      val withSid = sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 1800000000L) sid += 1
        prev = e._2
        (e._1, sid, e._4)
      }
      val bySess = withSid.groupBy(x => (x._1, x._2))
      for ((k, ses) <- bySess; i <- ses.indices;
           g <- 1 to 3 if i + g < ses.size)
        occ += (((ses(i)._3, ses(i + g)._3), (k._1, k._2), g))
    }
    val want = occ.groupBy(_._1).map { case (k, os) =>
      k -> ((os.size.toLong, os.count(_._3 == 1).toLong,
             os.map(_._2).distinct.size.toLong))
    }
    val got = SparkEntry.queries("e_seq_skipgram")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("t_from"), r.getAs[String]("t_to")) ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_adjacent"),
          r.getAs[Long]("n_sessions")))).toMap
    assert(got == want)
  }
}
