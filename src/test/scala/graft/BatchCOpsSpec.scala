package graft

import org.apache.spark.sql.functions._

/** Properties for the graph/entropy/keyword batch (each also runs under
  * the DuckDB oracle gate). */
class BatchCOpsSpec extends SparkSpec {

  test("graph_triangle_count: matches a driver-side brute-force replay") {
    val row = operators.GraphOps.queries("graph_triangle_count")(spark, sf).collect().head
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val parts = rows.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val tri = edges.iterator.map { case (a, b) =>
      adj.getOrElse(b, Set.empty).count(c => edges.contains((a, c)))
    }.sum
    val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).map(_._2.size.toLong)
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_triangles") == tri.toLong)
    assert(row.getAs[Long]("n_nodes") == deg.size.toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    assert(math.abs(row.getAs[Double]("transitivity") - 3.0 * tri / wedges) < 1e-6)
  }

  test("a_entropy_by_user: 0 <= H <= ln(k), normalized form in [0,1]") {
    val rows = operators.EventOps.queries("a_entropy_by_user")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, h, hn) = (r.getAs[Long]("n_types"),
        r.getAs[Double]("entropy"), r.getAs[Double]("entropy_norm"))
      assert(h >= -1e-6 && h <= math.log(k.toDouble) + 1e-6, s"$r")
      assert(hn >= -1e-6 && hn <= 1.0 + 1e-6, s"$r")
      if (k == 1) assert(h == 0.0 && hn == 0.0)
    }
  }

  test("sample_weighted_reservoir: exactly k rows, deterministic across runs, ranks contiguous") {
    val q = operators.CurationOps.queries("sample_weighted_reservoir")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.length == 50 && a.toSeq == b.toSeq, "pure function of doc_id — no RNG drift")
    assert(a.map(_.getLong(0)).toSeq == (1L to 50L), "contiguous ranks")
    assert(a.forall(_.getLong(3) > 0))
    // weighting sanity: the sample's mean n_chars should exceed the
    // corpus mean (longer docs draw larger keys in expectation)
    val corpusMean = Tables.documents(spark, sf)
      .filter(col("n_chars") > 0).agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = a.map(_.getLong(3)).sum.toDouble / a.length
    assert(sampleMean > corpusMean, s"sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("retention_cohort_matrix: offset 0 is 100%, cells never exceed cohort size") {
    val rows = operators.EventOps.queries("retention_cohort_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, act, coh, ret) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Double]("retention"))
      assert(act <= coh, s"$r")
      if (off == 0) assert(ret == 1.0, s"$r")
      assert(off >= 0)
    }
  }

  test("a_assoc_rules: confidences bounded, pair support never exceeds item support") {
    val rows = operators.GraphOps.queries("a_assoc_rules")(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (p, na, nb) = (r.getAs[Long]("pair_n"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(p <= na && p <= nb, s"$r")
      assert(r.getAs[Long]("conf_ab_e6") <= 1000000L && r.getAs[Long]("conf_ba_e6") <= 1000000L)
      assert(r.getAs[Long]("lift_e6") > 0)
    }
    val lifts = rows.map(_.getAs[Long]("lift_e6"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b }, "sorted by lift")
  }

  test("privacy_l_diversity: flag is exactly l_distinct >= 3 and l <= n") {
    val rows = operators.LayoutOps.queries("privacy_l_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l, d) = (r.getAs[Long]("n"), r.getAs[Long]("l_distinct"), r.getAs[Int]("diverse"))
      assert(l <= n && l >= 1)
      assert(d == (if (l >= 3) 1 else 0), s"$r")
    }
  }

  test("v_label_centroids: full (label × dim) grid, counts conserved") {
    val rows = operators.RetrievalOps.queries("v_label_centroids")(spark, sf).collect()
    val nVecsByLabel = Tables.embeddings(spark, sf)
      .groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dims = rows.map(_.getInt(1)).distinct.sorted
    assert(dims.head == 1 && dims.length == dims.last, "contiguous 1..D dims")
    assert(rows.length == nVecsByLabel.size * dims.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == nVecsByLabel(r.getInt(0)), s"$r count")
    }
  }

  test("v_pca_power: unit vector, stable direction by round 3, beats axis variance") {
    def run(iters: Int): Array[Double] =
      api.Graft.pcaTopComponent(Tables.embeddings(spark, sf), "vec_id", "embedding", iters)
        .orderBy(col("dim")).collect()
        .map(_.getAs[Long]("pc1_e6").toDouble / 1e6)
    val v3 = run(3)
    assert(math.abs(v3.map(x => x * x).sum - 1.0) < 2e-3, "unit norm")
    val v4 = run(4)
    val cos = v3.zip(v4).map { case (a, b) => a * b }.sum /
      (math.sqrt(v3.map(x => x * x).sum) * math.sqrt(v4.map(x => x * x).sum))
    assert(cos > 0.98, s"direction not converged by round 3: cos(v3,v4)=$cos")
    // Rayleigh quotient along v3 must beat the best single axis (else
    // the iteration learned nothing): compare v3'Cv3 vs max_i C_ii over
    // a driver-side covariance replay on the small fixture.
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val d = vecs.head.length; val n = vecs.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    def cquad(v: Array[Double]): Double = {
      // E[(c·v)²] where c is the centered vector
      vecs.map { row =>
        val p = (0 until d).map(i => (row(i) - mean(i)) * v(i)).sum
        p * p
      }.sum / n
    }
    val axisBest = (0 until d).map { i =>
      val axis = Array.fill(d)(0.0); axis(i) = 1.0; cquad(axis)
    }.max
    assert(cquad(v3) >= axisBest * 0.999,
      s"top component variance ${cquad(v3)} below best axis $axisBest")
  }

  test("ml_logreg_gd3: three GD rounds reduce the training log-loss below ln(2)") {
    val w = operators.RetrievalOps.queries("ml_logreg_gd3")(spark, sf)
      .orderBy(col("dim")).collect()
      .map(_.getAs[Long]("w_e6").toDouble / 1e6)
    assert(w.exists(_ != 0.0), "training moved the weights")
    val rows = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>"), (col("label") >= 5).cast("int"))
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    def loss(wv: Array[Double]): Double = rows.map { case (v, y) =>
      val m = v.indices.map(i => wv(i) * v(i)).sum
      math.log1p(math.exp(-m * (2 * y - 1))) // -ln σ(m·±1), stable form
    }.sum / rows.length
    val l0 = loss(Array.fill(w.length)(0.0))
    val l3 = loss(w)
    assert(math.abs(l0 - math.log(2)) < 1e-12)
    assert(l3 < l0, s"log-loss did not improve: $l3 >= $l0")
  }

  test("ta_tfidf_topterms: contiguous ranks, non-increasing scores, every doc tagged") {
    val rows = operators.TextAnalysisOps.queries("ta_tfidf_topterms")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val nDocs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0).count()
    assert(byDoc.size == nDocs, "every non-empty doc gets keywords")
    byDoc.foreach { case (d, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"doc $d ranks")
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"doc $d order")
    }
  }
}
