package graft

/** TDigestAgg contract specs, mirroring KllAggSpec: the merge law
  * (centroid concat + re-compress ≡ one build, to within the rank
  * budget), rank error on adversarial insertion orders — with the
  * TAIL-tight budget that distinguishes the k1 scale from KLL's
  * uniform one — and exact weight preservation through compression. */
class TDigestAggSpec extends SparkSpec {

  private val midQs = Seq(100000L, 250000L, 500000L, 750000L, 900000L)
  private val tailQs = Seq(10000L, 990000L, 999000L)
  private def agg(qs: Seq[Long]) = new functions.TDigestAgg(200, qs)

  /** exact rank window [#(<v), #(≤v)] of v in data */
  private def rankWindow(data: Seq[Long], v: Long): (Long, Long) =
    (data.count(_ < v).toLong, data.count(_ <= v).toLong)

  private def assertRankErrors(data: Seq[Long], qs: Seq[Long],
      ests: Array[Long], epsE6: Long, tag: String): Unit = {
    val n = data.size.toLong
    qs.zip(ests).foreach { case (q, est) =>
      val (lt, le) = rankWindow(data, est)
      val target = q * n
      assert(target >= lt * 1000000L - n * epsE6 &&
             target <= le * 1000000L + n * epsE6,
        s"$tag q=$q est=$est rank window [$lt,$le] of n=$n misses target")
    }
  }

  private def build(a: functions.TDigestAgg,
      data: Seq[Long]): functions.TDigestBuf =
    data.foldLeft(a.zero)((b, v) => a.reduce(b, ("g", v)))

  test("mid-rank error within 1% on sorted, reversed, and interleaved orders") {
    val base = (1L to 50000L).map(i => (i * 2654435761L) % 1000000L)
    val orders = Map(
      "shuffled" -> base,
      "sorted" -> base.sorted,
      "reversed" -> base.sorted.reverse,
      "sawtooth" -> base.zipWithIndex.sortBy { case (_, i) => i % 7 }.map(_._1))
    orders.foreach { case (tag, data) =>
      val a = agg(midQs)
      val ests = a.finish(build(a, data))
      // δ=200 mid-rank error is well under 1% — the registered query's
      // ±2% contract keeps headroom over this spec
      assertRankErrors(data, midQs, ests, 10000L, tag)
    }
  }

  test("tail ranks resolve an order of magnitude tighter (<= 0.2%)") {
    // heavy-tailed values — the shape t-digest exists for: most mass
    // small, a long multiplicative tail
    val data = (1L to 50000L).map { i =>
      val u = (i * 2654435761L) % 1000000L
      (u * u) / 1000000L + u % 97L
    }
    Seq("raw" -> data, "sorted" -> data.sorted).foreach { case (tag, d) =>
      val a = agg(tailQs)
      val ests = a.finish(build(a, d))
      assertRankErrors(d, tailQs, ests, 2000L, s"tail-$tag")
    }
  }

  test("merge law: split builds merge to within the same rank budget") {
    val data = (1L to 60000L).map(i => (i * 1103515245L + 12345L) % 500000L)
    val a = agg(midQs)
    val chunks = data.grouped(7919).toSeq
    val merged = chunks.map(c => build(agg(midQs), c)).reduce(a.merge)
    assertRankErrors(data, midQs, a.finish(merged), 10000L, "merged")
    // weight preservation is EXACT: centroid weights are BIGINTs and
    // compression only ever sums them
    var total = 0L
    (0 until merged.meta(0)).foreach(i => total += merged.weights(i))
    total += merged.meta(1) // scratch singletons not yet compressed
    assert(total == data.size.toLong,
      "compression must preserve total represented weight")
  }

  test("distributed build equals the registered contract shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 20000
    val df = spark.range(n.toLong).select(
      lit("g").as("k"), ((col("id") * 48271L) % 99991L).as("v"))
      .as[(String, Long)]
    val ests = df.groupByKey(_._1).agg(agg(midQs).toColumn.name("ests"))
      .collect().head._2
    val data = (0 until n).map(i => (i.toLong * 48271L) % 99991L)
    assertRankErrors(data, midQs, ests, 10000L, "distributed")
  }
}
