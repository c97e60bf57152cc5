package graft

/** KllAgg contract specs: the merge law (levelwise concat + compact ≡
  * one build, to within the rank-error budget), rank error on
  * adversarial insertion orders, and exactness below the compaction
  * threshold — the Aggregator-family discipline (BloomAgg/CmsAgg/
  * TopKAgg each pin their own laws). */
class KllAggSpec extends SparkSpec {

  private val qs = Seq(100000L, 250000L, 500000L, 750000L, 900000L)
  private def agg = new functions.KllAgg(256, qs)

  /** exact rank window [#(<v), #(≤v)] of v in data */
  private def rankWindow(data: Seq[Long], v: Long): (Long, Long) =
    (data.count(_ < v).toLong, data.count(_ <= v).toLong)

  private def assertRankErrors(data: Seq[Long], ests: Array[Long],
                               epsE6: Long, tag: String): Unit = {
    val n = data.size.toLong
    qs.zip(ests).foreach { case (q, est) =>
      val (lt, le) = rankWindow(data, est)
      val target = q * n
      assert(target >= lt * 1000000L - n * epsE6 &&
             target <= le * 1000000L + n * epsE6,
        s"$tag q=$q est=$est rank window [$lt,$le] of n=$n misses target")
    }
  }

  private def build(a: functions.KllAgg, data: Seq[Long]): functions.KllBuf =
    data.foldLeft(a.zero)((b, v) => a.reduce(b, ("g", v)))

  test("exact below the compaction threshold") {
    val a = agg
    // 2k-1 items: level 0 never fills, finish walks the raw values
    val data = (1L to 511L).map(i => i * 37 % 1000)
    val ests = a.finish(build(a, data))
    val sorted = data.sorted
    qs.zip(ests).foreach { case (q, est) =>
      val target = math.max(1L, (q * data.size + 999999L) / 1000000L)
      assert(est == sorted((target - 1).toInt),
        s"below threshold the sketch must be exact: q=$q")
    }
  }

  test("rank error within budget on sorted, reversed, and interleaved orders") {
    val base = (1L to 50000L).map(i => (i * 2654435761L) % 1000000L)
    val orders = Map(
      "shuffled" -> base,
      "sorted" -> base.sorted,
      "reversed" -> base.sorted.reverse,
      "sawtooth" -> base.zipWithIndex.sortBy { case (_, i) => i % 7 }.map(_._1))
    orders.foreach { case (tag, data) =>
      val a = agg
      val ests = a.finish(build(a, data))
      // k=256 at n=50k: H ≈ log2(n/k) ≈ 7.6; budget 4% (< the 5%
      // registered contract, so the query has headroom over this spec)
      assertRankErrors(data, ests, 40000L, tag)
    }
  }

  test("merge law: split builds merge to within the same rank budget") {
    val data = (1L to 60000L).map(i => (i * 1103515245L + 12345L) % 500000L)
    val a = agg
    val chunks = data.grouped(7919).toSeq
    val merged = chunks.map(c => build(agg, c)).reduce(a.merge)
    assertRankErrors(data, a.finish(merged), 40000L, "merged")
    // and the merge is weight-preserving: total summary weight == n
    val total = merged.levels.indices.map(l =>
      merged.sizes(l).toLong * (1L << l)).sum
    assert(total == data.size.toLong,
      "compaction must preserve total represented weight")
  }

  test("distributed build equals the registered contract shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 20000
    val df = spark.range(n.toLong).select(
      lit("g").as("k"), ((col("id") * 48271L) % 99991L).as("v"))
      .as[(String, Long)]
    val ests = df.groupByKey(_._1).agg(agg.toColumn.name("ests"))
      .collect().head._2
    val data = (0 until n).map(i => (i.toLong * 48271L) % 99991L)
    assertRankErrors(data, ests, 40000L, "distributed")
  }
}
